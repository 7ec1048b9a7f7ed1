package graft

import graft.core.{Dedup, Upsert}
import graft.dim.DimSecurity
import graft.metrics.Audit
import graft.quality.Gates
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import java.sql.Date

// top-level: Spark codegen cannot instantiate case classes nested in the
// Properties object
final case class RawGen(symbol: String, trade_date: Date,
                        volume: Option[Long], _ingest_ts: Long, _src_file: String)

/** SURVEY.md §5.2 property-based invariants, on generated micro-batches.
  * Test counts are tuned down (Spark jobs per case) — the value is in the
  * generated shapes (dup keys, ties, nulls, case noise), not case count. */
object PipelineProps extends Properties("pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private val symGen = Gen.oneOf("AAPL", "aapl ", " MSFT", "GOOG", "nvda", "IBM")
  private val dateGen = Gen.choose(1, 3).map(i => Date.valueOf(s"2024-01-0$i"))
  private val volGen = Gen.oneOf[Option[Long]](
    Some(100L), Some(-5L), Some(0L), None, Some(42L))

  private val rowGen = for {
    s <- symGen; d <- dateGen; v <- volGen
    ts <- Gen.choose(1L, 3L); f <- Gen.oneOf("a", "b", "c")
  } yield RawGen(s, d, v, ts, f)
  private val batchGen = Gen.nonEmptyListOf(rowGen).map(_.take(12))

  private def toDf(rows: List[RawGen]) = {
    val s = spark
    import s.implicits._
    spark.createDataset(rows).toDF()
  }

  property("referenceSplit partitions non-null-volume rows exactly") =
    Prop.forAll(batchGen) { rows =>
      val df = toDf(rows)
      val (valid, reject) = Gates.referenceSplit(df)
      val nulls = df.filter(col("volume").isNull)
      valid.count() + reject.count() + nulls.count() == df.count() &&
        valid.filter(col("volume") < 0).isEmpty &&
        reject.filter(col("volume") >= 0).isEmpty
    }

  property("latest-wins dedup is deterministic under row permutation") =
    Prop.forAll(batchGen) { rows =>
      def run(rs: List[RawGen]) =
        Dedup.latestIngestWins(toDf(rs))
          .orderBy("symbol", "trade_date")
          .collect().map(_.toSeq).toSeq
      run(rows) == run(rows.reverse)
    }

  property("dedup keeps exactly one row per key, and it is a maximal row") =
    Prop.forAll(batchGen) { rows =>
      val out = Dedup.latestIngestWins(toDf(rows)).collect()
      val keys = out.map(r => (r.getString(0), r.getDate(1)))
      keys.distinct.length == keys.length &&
        out.forall { r =>
          val group = rows.filter(x => x.symbol == r.getString(0) && x.trade_date == r.getDate(1))
          // mirror the total ordering: ts desc, file desc, then remaining
          // columns desc (here: volume, desc = NULLS LAST → None smallest)
          val best = group.maxBy(x =>
            (x._ingest_ts, x._src_file, x.volume.getOrElse(Long.MinValue)))
          r.getLong(3) == best._ingest_ts && r.getString(4) == best._src_file &&
            Option(r.get(2)).map(_.asInstanceOf[Long]) == best.volume
        }
    }

  property("premerge invariant: est_inserts + est_updates = |distinct valid keys|") =
    Prop.forAll(batchGen, Gen.listOf(Gen.zip(symGen, dateGen)).map(_.take(6))) {
      (rows, coreKeys) =>
        val raw = toDf(rows)
        val s = spark
        import s.implicits._
        val core = coreKeys.map { case (sym, d) => (sym.trim.toUpperCase, d) }
          .toDF("symbol", "trade_date")
        val m = Audit.preMerge(raw, core)
        val expectValid = rows.filter(_.volume.exists(_ >= 0))
          .map(r => (r.symbol.trim.toUpperCase, r.trade_date)).distinct.size
        m.estInserts + m.estUpdates == expectValid &&
          m.rejectCnt == rows.count(_.volume.exists(_ < 0)) &&
          m.rawCnt == rows.size
    }

  property("merge is idempotent and union-complete on keys") =
    Prop.forAll(batchGen) { rows =>
      val s = spark
      import s.implicits._
      val src = rows.map(r => (r.symbol, r.trade_date, r._ingest_ts))
        .distinctBy(x => (x._1, x._2)).toDF("k1", "k2", "v")
      val tgt = List(("AAPL", Date.valueOf("2024-01-01"), 99L),
        ("ZZZ", Date.valueOf("2024-01-02"), 98L)).toDF("k1", "k2", "v")
      val once = Upsert.merge(tgt, src, Seq("k1", "k2"))
      val twice = Upsert.merge(once, src, Seq("k1", "k2"))
      once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty &&
        once.count() == once.select("k1", "k2").distinct().count()
    }

  property("assignDenseIds equals the window formulation on arbitrary key sets") =
    Prop.forAll(Gen.listOf(Gen.resize(8, Gen.alphaNumStr).suchThat(_.nonEmpty)),
                Gen.chooseNum(1L, 1000L)) { (keys, base) =>
      val s = spark
      import s.implicits._
      val df = keys.distinct.toDF("symbol")
      val a = DimSecurity.assignDenseIds(df, base)
      val w = df.select(
        (org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("symbol")) + base - 1)
          .cast("long").as("security_id"),
        org.apache.spark.sql.functions.col("symbol"))
      a.exceptAll(w).isEmpty && w.exceptAll(a).isEmpty
    }

  property("surrogate ids stay dense and unique across incremental merges") =
    Prop.forAll(Gen.listOfN(3, Gen.someOf(
      List("AAPL", "MSFT", "GOOG", "NVDA", "IBM", "TSLA")))) { waves =>
      val s = spark
      import s.implicits._
      var dim = DimSecurity.empty(spark)
      waves.foreach { wave =>
        if (wave.nonEmpty)
          dim = DimSecurity.merge(dim, wave.toList.toDF("symbol"))
      }
      val ids = dim.orderBy("security_id").collect().map(_.getLong(0)).toSeq
      ids == (1L to ids.length) &&
        dim.select("symbol").distinct().count() == ids.length
    }
}
