package graft

import graft.ext.{Chunking, ExactDedup, LmScore, Mixing, Packing, PassageDedup, Repetition}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

// top-level: Spark codegen cannot instantiate case classes nested in the
// Properties object
final case class DocGen(doc_id: Long, text: String)
final case class VecRow(vec_id: Long, embedding: Seq[Float])

/** Property-based invariants for the round-6 training-data operators,
  * each checked against a plain-Scala reference computation on randomly
  * generated micro-corpora (dup passages, short docs, empty docs). Test
  * counts are tuned down (Spark jobs per case). */
object ExtProps extends Properties("ext") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // tiny vocabulary maximizes dup-passage / repeated-gram collisions
  private val wordGen = Gen.oneOf("a", "bb", "ccc", "dd", "e")
  private val textGen = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, textGen)).map(_.zipWithIndex.map {
      case (t, i) => DocGen(i.toLong, t) })

  private def toDf(rows: List[DocGen]) = {
    val s = spark
    import s.implicits._
    spark.createDataset(rows).toDF()
  }

  private def toks(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  property("packing offsets are the exclusive prefix sum; totals close") =
    Prop.forAll(corpusGen) { rows =>
      val out = Packing.packSequences(toDf(rows), "doc_id", "text", 4)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
      val counts = rows.sortBy(_.doc_id).map(d => toks(d.text).length.toLong)
      val expected = counts.scanLeft(0L)(_ + _).init
      out.map(_._2) == expected && out.map(_._1) == counts
    }

  property("passage dedup conserves passages and keeps exactly one copy per fingerprint") =
    Prop.forAll(corpusGen) { rows =>
      val out = PassageDedup.dedup(toDf(rows), "doc_id", "text", 3)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      val passages = rows.flatMap { d =>
        val w = toks(d.text)
        if (w.isEmpty) Seq("") else w.grouped(3).map(_.mkString(" ")).toSeq
      }
      val total = out.map(_._1).sum
      val dropped = out.map(_._2).sum
      total == passages.length &&
        (total - dropped) == passages.distinct.length
    }

  property("repetition fractions match a brute-force gram count") =
    Prop.forAll(corpusGen) { rows =>
      val out = Repetition.ngramStats(toDf(rows), "doc_id", "text", 2)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      val expected = rows.sortBy(_.doc_id).map { d =>
        val grams = toks(d.text).sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq
        if (grams.isEmpty) (0L, 0.0, 0.0)
        else {
          val byGram = grams.groupBy(identity).view.mapValues(_.size)
          val dup = byGram.values.filter(_ > 1).sum
          (grams.length.toLong,
            dup.toDouble / grams.length,
            byGram.values.max.toDouble / grams.length)
        }
      }
      out == expected
    }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  property("chunk windows match a brute-force slide (offsets, lengths, fingerprints)") =
    Prop.forAll(corpusGen, Gen.choose(1, 4), Gen.choose(0, 3)) {
      (rows, stride, extra) =>
        val win = stride + extra
        val out = Chunking.chunks(toDf(rows), "doc_id", "text", win, stride)
          .orderBy("doc_id", "chunk_idx").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getString(4))).toSeq
        val expected = rows.sortBy(_.doc_id).flatMap { d =>
          val w = toks(d.text)
          // 1 + ceil(max(0, n-win)/stride) starts: stop at the first
          // window reaching the end — no fully-contained tail chunks
          val nChunks =
            if (w.isEmpty) 0L
            else 1L + (math.max(0, w.length - win).toLong + stride - 1) / stride
          (0L until nChunks).map { idx =>
            val start = idx * stride
            val slice = w.slice(start.toInt, start.toInt + win)
            (d.doc_id, idx, start, slice.length.toLong,
              md5hex(slice.mkString(" ")))
          }
        }
        out == expected
    }

  // --- probe-cell selection (functions/TopCells) -----------------------
  // values from a tiny finite set so exact score TIES occur routinely —
  // the tie-break (lowest cell id) is the oracle-parity hazard
  private val embValGen = Gen.oneOf(-1.0f, 0.0f, 0.5f, 1.0f)

  private def topByScore[A](scores: IndexedSeq[A], nProbe: Int)
                           (better: (A, A) => Boolean): Seq[Int] =
    scores.zipWithIndex.sortWith { case ((sa, ca), (sb, cb)) =>
      if (better(sa, sb)) true
      else if (better(sb, sa)) false
      else ca < cb
    }.take(nProbe).map(_._2)

  property("in-doc repetition removal equals first-occurrence filtering of the passage list") =
    Prop.forAll(corpusGen) { rows =>
      val got = PassageDedup.dedupWithinDoc(toDf(rows), "doc_id", "text", 3)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      val expect = rows.sortBy(_.doc_id).map { d =>
        val w = toks(d.text)
        val ps = if (w.isEmpty) Seq("") else w.grouped(3).map(_.mkString(" ")).toSeq
        val kept = ps.zipWithIndex
          .filter { case (p, i) => !ps.take(i).contains(p) }.map(_._1)
        (d.doc_id, ps.length.toLong, (ps.length - kept.length).toLong,
          kept.mkString(" "))
      }
      got == expect
    }

  property("cross-doc span removal equals a global first-occurrence window walk") =
    Prop.forAll(corpusGen) { rows =>
      val got = PassageDedup.removeDuplicateSpans(toDf(rows), "doc_id",
          "text", 3)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = rows.sortBy(_.doc_id).map { d =>
        val w = toks(d.text)
        val wins =
          if (w.length < 3) Seq.empty[String]
          else w.sliding(3).map(_.mkString(" ")).toSeq
        val dupStarts = wins.zipWithIndex.flatMap { case (win, i) =>
          if (seen.contains(win)) Some(i) else { seen += win; None }
        }
        val kept = w.zipWithIndex.collect {
          case (t, j) if !dupStarts.exists(s => s <= j && j < s + 3) => t
        }
        (d.doc_id, w.length.toLong, (w.length - kept.length).toLong,
          kept.mkString(" "))
      }
      got == expect
    }

  property("priority dedup keeps the min-(priority,id) copy per normalized content") =
    Prop.forAll(corpusGen) { rows =>
      val s = spark
      import s.implicits._
      val docs = spark.createDataset(rows).toDF()
        .withColumn("prio", pmod(col("doc_id"), lit(2L)))
      val got = ExactDedup.dedupWithPriority(docs, "doc_id", "text", "prio")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
      val win = rows.groupBy(d => toks(d.text).mkString(" "))
        .map { case (k, g) =>
          k -> g.map(d => (d.doc_id % 2, d.doc_id)).min._2 }
      val expect = rows.sortBy(_.doc_id).map { d =>
        val w = win(toks(d.text).mkString(" "))
        (d.doc_id, d.doc_id == w, w)
      }
      got == expect
    }

  property("temperature factors replay the sqrt/quantize/divide reference bit-exactly for every alpha") =
    Prop.forAll(corpusGen, Gen.choose(1, 4)) { (rows, q) =>
      val s = spark
      import s.implicits._
      val docs = spark.createDataset(rows).toDF()
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(3L))))
      val got = Mixing.temperatureFactors(docs, "lang", "text", q, 100L)
        .orderBy("lang").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      val stats = rows.groupBy(d => s"l${d.doc_id % 3}")
        .map { case (l, g) =>
          (l, g.size.toLong, g.map(d => toks(d.text).length.toLong).sum) }
        .toSeq.sortBy(_._1)
      val qfs = stats.map { case (_, _, t) =>
        val f = q match {
          case 1 => math.sqrt(math.sqrt(t.toDouble))
          case 2 => math.sqrt(t.toDouble)
          case 3 => math.sqrt(t.toDouble) * math.sqrt(math.sqrt(t.toDouble))
          case 4 => t.toDouble
        }
        if (q == 4) t else math.floor(f * 16.0).toLong
      }
      val total = qfs.sum
      val expect = stats.zip(qfs).map { case ((l, nd, nt), qf) =>
        val w = if (total == 0) 0.0 else qf.toDouble / total.toDouble
        val f = if (nt == 0) 0.0 else 100L.toDouble * w / nt
        (l, nd, nt, w, f)
      }
      got == expect
    }

  property("trigram backoff scoring equals a plain-Scala reference on any corpus split") =
    Prop.forAll(corpusGen, Gen.choose(2, 4)) { (rows, mod) =>
      val ref = rows.filter(_.doc_id % mod == 0)
      def grams(ws: Seq[String], n: Int): Seq[String] =
        if (ws.length < n) Seq.empty
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      def countMap(n: Int): Map[String, Long] =
        ref.flatMap(d => grams(toks(d.text), n))
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (c1, c2, c3) = (countMap(1), countMap(2), countMap(3))
      val S = 1073741824.0
      val expect = rows.sortBy(_.doc_id).map { d =>
        val w = toks(d.text)
        val tris = if (w.length < 3) Seq.empty else w.sliding(3).toSeq
        if (tris.isEmpty) (d.doc_id, 0L, None, None)
        else {
          val qs = tris.map { t3 =>
            val tri = t3.mkString(" ")
            if (c3.contains(tri))
              math.floor(c3(tri).toDouble / c2(t3.take(2).mkString(" "))
                * S).toLong
            else {
              val bo = t3.drop(1).mkString(" ")
              val p = if (c2.contains(bo)) c2(bo).toDouble / c1(t3(1)) else 0.0
              math.floor(p * S).toLong >> 1
            }
          }
          val sum = qs.sum
          (d.doc_id, tris.length.toLong, Some(sum),
            Some(sum / S / tris.length))
        }
      }
      val got = LmScore.score3(toDf(rows), "doc_id", "text",
          LmScore.fit3(toDf(ref), "text").localCheckpoint(true))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSeq
      got == expect
    }

  property("LM model append == refit on the union, for any split of any corpus") =
    Prop.forAll(corpusGen, Gen.choose(1, 4)) { (rows, mod) =>
      // split the corpus arbitrarily; fit-on-union must equal
      // write(base-slice) + append(rest) served from the store
      val base = rows.filter(_.doc_id % mod == 0)
      val rest = rows.filter(_.doc_id % mod != 0)
      val cand = toDf(rows)
      val expect = graft.ext.LmScore.score(cand, "doc_id", "text",
          graft.ext.LmScore.fit(toDf(rows), "text").localCheckpoint(true))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      graft.ext.LmScore.writeModelStore(toDf(base), "text",
        "lm_prop_store", buckets = 2)
      try {
        if (rest.nonEmpty)
          graft.ext.LmScore.appendToModel(toDf(rest), "text",
            "lm_prop_store", buckets = 2)
        val got = graft.ext.LmScore.scoreAgainstStore(cand, "doc_id",
            "text", "lm_prop_store")
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        got == expect
      } finally {
        spark.sql("DROP TABLE IF EXISTS lm_prop_store")
        spark.sql(s"DROP TABLE IF EXISTS ${graft.ext.LmScore.modelMeta("lm_prop_store")}")
        graft.core.IngestLedger.reset(spark, "lm_prop_store")
      }
    }

  property("topFractionPerGroup: kept scores dominate dropped, whole tie groups, nulls abstain") =
    Prop.forAll(corpusGen, Gen.choose(1, 3)) { (rows, groups) =>
      val s = spark
      import s.implicits._
      // score by token count (ties common on the tiny vocab); empty
      // docs get a NULL score to exercise the abstain path
      val scored = rows.map { d =>
        val n = toks(d.text).length
        (d.doc_id, s"g${d.doc_id % groups}",
          if (n == 0) None else Some(n.toDouble))
      }
      val out = graft.ext.Curation.topFractionPerGroup(
          spark.createDataset(scored).toDF("doc_id", "source", "lm_score"),
          "source", "lm_score", fraction = 0.5)
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toSeq
      out.groupBy(_._2).forall { case (_, g) =>
        val kept = g.filter(_._4.contains(true)).flatMap(_._3)
        val dropped = g.filter(_._4.contains(false)).flatMap(_._3)
        val nulls = g.filter(_._3.isEmpty)
        // every kept score strictly above every dropped score (a tie
        // group is never split), nulls always abstain, and the kept
        // fraction is at least half of the scored rows (cume_dist
        // keeps whole tie groups, so >= not ==)
        kept.forall(k => dropped.forall(k > _)) &&
          nulls.forall(_._4.isEmpty) &&
          (kept.size + dropped.size == 0 ||
            kept.size * 2 >= kept.size + dropped.size)
      }
    }

  property("LcgTopCells equals a plain-Scala selection over the exact codebook arithmetic") =
    Prop.forAll(Gen.choose(2, 4), Gen.choose(2, 6), Gen.choose(1, 7),
      Gen.choose(1, 5)) { (dim, nCells, nProbe, nVecs) =>
      Prop.forAll(Gen.listOfN(nVecs,
        Gen.listOfN(dim, embValGen))) { embs =>
        val s = spark
        import s.implicits._
        val rows = embs.zipWithIndex.map { case (e, i) =>
          VecRow(i.toLong, e) }
        val out = spark.createDataset(rows).toDF()
          .select(col("vec_id"),
            graft.ext.LcgCellScorer(nCells, dim, 100000L)
              .topCells(col("embedding"), nProbe).as("cells"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
        val (w, norms) =
          graft.functions.NearestCentroid.codebook(nCells, dim, 100000L)
        val expected = rows.map { r =>
          val scores = (0 until nCells).map { k =>
            var dot = 0.0; var j = 0
            while (j < dim) { dot += r.embedding(j).toDouble * w(k * dim + j); j += 1 }
            dot / norms(k)
          }
          r.vec_id -> topByScore(scores, nProbe)(_ > _)
        }.toMap
        out == expected
      }
    }

  property("TrainedTopCells equals a plain-Scala selection in the quantized-L2 domain") =
    Prop.forAll(Gen.choose(2, 4), Gen.choose(2, 6), Gen.choose(1, 7),
      Gen.choose(1, 5)) { (dim, nCells, nProbe, nVecs) =>
      val centGen = Gen.listOfN(nCells * dim, embValGen)
      Prop.forAll(centGen, Gen.listOfN(nVecs,
        Gen.listOfN(dim, embValGen))) { (centVals, embs) =>
        val cents = centVals.map(v =>
          graft.functions.TrainedCells.quantize(v.toDouble)).toArray
        val scorer = graft.ext.TrainedCellScorer(cents, dim)
        val s = spark
        import s.implicits._
        val rows = embs.zipWithIndex.map { case (e, i) =>
          VecRow(i.toLong, e) }
        val out = spark.createDataset(rows).toDF()
          .select(col("vec_id"),
            scorer.topCells(col("embedding"), nProbe).as("cells"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
        val expected = rows.map { r =>
          val u = r.embedding.map(x =>
            graft.functions.TrainedCells.quantize(x.toDouble))
          val dists = (0 until nCells).map { c =>
            var acc = 0L; var j = 0
            while (j < dim) {
              val d = u(j) - cents(c * dim + j); acc += d * d; j += 1 }
            acc
          }
          r.vec_id -> topByScore(dists, nProbe)(_ < _)
        }.toMap
        out == expected
      }
    }
}
