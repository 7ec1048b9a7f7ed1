package graft

import graft.ext.{Chunking, Packing, PassageDedup, Repetition}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

// top-level: Spark codegen cannot instantiate case classes nested in the
// Properties object
final case class DocGen(doc_id: Long, text: String)

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
}
