package graft

import graft.ext.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, batch shapes, determinism, and the
  * bridge into the similarity operators. The decode itself is the
  * documented FakeCodec stub; what is under test is everything a real
  * codec would plug into. */
class MultimodalSpec extends SparkSpec {
  private val docs = df(Seq(
    (1L, "a small payload"),
    (2L, "another, somewhat longer, binary payload body"),
    (3L, "x")))
    .toDF("id", "text")
    .withColumn("payload", col("text").cast("binary"))

  test("decodeMeta matches the expression path (mapPartitions ≡ codegen metadata)") {
    val exprPath = Multimodal.metaColumns(docs, "id", "payload")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val partPath = Multimodal.decodeMeta(spark, docs, "id", "payload").toDF()
      .select("id", "n_bytes", "sha256", "width", "height", "n_frames")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(exprPath == partPath)
  }

  test("resize emits w·h·3 bytes per row, deterministically") {
    val out = Multimodal.resize(spark, docs, "id", "payload", 8, 4)
    assert(out.columns.toSeq == Seq("id", "payload", "width", "height"))
    assert(out.count() == 3)
    val sizes = out.select(length(col("payload"))).collect().map(_.getInt(0)).toSet
    assert(sizes == Set(8 * 4 * 3))
    val a = out.orderBy("id").collect().map(r => r.getAs[Array[Byte]]("payload").toSeq)
    val b = Multimodal.resize(spark, docs, "id", "payload", 8, 4)
      .orderBy("id").collect().map(r => r.getAs[Array[Byte]]("payload").toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling explodes to at most maxFrames rows per doc, stride everyN") {
    val frames = Multimodal.sampleFrames(spark, docs, "id", "payload",
      everyN = 2, maxFrames = 4)
    assert(frames.columns.toSeq == Seq("id", "frame_idx", "frame"))
    val byDoc = frames.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc n_frames = len % 16 + 1 → stride-2 capped at 4
    val expect = docs.select(col("id"), length(col("payload"))).collect()
      .map(r => r.getLong(0) ->
        math.min((r.getInt(1) % 16 + 1 + 1) / 2, 4).toLong).toMap
    assert(byDoc == expect)
    assert(frames.select("frame_idx").collect().map(_.getInt(0)).forall(i => i % 2 == 0))
  }

  test("extracted features are unit-norm and feed the ANN operators end-to-end") {
    val emb = Multimodal.extractFeatures(spark, docs, "id", "payload", dim = 16)
    assert(emb.columns.toSeq == Seq("id", "embedding"))
    val norms = emb.select(Similarity.norm(col("embedding"))).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-6))
    // payload → features → brute-force knn: the multimodal-to-similarity bridge
    val knn = Similarity.bruteForceTopK(
      emb.withColumnRenamed("id", "vec_id"),
      emb.withColumnRenamed("id", "vec_id").filter(col("vec_id") === 1),
      "vec_id", "embedding", 2)
    assert(knn.count() == 2)
  }

  test("x14 bridge: twin payloads embed identically and LSH top-1 finds the twin") {
    // identical payloads MUST produce identical embeddings (pure function
    // of bytes), land in the same LSH buckets, and re-rank to sim ≈ 1
    val twins = df(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // byte-twin of 1
      (3L, "another, somewhat longer, binary payload body"),
      (4L, "completely different content about spark engines")))
      .toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val emb = Multimodal.extractFeatures(spark, twins, "id", "payload", dim = 16)
    val e = emb.orderBy("id").collect().map(_.getSeq[Double](1))
    assert(e(0) == e(1), "byte-identical payloads must embed identically")
    val top = Similarity.lshTopK(emb, emb.filter(col("id") === 1),
      "id", "embedding", k = 1, nBands = 4, bandBits = 4, dim = 16)
    val best = top.collect().head
    assert(best.getLong(2) == 2L, "top-1 neighbor of doc 1 must be its twin")
    assert(best.getDouble(3) > 0.999999)
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("MixedCodec near-dup: exact payload twins pair at cos 1, a one-byte perturbation does not") {
    val fixture = df(Seq(
      (1L, "frame-bytes-alpha"), (2L, "frame-bytes-alpha"), // exact twins
      (3L, "frame-bytes-alpha!"),                           // one byte appended
      (4L, "frame-bytes-beta"), (5L, "wholly different payload")))
      .toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val emb = Multimodal.extractFeatures(spark, fixture, "id", "payload",
      dim = 16, codec = Multimodal.MixedCodec)
    val pairs = Similarity.nearDupPairs(emb, "id", "embedding",
        minCosine = 0.95, nBands = 4, bandBits = 4, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)),
      "only the byte-identical twins may pair — the hash stub must NOT " +
        "treat the one-byte perturbation as near-identical")
    // the mixing property FakeCodec lacks: distinct payloads are
    // near-orthogonal, not near-collinear
    val e = emb.orderBy("id").collect().map(_.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(cos(e(0), e(3))) < 0.9, "distinct payloads must not be collinear")
    assert(math.abs(cos(e(0), e(2))) < 0.9)
  }
}
