package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shapes
  * (schema, partition-friendly batch processing, deterministic metadata
  * extraction) are real; the actual media DECODE step is stubbed behind
  * [[FakeCodec]] because no image/audio libraries exist in this
  * environment — swap [[Codec.decode]] for a real implementation
  * (e.g. a JNI/FFI decoder invoked inside `mapPartitions`) in
  * production.
  *
  * Scale shape: decode is embarrassingly parallel (narrow,
  * per-partition); keep payloads in their own column so column pruning
  * drops the heavy bytes for metadata-only queries, and size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits
  * executor memory.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(id: Long, n_bytes: Long, sha256: String,
                             width: Int, height: Int, n_frames: Int)

  /** The decode contract a real codec implements. */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int) // (width, height, frames)
    /** Re-encode at target dimensions. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Extract one frame by index. */
    def frame(payload: Array[Byte], idx: Int): Array[Byte]
    /** Dense feature vector (the embedding a vision/audio model yields). */
    def features(payload: Array[Byte], dim: Int): Array[Double]
  }

  /** STUB: deterministic fakes derived from the byte content only — stand
    * in for a real image/audio decoder (none available here). Each output
    * has the SHAPE a real codec produces (sizes, frame counts, unit-norm
    * embeddings) and is a pure function of the payload, so tests can pin
    * behavior. */
  object FakeCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length.toLong
      (((n % 640) + 1).toInt, (((n * 7) % 480) + 1).toInt, ((n % 16) + 1).toInt)
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // deterministic w·h·3 "pixel" buffer seeded by content
      val out = new Array[Byte](w * h * 3)
      var seed = payload.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
      var i = 0
      while (i < out.length) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        out(i) = (seed >>> 56).toByte
        i += 1
      }
      out
    }
    def frame(payload: Array[Byte], idx: Int): Array[Byte] = {
      val (w, h, _) = decode(payload)
      resize(payload :+ idx.toByte, math.min(w, 16), math.min(h, 16))
    }
    /** Double-precision unit-norm embedding, every step exact/portable
      * integer or IEEE-double arithmetic so an external engine (the
      * DuckDB oracle for x14) reproduces it bit-for-bit:
      *   seed = (integer value of the first 15 hex chars of
      *           md5(payload)) mod 2³¹          — the shared cross-engine
      *                                            hash primitive;
      *   raw_j = lcgUnit(seed + j)              — the same 31-bit LCG the
      *                                            LSH hyperplanes use
      *                                            ([[Similarity]]); exact
      *                                            in int64 (seed+j < 2³¹,
      *                                            product < 2⁶¹);
      *   out_j = raw_j / ‖raw‖                  — norm is a sequential
      *                                            left-to-right fold of
      *                                            squares (`list_sum`
      *                                            order in DuckDB).
      */
    def features(payload: Array[Byte], dim: Int): Array[Double] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      val seed = ((h << 4) | ((d(7) >> 4) & 0xFL)) % 2147483648L
      val v = Array.tabulate(dim) { j =>
        ((1103515245L * (seed + j) + 12345L) % 2147483648L).toDouble /
          2147483648.0 * 2.0 - 1.0
      }
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      if (n == 0) v else v.map(_ / n)
    }
  }

  /** STUB variant with per-coordinate md5 MIXING — measured reason to
    * exist: [[FakeCodec.features]] is an affine LCG ramp
    * (`v_j = (a·(seed+j)+b) mod 2³¹` — the same common difference `a`
    * for every payload, only the offset varies), so ALL its embeddings
    * are near-collinear: at sf0.01, 12,186 of 124,750 doc pairs score
    * cosine ≥ 0.95 (measured building x101). That is fine for x14's
    * top-k PLUMBING pin (rank order is still deterministic) but
    * degenerate for near-dup semantics — the dup verdict must mean
    * "same content", not "every pair" — and a hot-bucket hazard: near-
    * collinear vectors share hyperplane-band keys, so the banded
    * self-join degenerates toward all-pairs at scale. Here every
    * coordinate is an INDEPENDENT md5 draw (`md5(payload ‖ ':' ‖ j)`,
    * the engine's 15-hex-char prefix primitive), giving
    * near-orthogonal vectors for distinct payloads — the distribution
    * a real vision/audio embedding has for unrelated inputs. Decode /
    * resize / frame delegate to [[FakeCodec]] (one source of truth for
    * the shape fakes). */
  object MixedCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = FakeCodec.decode(payload)
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      FakeCodec.resize(payload, w, h)
    def frame(payload: Array[Byte], idx: Int): Array[Byte] =
      FakeCodec.frame(payload, idx)
    def features(payload: Array[Byte], dim: Int): Array[Double] = {
      // hash the payload ONCE and clone the digest state per
      // coordinate (JDK MD5 is cloneable): O(bytes + dim) instead of
      // re-hashing the full blob dim times — same md5(payload ‖ ':j')
      // digests bit-for-bit. Cloning is OPTIONAL in the MessageDigest
      // contract, so a non-cloneable provider falls back to the
      // re-hash path rather than crashing the task (review finding,
      // round 19 second pass).
      val base = java.security.MessageDigest.getInstance("MD5")
      base.update(payload)
      val v = Array.tabulate(dim) { j =>
        val md = try base.clone().asInstanceOf[java.security.MessageDigest]
        catch {
          case _: CloneNotSupportedException =>
            val m = java.security.MessageDigest.getInstance("MD5")
            m.update(payload)
            m
        }
        val d = md.digest(s":$j".getBytes("UTF-8"))
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
        val x = ((h << 4) | ((d(7) >> 4) & 0xFL)) % 2147483648L
        x.toDouble / 2147483648.0 * 2.0 - 1.0
      }
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      if (n == 0) v else v.map(_ / n)
    }
  }

  /** Pure-expression metadata over a binary column (codegen'd path — no
    * closure): byte length, content hash, and the FakeCodec dimensions
    * expressed as arithmetic so the whole thing stays in whole-stage
    * codegen and is oracle-checkable. */
  def metaColumns(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha256"),
      ((length(col(binCol)) % 640) + 1).cast("int").as("width"),
      (((length(col(binCol)).cast("long") * 7) % 480) + 1).cast("int").as("height"),
      ((length(col(binCol)) % 16) + 1).cast("int").as("n_frames"))

  /** The imperative per-partition decode path (the shape a real codec
    * runs in): typed `mapPartitions` over (id, payload) batches. Kept for
    * codecs that genuinely cannot be expressions. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String, codec: Codec = FakeCodec): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, payload) =>
          val (w, h, f) = codec.decode(payload)
          val sha = digest.digest(payload).map("%02x".format(_)).mkString
          digest.reset()
          MediaMeta(id, payload.length.toLong, sha, w, h, f)
        }
      }
  }

  /** Resize: (id, payload) → (id, resized payload, width, height). Narrow
    * per-partition transform, 1 row in → 1 row out; the codec is
    * instantiated once per partition, not per row. */
  def resize(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
             w: Int, h: Int, codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, codec.resize(p, w, h), w, h) })
      .toDF(idCol, "payload", "width", "height")
  }

  /** Frame sampling: (id, payload) → one row per sampled frame
    * (id, frame_idx, frame). 1 row in → ≤ maxFrames rows out via
    * `flatMap` inside the partition iterator — the batch shape video
    * pipelines need (no driver involvement, no shuffle). */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   binCol: String, everyN: Int, maxFrames: Int,
                   codec: Codec = FakeCodec): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    require(maxFrames >= 0, s"maxFrames must be non-negative, got $maxFrames")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        val (_, _, nFrames) = codec.decode(p)
        (0 until nFrames by everyN).take(maxFrames)
          .map(i => (id, i, codec.frame(p, i)))
      })
      .toDF(idCol, "frame_idx", "frame")
  }

  /** Fan the codec input out to the session's parallelism when the
    * upstream plan has FEWER partitions than cores — codec work (hash/
    * decode/embed) is the expensive narrow phase, and a small
    * single-row-group parquet file scans as ONE task, serializing it on
    * one core (measured on x101 at sf0.1: the embed+signature stage ran
    * 2.5 s in a single task while 31 cores idled). At scale the scan
    * already has ≥ cores partitions and this is a no-op — the payload
    * bytes are never shuffled where the input layout is healthy (the
    * guide §2.5 "repartition immediately after the read" case, gated so
    * it cannot fire as an accidental full-corpus shuffle). */
  private def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Feature extraction: (id, payload) → (id, embedding array<double>,
    * per [[FakeCodec.features]]) — the bridge from multimodal payloads
    * into the [[Similarity]] ANN operators, all of which dispatch on the
    * element type (float or double) via [[graft.functions.CosineSimilarity]]
    * / [[graft.functions.NearestCentroid]]. Output embeddings are
    * unit-norm, ready for cosine. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String, dim: Int,
                      codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    fanOut(df.select(col(idCol).cast("long"), col(binCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, codec.features(p, dim)) })
      .toDF(idCol, "embedding")
  }
}
