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
  }

  /** STUB: deterministic fake decode derived from the byte content only —
    * stands in for a real image/audio decoder (none available here). */
  object FakeCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length.toLong
      (((n % 640) + 1).toInt, (((n * 7) % 480) + 1).toInt, ((n % 16) + 1).toInt)
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
}
