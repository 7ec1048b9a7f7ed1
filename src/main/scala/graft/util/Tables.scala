package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic test tables
  * (`/root/repo/TESTDATA.md`). One parquet file per table under a
  * scale-factor directory. At 100 TB these would be partitioned
  * parquet/iceberg tables; the accessors below keep the call sites
  * agnostic to that.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** The driver has shipped `events.parquet` in two physical layouts:
    * TIMESTAMP(NANOS) (which Spark 4 rejects at read time unless the
    * legacy `nanosAsLong` conf maps it to INT64), and — since the
    * 2026-08-13 regeneration — plain `timestamp[us]` (read by Spark 4 as
    * TIMESTAMP_NTZ). Branch on the loaded schema so both work:
    *
    *  - INT64 nanos: derive the µs `ts` with integer `DIV` (`/1000`
    *    through DOUBLE would lose precision at 1.7e18 — 53-bit mantissa)
    *    and keep the raw nanos as `ts_ns`.
    *  - timestamp[us]: cast to session-TZ TimestampType (session TZ is
    *    UTC everywhere in this engine, so the NTZ wall clock IS the
    *    epoch instant) and derive `ts_ns = unix_micros(ts) * 1000` —
    *    µs-aligned nanos, which is lossless here because the source has
    *    no sub-µs precision.
    *
    * Downstream contract is identical in both branches: `ts` is a
    * TimestampType at µs granularity (what the DuckDB oracle sees via
    * `epoch_us(ts)`), `ts_ns` is a Spark-side-only BIGINT tie-breaker
    * that must never feed an oracle-visible ordering or value (in the
    * legacy layout the nanos are not µs-aligned, so oracle comparisons
    * are only valid at µs granularity). */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.TimestampType => // timestamp[us]
        raw
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other => // fail fast: a silent cast would null every ts
        throw new IllegalStateException(
          s"events.parquet ts column has unsupported type $other; " +
            "expected INT64 nanos (legacy) or timestamp[us]")
    }
  }
  /** Fan a narrow scan out to the session's parallelism when the file
    * layout gives it fewer partitions than cores. The sf test corpora
    * are single-row-group parquet files, so every `documents`/
    * `embeddings` scan otherwise runs as ONE task and the expensive
    * narrow phase that follows it (regex tokenization, gram hashing,
    * shingling — the dominant per-row cost of the text operators)
    * serializes on one core while the rest idle (measured: x66's
    * benchmark-store gram pass ran 2.2 s in a single task at sf0.1).
    * The guide-§2.5 "repartition immediately after the read" case,
    * gated exactly like [[graft.ext.Multimodal]]'s fanOut (the r21
    * x101 fix, driver-confirmed): at 100 TB the scan already has
    * ≥ cores partitions and this is a no-op — corpus bytes are never
    * shuffled where the input layout is healthy. HASH-keyed on the
    * table's unique id (not round-robin): a keyless repartition pays a
    * local binary full-row sort per execution (sortBeforeRepartition,
    * SPARK-23207) — measured as a net regression on queries that
    * re-execute the scan subtree many times — while a hash exchange on
    * a unique id is sort-free, deterministic under retries, and spreads
    * evenly (≫100× more distinct keys than partitions, guide §2.5). */
  private def fanOut(df: DataFrame, idCol: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(idCol)) else df
  }

  def documents(spark: SparkSession, d: String): DataFrame =
    fanOut(table(spark, d, "documents"), "doc_id")
  def embeddings(spark: SparkSession, d: String): DataFrame =
    fanOut(table(spark, d, "embeddings"), "vec_id")
}
