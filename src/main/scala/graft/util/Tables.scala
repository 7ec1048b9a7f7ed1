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
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark 4 rejects at
    * read time (`PARQUET_TYPE_ILLEGAL`). Read the raw INT64 nanos via the
    * legacy conf (runtime-settable) and derive a microsecond `ts` with
    * integer division — `ts/1000` through DOUBLE would lose precision at
    * 1.7e18 (53-bit mantissa), so it must be `DIV`. The raw nanos stay
    * available as `ts_ns` for total orderings. DuckDB truncates the same
    * file to microsecond TIMESTAMPs at read time, and the raw nanos are
    * NOT µs-aligned (only ~0.1% of rows have ns % 1000 == 0) — so a
    * checked query may compare instants across engines ONLY at µs
    * granularity (`ts` here, `ts DIV 1000` arithmetic); `ts_ns` is a
    * Spark-side-only tie-breaker and must never feed an oracle-visible
    * ordering or value. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
