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
    * available as `ts_ns` for total orderings. DuckDB reads the same file
    * natively as TIMESTAMP_NS; every nano value in the testdata is
    * µs-aligned (verified: ns % 1000 == 0 for all rows), so the two
    * engines see identical instants. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
