package graft.util

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession configuration for this engine — the one place
  * the scale-relevant settings live (SURVEY.md §4). Used by the Verify
  * and Bench harnesses; a cluster deployment uses the same builder with
  * its own master/partition settings.
  */
object Sessions {

  /** @param shufflePartitions match the cluster's total cores locally;
    *        on a real cluster size so a shuffle partition stays in the
    *        low hundreds of MB (or rely on AQE coalescing from a high
    *        initial number). */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // deterministic wall-clock-independent semantics
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); Spark 4 rejects it without this
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // MERGE-as-partition-overwrite must only rewrite touched partitions
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // AQE (default-on in Spark 4, pinned here): runtime coalescing,
      // skew-join splitting, and join-strategy re-planning
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
