package graft.core

import org.apache.spark.sql.DataFrame

/** Bucketed-table maintenance (SURVEY.md §4): the storage-side shuffle
  * eliminator for the engine's recurring join/dedup keys.
  *
  * Writing CORE bucketed by `symbol` (and the band/signature tables by
  * their band keys) means every downstream equi-join, latest-wins dedup
  * window, or groupBy on that key reads already-co-partitioned,
  * already-sorted buckets — Catalyst drops the `Exchange` entirely (the
  * narrow in-bucket `Sort` additionally disappears when each bucket is
  * one file, e.g. after a compaction pass). At 100 TB this converts the daily
  * CORE merge and the fact build from full-table shuffles into narrow
  * per-bucket work; BucketingSpec pins the no-Exchange plan.
  *
  * Bucketed writes go through the session catalog (`saveAsTable` —
  * bucket metadata lives in the catalog, not the parquet files), which
  * is how a warehouse deployment manages these tables anyway.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Append to an existing bucketed table with the SAME layout (Spark
    * rejects a mismatched spec): new rows land as additional
    * per-bucket files, so downstream joins stay Exchange-free — the
    * recurring-ingest write path (each shard appends, nothing
    * rewrites). Periodic compaction (re-running [[writeBucketed]] over
    * the accumulated table) restores one-file-per-bucket and with it
    * the sort-elision fast path. */
  def appendBucketed(df: DataFrame, table: String, keys: Seq[String],
                     buckets: Int): Unit = {
    // `mode("append").saveAsTable` on a NONEXISTENT table silently
    // creates it — a typo'd store name would fork a second empty store
    // instead of failing, and every later append/dedup would run against
    // the wrong one. Appends are store MAINTENANCE: the store must have
    // been created by [[writeBucketed]] first.
    if (!df.sparkSession.catalog.tableExists(table))
      throw new IllegalArgumentException(
        s"appendBucketed: table '$table' does not exist — create it with " +
          "writeBucketed first (refusing to silently fork a new store)")
    df.write.mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
