package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins dedup (SURVEY.md §2.6 W1).
  *
  * Reproduces the reference's merge-source dedup
  * (reference `dags/sql/4. merge_core.sql:72-81`):
  * `ROW_NUMBER() OVER (PARTITION BY key ORDER BY _ingest_ts DESC,
  * _src_file DESC)` then keep rn=1 — the newest ingest wins, with the file
  * name as a deterministic tie-break.
  *
  * Physical shape: ONE hash-partition shuffle on the key + in-partition
  * sort. At 100 TB, keys include the partition date, so per-date runs
  * shuffle only the run's slice; bucketing CORE by symbol removes even
  * that shuffle for repeated runs.
  */
object Dedup {

  /** Keep the first row per key under `ordering` (given descending =
    * latest-wins). `ordering` must be a total order for determinism —
    * callers append a unique tie-break column. */
  def latestWins(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The reference's exact instance: key (symbol, trade_date), newest
    * `_ingest_ts` wins, `_src_file` descending as tie-break — PLUS every
    * remaining column (descending, name order) so the ordering is total
    * up to fully-identical rows. The reference stops at `_src_file`
    * (`4. merge_core.sql:74-76`), which silently picks an arbitrary
    * winner when one file carries the same key twice with different
    * values; found by the permutation-determinism property test. */
  def latestIngestWins(raw: DataFrame): DataFrame = {
    val explicit = Seq("symbol", "trade_date", "_ingest_ts", "_src_file")
    val rest = raw.columns.filterNot(explicit.contains).sorted
      .map(c => col(c).desc).toSeq
    latestWins(raw, Seq("symbol", "trade_date"),
      Seq(col("_ingest_ts").desc, col("_src_file").desc) ++ rest)
  }
}
