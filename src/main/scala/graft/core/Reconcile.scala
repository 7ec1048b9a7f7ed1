package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-recovery append for the incremental-store ingest loops — the
  * RECONCILE half of [[IngestLedger]]'s two-phase protocol.
  *
  * When a batch's intent marker exists but its commit marker does not,
  * a prior attempt crashed somewhere inside its append: before it,
  * between the store append and the count-delta append, or after both.
  * [[appendExact]] converges the store AND its count side table to the
  * exact post-append state from any of those points, using only work
  * proportional to the shard:
  *
  *  1. Store: anti-join the shard's rows against the store on
  *     `keys :+ idCol` — the store side first semi-filtered to the
  *     shard's touched keys — and append only what is missing (a
  *     completed prior append makes this a zero-row append).
  *  2. Counts: for just the shard's TOUCHED keys, recount the
  *     post-append store in-bucket and compare against the summed
  *     existing deltas; append the per-key DIFFERENCE as a corrective
  *     delta row (zero rows when the prior attempt landed its deltas,
  *     the full shard counts when it landed none, and a negative
  *     correction if any earlier drift over-counted a touched key —
  *     [[graft.ext.IncrementalDedup.keyCountTotals]] sums deltas, so
  *     negative rows compose).
  *
  * Both steps are idempotent, so a crash DURING recovery just runs the
  * reconcile again. This path never recomputes verdicts — the caller
  * reuses the attempt's already-committed verdict partition (the
  * verdicts precede the intent marker), because a re-run of the dedup
  * would see the shard's own appended rows: two surviving near-dup
  * siblings would each match the other's store row and flip from kept
  * to dropped.
  */
object Reconcile {

  /** Converge `table` (bucketed on `keys`) and its `counts` side table
    * (append-only `(keys..., countCol)` delta rows) to the exact state
    * of appending `rows` once, regardless of how much of a prior
    * append attempt committed. `rows` must be materialization-safe
    * (persisted, or derived from a persisted frame) — it is consumed
    * by both the anti-join and the touched-key projection. */
  def appendExact(rows: DataFrame, idCol: String, table: String,
                  counts: String, countCol: String,
                  keys: Seq[String], buckets: Int): Unit = {
    val spark = rows.sparkSession
    val joinCols = keys :+ idCol
    val touched = rows.select(keys.map(col): _*).distinct()
    // restrict the store side to the shard's TOUCHED keys before the
    // id-grain anti-join: any row a prior attempt appended carries one
    // of the shard's own keys, so the comparison set is O(shard ×
    // per-key occupancy), never the corpus (the semi itself is a
    // narrow key-column pass over the store — a recovery-path cost,
    // paid once per crashed batch, not per append)
    val missing = rows.join(
      spark.table(table).select(joinCols.map(col): _*)
        .join(touched, keys, "left_semi"),
      joinCols, "left_anti")
    Bucketing.appendBucketed(missing, table, keys, buckets)
    if (!spark.catalog.tableExists(counts)) {
      // legacy store without a side table: the one-time full in-bucket
      // backfill (same as the normal append path)
      Bucketing.writeBucketed(
        spark.table(table).groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as(countCol)),
        counts, keys, buckets)
    } else {
      // every touched key has this shard's rows in the store after the
      // append above, so a left join from the recount covers them all
      val trueCnt = spark.table(table)
        .join(touched, keys, "left_semi")
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__true"))
      val have = spark.table(counts)
        .join(touched, keys, "left_semi")
        .groupBy(keys.map(col): _*).agg(sum(col(countCol)).as("__have"))
      val corrective = trueCnt.join(have, keys, "left")
        .select(keys.map(col) :+
          (col("__true") - coalesce(col("__have"), lit(0L))).as(countCol): _*)
        .filter(col(countCol) =!= 0L)
      Bucketing.appendBucketed(corrective, counts, keys, buckets)
    }
  }
}
