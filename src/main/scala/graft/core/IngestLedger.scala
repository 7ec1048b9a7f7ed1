package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Applied-batch ledger for the incremental-store ingest loops
  * ([[graft.ext.IncrementalDedup.ingestBatch]] /
  * [[graft.ext.VectorStore.ingestBatch]]).
  *
  * `foreachBatch` is AT-LEAST-ONCE: a crash between a micro-batch's
  * side effects and the checkpoint commit replays the whole batch. The
  * verdict sink is already idempotent (dynamic partition overwrite on
  * `batch_id`), but a store append is not — a replayed append would
  * duplicate the survivors' store rows AND double-merge their count
  * deltas, permanently inflating the hot-key counts the cap filters on.
  * The ledger closes that: each fully-committed batch id is recorded in
  * a tiny `<table>_applied` catalog table, and a replayed batch whose
  * id is already recorded is skipped outright (its verdicts and append
  * both committed before the record was written — recording is the LAST
  * step of a batch).
  *
  * Residual window, stated honestly: a crash AFTER the store append but
  * BEFORE the ledger record replays the append once. Verdicts stay
  * correct (the dedup joins collapse to the (new, store) pair grain, so
  * duplicated store rows never double-count matches); the per-key
  * counts over-count by the duplicated shard's deltas, which can only
  * make the cap fire EARLY — a bounded, conservative recall loss, the
  * same failure direction the cap already accepts. The documented
  * repair is the store's `compactStore`: it collapses duplicated rows
  * (full-row distinct) and rebuilds the counts from a fresh in-bucket
  * recount.
  *
  * Scale: the ledger is one long per applied batch — O(#batches) rows,
  * read as one narrow filter per micro-batch. Batch ids must be unique
  * per logical shard; `foreachBatch` guarantees this for streaming
  * callers, and loop-driving callers own the contract.
  */
object IngestLedger {

  /** Name of the ledger table kept alongside a store `table`. */
  def ledgerTable(table: String): String = s"${table}_applied"

  /** Has `batchId` been fully committed against `table`? */
  def applied(spark: SparkSession, table: String, batchId: Long): Boolean = {
    val lt = ledgerTable(table)
    spark.catalog.tableExists(lt) &&
      !spark.table(lt).filter(col("batch_id") === batchId).isEmpty
  }

  /** Record `batchId` as fully committed — call LAST, after every side
    * effect of the batch has committed. */
  def record(spark: SparkSession, table: String, batchId: Long): Unit =
    spark.range(batchId, batchId + 1).select(col("id").as("batch_id"))
      .write.mode("append").format("parquet").saveAsTable(ledgerTable(table))

  /** Drop the ledger. Called when a store is freshly (re)written: a new
    * store restarts its batch-id space, and a stale ledger would make
    * the new loop's batches look already-applied and silently skip. */
  def reset(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `${ledgerTable(table)}`")
}
