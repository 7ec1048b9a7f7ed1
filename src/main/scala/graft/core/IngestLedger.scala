package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
  * The ledger closes that: each fully-committed batch id is recorded,
  * and a replayed batch whose id is already recorded is skipped
  * outright (its verdicts and append both committed before the record
  * was written — recording is the LAST step of a batch).
  *
  * Implementation: one empty MARKER FILE per applied batch under
  * `<warehouse>/<table>_applied/` — the same commit-log shape as
  * Spark's own file-sink `_spark_metadata`. A lookup is a filesystem
  * `exists`, a record is an atomic empty-file create: ZERO Spark jobs,
  * no catalog entries, and the markers live on the same storage (and
  * with the same durability) as the store's data files. O(#batches)
  * empty files; a lookup never lists the directory.
  *
  * Residual window, stated honestly: a crash AFTER the store append but
  * BEFORE the marker write replays the append once. Verdicts stay
  * correct (the dedup joins collapse to the (new, store) pair grain, so
  * duplicated store rows never double-count matches); the per-key
  * counts over-count by the duplicated shard's deltas, which can only
  * make the cap fire EARLY — a bounded, conservative recall loss, the
  * same failure direction the cap already accepts. The documented
  * repair is the store's `compactStore`: it collapses duplicated rows
  * (full-row distinct) and rebuilds the counts from a fresh in-bucket
  * recount.
  *
  * Batch ids must be unique per logical shard; `foreachBatch`
  * guarantees this for streaming callers, and loop-driving callers own
  * the contract.
  */
object IngestLedger {

  /** Directory of marker files kept alongside a store `table`. */
  def ledgerDir(spark: SparkSession, table: String): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), s"${table}_applied")

  private def marker(spark: SparkSession, table: String, batchId: Long): Path =
    new Path(ledgerDir(spark, table), s"batch-$batchId")

  /** Has `batchId` been fully committed against `table`? One
    * filesystem `exists` — no job, no listing. */
  def applied(spark: SparkSession, table: String, batchId: Long): Boolean = {
    val m = marker(spark, table, batchId)
    m.getFileSystem(spark.sessionState.newHadoopConf()).exists(m)
  }

  /** Record `batchId` as fully committed — call LAST, after every side
    * effect of the batch has committed. An atomic empty-file create. */
  def record(spark: SparkSession, table: String, batchId: Long): Unit = {
    val m = marker(spark, table, batchId)
    val fs = m.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
  }

  /** Drop the ledger. Called when a store is freshly (re)written: a new
    * store restarts its batch-id space, and a stale ledger would make
    * the new loop's batches look already-applied and silently skip. */
  def reset(spark: SparkSession, table: String): Unit = {
    val d = ledgerDir(spark, table)
    d.getFileSystem(spark.sessionState.newHadoopConf()).delete(d, true)
  }
}
