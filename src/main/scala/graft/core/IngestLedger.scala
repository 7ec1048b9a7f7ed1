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
  * Implementation: empty MARKER FILES (one intent + one commit per
  * applied batch) under `<warehouse>/<table>_applied/` — the same
  * commit-log shape as Spark's own file-sink `_spark_metadata`. A
  * lookup is a filesystem `exists`, a record is an atomic empty-file
  * create: ZERO Spark jobs, no catalog entries, and the markers live
  * on the same storage (and with the same durability) as the store's
  * data files. O(#batches) empty files; a lookup never lists the
  * directory.
  *
  * The ledger is TWO-PHASE, so there is no residual window: an INTENT
  * marker is written after a batch's verdicts commit but before its
  * store append begins, and the COMMIT marker after every side effect
  * has committed. A replayed batch with a commit marker is skipped
  * outright. A replayed batch with only an intent marker crashed
  * somewhere inside its append — the caller takes the RECONCILE path
  * ([[Reconcile.appendExact]]): it reuses the already-committed
  * verdicts (re-running the dedup would let the shard see its own
  * appended rows — two surviving near-dup siblings would each match
  * the other's store row and flip from kept to dropped), appends only
  * the store rows that are not already present, and lands corrective
  * count deltas computed against a fresh in-bucket recount of the
  * touched keys. Every step of the reconcile path is itself
  * idempotent, so a crash DURING recovery just reconciles again.
  * No intent marker means the append never started: the normal path
  * re-runs (the verdict rewrite is deterministic — the store is
  * unchanged — and dynamic partition overwrite replaces the partition).
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

  private def intentMarker(spark: SparkSession, table: String,
                           batchId: Long): Path =
    new Path(ledgerDir(spark, table), s"batch-$batchId.intent")

  private def touch(spark: SparkSession, m: Path): Unit = {
    val fs = m.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
  }

  private def exists(spark: SparkSession, m: Path): Boolean =
    m.getFileSystem(spark.sessionState.newHadoopConf()).exists(m)

  /** Has `batchId` been fully committed against `table`? One
    * filesystem `exists` — no job, no listing. */
  def applied(spark: SparkSession, table: String, batchId: Long): Boolean =
    exists(spark, marker(spark, table, batchId))

  /** Did a prior attempt of `batchId` BEGIN its store append (commit
    * its verdicts and write the intent marker)? True on the replay of
    * a batch that crashed mid-append — the caller must take the
    * reconcile path instead of re-running the dedup. */
  def intended(spark: SparkSession, table: String, batchId: Long): Boolean =
    exists(spark, intentMarker(spark, table, batchId))

  /** Declare that `batchId`'s store append is ABOUT to start — call
    * after the batch's verdicts have committed, immediately before the
    * first store side effect. An atomic empty-file create. */
  def intent(spark: SparkSession, table: String, batchId: Long): Unit =
    touch(spark, intentMarker(spark, table, batchId))

  /** Record `batchId` as fully committed — call LAST, after every side
    * effect of the batch has committed. An atomic empty-file create.
    * The intent marker is kept: two empty files per batch, and
    * [[applied]] (checked first) makes the intent unreachable. */
  def record(spark: SparkSession, table: String, batchId: Long): Unit =
    touch(spark, marker(spark, table, batchId))

  /** Drop the ledger. Called when a store is freshly (re)written: a new
    * store restarts its batch-id space, and a stale ledger would make
    * the new loop's batches look already-applied and silently skip. */
  def reset(spark: SparkSession, table: String): Unit = {
    val d = ledgerDir(spark, table)
    d.getFileSystem(spark.sessionState.newHadoopConf()).delete(d, true)
  }
}
