package graft.ext

import graft.core.{Bucketing, IngestLedger}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental EMBEDDING dedup against a persisted IVF-bucketed vector
  * store — the vector-space twin of [[IncrementalDedup]]'s signature
  * store, and the production shape of x12's whole-corpus embedding
  * near-dup: a continuously-ingested corpus keeps its vectors assigned
  * to coarse IVF cells ([[graft.functions.NearestCentroid]] — the
  * deterministic LCG codebook; a trained k-means codebook drops in by
  * replacing the scorer, proven by [[Similarity.ivfTopKTrained]]),
  * written as a catalog table bucketed by `cell`, and each new shard is
  * deduplicated by probing only its `nProbe` best cells — WITHOUT
  * recomputing a single store assignment.
  *
  * Scale shape: the probe join is a `cell`-keyed equi-join whose store
  * side reads its buckets in place (zero shuffle, the q33/x34 story —
  * PlanSpec pins the store subtree Exchange-free); the shard side
  * exchanges once on `cell`. Per-shard cost is
  * O(shard · nProbe · E[cell size]) — proportional to the SHARD, never
  * the corpus.
  *
  * Hot cells are the store twin of the signature store's hot band keys:
  * in an APPEND-ONLY store a pathological cell (boilerplate embeddings,
  * a zero-adjacent region the codebook under-resolves) grows every
  * future shard's probe-join candidate work unboundedly. The cap is the
  * x43 pattern applied to `cell`: a per-cell vector-count SIDE TABLE
  * ([[countsTable]], bucketed like the store) maintained as APPEND-ONLY
  * deltas on every append (O(shard) write work, never a rewrite),
  * summed in-bucket at dedup time ([[cellCountTotals]]) and
  * semi-filtering BOTH probe and store sides against cells at-or-under
  * `maxCellVecs`. A capped cell means a bounded, observable recall loss
  * on exactly the vectors upstream exact dedup already collapses — and
  * the permanent fix (a larger / trained codebook) is a re-cluster, not
  * a per-shard cost. [[compactStore]] periodically collapses the
  * accumulated deltas and per-bucket files.
  *
  * First-wins over the union: store vectors were ingested earlier, so a
  * new vector matching any store vector (exact cosine ≥ `minCosine`
  * within probed cells) drops; the store never changes retroactively.
  * Same arithmetic as [[Similarity]] end to end (bit-identical LCG
  * centroids, sequential-fold cosine), so the whole path is
  * oracle-checkable bit-for-bit (x45, capped x47).
  *
  * Recall: a duplicate is found iff the store twin sits in one of the
  * new vector's probed cells. An exact duplicate always is (identical
  * vector → identical argmax cell, probed first); near-dups follow the
  * IVF recall curve pinned in RecallSpec for the batch path.
  */
object VectorStore {

  /** `(id, embedding, cell)` rows — the persistable store layout (and
    * what a new shard computes for itself before probing). */
  def assigned(vecs: DataFrame, idCol: String, embCol: String,
               nCentroids: Int, dim: Int, seedOffset: Long): DataFrame =
    vecs.select(col(idCol), col(embCol),
      graft.functions.NearestCentroid(col(embCol), nCentroids, dim, seedOffset)
        .as("cell"))

  /** Name of the per-cell vector-count side table maintained alongside
    * a vector store `table` — APPEND-ONLY delta rows `(cell, n_vecs)`:
    * one row per cell per append, summed to totals at read time by
    * [[cellCountTotals]]. Bucketed by `cell` with the store's bucket
    * count, so the rollup and the hot-cell semi-filters run
    * bucket-aligned, Exchange-free. */
  def countsTable(table: String): String = s"${table}_cellcounts"

  /** Total per-cell store vector counts from the delta side table —
    * an in-bucket rollup over the compact count relation (an int and a
    * long per row), never the store. */
  def cellCountTotals(deltas: DataFrame): DataFrame =
    deltas.groupBy("cell").agg(sum("n_vecs").as("n_vecs"))

  /** Per-cell vector counts of an assigned relation. */
  private def cellCounts(assignedVecs: DataFrame): DataFrame =
    assignedVecs.groupBy("cell").agg(count(lit(1)).as("n_vecs"))

  /** Compute and persist the vector store for `vecs` as the bucketed
    * catalog table `table` (bucketed+sorted by `cell`), plus its
    * per-cell count side table ([[countsTable]] — the initial full
    * rollup is the first delta, derived by reading the just-written
    * store back in-bucket). */
  def writeVectorStore(vecs: DataFrame, idCol: String, embCol: String,
                       nCentroids: Int, dim: Int, seedOffset: Long,
                       table: String, buckets: Int): Unit = {
    Bucketing.writeBucketed(
      assigned(vecs, idCol, embCol, nCentroids, dim, seedOffset),
      table, Seq("cell"), buckets)
    val spark = vecs.sparkSession
    Bucketing.writeBucketed(cellCounts(spark.table(table)),
      countsTable(table), Seq("cell"), buckets)
    IngestLedger.reset(spark, table)
  }

  /** Append a shard's assigned vectors into an existing store (same
    * layout; the ingest loop appends SURVIVORS only, mirroring
    * [[IncrementalDedup.appendSignatures]]) and land the shard's
    * per-cell count DELTAS in the side table — O(shard) work, no
    * rewrite of either relation. Stores written before the side table
    * existed get it backfilled with a one-time in-bucket rollup. The
    * shard is consumed twice (store append + delta append), so the
    * narrow assigned rows are persisted for the duration. */
  def appendVectors(vecs: DataFrame, idCol: String, embCol: String,
                    nCentroids: Int, dim: Int, seedOffset: Long,
                    table: String, buckets: Int): Unit = {
    val rows = assigned(vecs, idCol, embCol, nCentroids, dim, seedOffset)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Bucketing.appendBucketed(rows, table, Seq("cell"), buckets)
      val spark = vecs.sparkSession
      val ct = countsTable(table)
      if (spark.catalog.tableExists(ct))
        Bucketing.appendBucketed(cellCounts(rows), ct, Seq("cell"), buckets)
      else
        Bucketing.writeBucketed(cellCounts(spark.table(table)), ct,
          Seq("cell"), buckets)
    } finally rows.unpersist()
  }

  /** Periodic store maintenance — the vector twin of
    * [[IncrementalDedup.compactStore]]: rewrite the store to one file
    * per bucket (restoring the probe join's in-bucket Sort elision),
    * collapse any externally-introduced duplicate rows (full-row
    * distinct — the assigned layout is fully determined by the vector;
    * the ingest loop itself is exactly-once via the two-phase ledger,
    * [[graft.core.IngestLedger]] + [[graft.core.Reconcile]]), and
    * rebuild the count side table from a fresh in-bucket recount. */
  def compactStore(spark: SparkSession, table: String, buckets: Int): Unit = {
    Bucketing.compact(spark, table, Seq("cell"), buckets,
      prepare = _.dropDuplicates())
    Bucketing.writeBucketed(
      cellCounts(spark.table(table)).repartition(buckets, col("cell")),
      countsTable(table), Seq("cell"), buckets)
  }

  /** The continuous-ingest form ([[IncrementalDedup.streamIngest]]'s
    * vector twin): each micro-batch is a shard — dedup it against the
    * vector store (optionally hot-cell-capped through the count side
    * table, which the loop's appends advance BETWEEN micro-batches),
    * write the per-vector verdicts EXACTLY-ONCE (partitioned by
    * `batch_id` with dynamic partition overwrite, so a replayed batch
    * replaces its own partition), append the SURVIVORS' assigned
    * vectors, so the next micro-batch dedups against everything
    * ingested so far. */
  def streamIngest(newVecs: DataFrame, idCol: String, embCol: String,
                   table: String, buckets: Int, minCosine: Double,
                   nCentroids: Int, nProbe: Int, dim: Int, seedOffset: Long,
                   outPath: String, checkpoint: String,
                   maxCellVecs: Long = 0L, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newVecs.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, idCol, embCol, table, buckets,
          minCosine, nCentroids, nProbe, dim, seedOffset, outPath,
          maxCellVecs)
        // in-loop maintenance, same contract as
        // [[IncrementalDedup.streamIngest]]: best-effort compaction
        // AFTER the batch's ledger record, outside the exactly-once
        // contract, idempotent under replay
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compactStore(batch.sparkSession, table, buckets)
      }
      .start()

  /** One micro-batch of [[streamIngest]] — also the non-streaming entry
    * point for a caller-driven ingest loop. Verdicts are eagerly
    * materialized (`localCheckpoint`) BEFORE the store append, so the
    * lazy plan over the store table cannot observe the shard's own
    * vectors; a batch id already committed in the store's applied-batch
    * ledger ([[graft.core.IngestLedger]]) is skipped outright, and one
    * that crashed mid-append replays through the reconcile path
    * ([[graft.core.Reconcile.appendExact]], reusing the committed
    * verdicts), so the at-least-once `foreachBatch` replay is
    * effectively exactly-once end to end. */
  def ingestBatch(batch: DataFrame, batchId: Long,
                  idCol: String, embCol: String,
                  table: String, buckets: Int, minCosine: Double,
                  nCentroids: Int, nProbe: Int, dim: Int, seedOffset: Long,
                  outPath: String, maxCellVecs: Long = 0L): Unit = {
    val spark = batch.sparkSession
    if (IngestLedger.applied(spark, table, batchId)) return
    if (IngestLedger.intended(spark, table, batchId)) {
      // a prior attempt committed this batch's verdicts and crashed
      // inside its append: reuse the committed verdicts (a re-run of
      // the dedup would see the shard's own appended vectors —
      // surviving near-dup SIBLINGS would each match the other's store
      // row and flip from kept to dropped) and converge store + counts
      // to the exact post-append state
      val kept = spark.read.parquet(outPath)
        .filter(col("batch_id") === batchId && col("kept"))
        .select(col(idCol))
      val rows = assigned(batch.join(kept, Seq(idCol)), idCol, embCol,
          nCentroids, dim, seedOffset)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try graft.core.Reconcile.appendExact(rows, idCol, table,
        countsTable(table), "n_vecs", Seq("cell"), buckets)
      finally rows.unpersist()
    } else {
      val counts =
        if (maxCellVecs > 0) Some(spark.table(countsTable(table))) else None
      val verdicts = dedupAgainstStore(batch, idCol, embCol,
          spark.table(table), minCosine, nCentroids, nProbe, dim, seedOffset,
          maxCellVecs, counts)
        .localCheckpoint(true)
      verdicts.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outPath)
      IngestLedger.intent(spark, table, batchId)
      val kept = verdicts.filter(col("kept")).select(col(idCol))
      appendVectors(batch.join(kept, Seq(idCol)), idCol, embCol,
        nCentroids, dim, seedOffset, table, buckets)
    }
    IngestLedger.record(spark, table, batchId)
  }

  /** Deduplicate a NEW shard of vectors against a persisted `store`
    * (a table written by [[writeVectorStore]] with the SAME codebook
    * parameters). Each new vector probes its `nProbe` best cells; store
    * vectors in those cells are scored with the exact sequential-fold
    * cosine; ≥ `minCosine` is a duplicate. The merge hint pins the
    * sort-merge strategy so a small test-scale shard cannot silently
    * broadcast and bypass the bucketed layout being proven.
    *
    * `maxCellVecs > 0` engages the hot-cell cap: cells carrying MORE
    * than that many STORE vectors (per `cellCounts` — the
    * [[countsTable]] side table, required when the cap is on) are
    * excluded from candidate generation on BOTH join sides. Both
    * semi-joins are bucket-aligned (counts and store share the bucket
    * layout), so the store side stays Exchange-free with the cap
    * engaged (PlanSpec pins this). 0 (the default) disables the cap.
    *
    * @return one row per new-shard vector: `(id, kept, n_store_matches,
    *         dup_of)` — `dup_of` the smallest matching store id (null
    *         when kept). */
  def dedupAgainstStore(newVecs: DataFrame, idCol: String, embCol: String,
                        store: DataFrame, minCosine: Double,
                        nCentroids: Int, nProbe: Int, dim: Int,
                        seedOffset: Long, maxCellVecs: Long = 0L,
                        cellCounts: Option[DataFrame] = None): DataFrame = {
    require(maxCellVecs == 0 || cellCounts.nonEmpty,
      "maxCellVecs > 0 requires cellCounts (the store's countsTable)")
    val scores = Similarity.centroidScores(col(embCol), nCentroids, dim,
      seedOffset)
    val probeW = Window.partitionBy("new_id")
      .orderBy(col("__score").desc, col("cell"))
    val probes0 = newVecs
      .select(col(idCol).as("new_id"), col(embCol).as("__qe"),
        posexplode(scores).as(Seq("cell", "__score")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("new_id"), col("__qe"), col("cell"))
    val (probes, storeSide) =
      if (maxCellVecs > 0) {
        // totals from the append-only delta rows, summed in-bucket; the
        // probe-side filter prunes work only (an over-cap probe finds
        // no store rows anyway), the store-side filter is the semantics
        val ok = cellCountTotals(cellCounts.get)
          .filter(col("n_vecs") <= maxCellVecs)
          .select("cell")
        (probes0.join(ok.hint("merge"), Seq("cell"), "left_semi"),
          store.join(ok.hint("merge"), Seq("cell"), "left_semi"))
      } else (probes0, store)
    val scored = probes
      .join(storeSide.hint("merge"), Seq("cell"))
      .filter(col("new_id") =!= col(idCol))
      .select(col("new_id"), col(idCol).as("store_id"),
        Similarity.cosine(col("__qe"), col(embCol)).as("cos"))
      .filter(col("cos") >= minCosine)
    // collapse to the (new, store) pair grain before the per-doc
    // rollup: a no-op on a clean store (a store vector lives in exactly
    // one cell and each cell is probed at most once), but the guard
    // that keeps store rows duplicated by a replayed append
    // (IngestLedger's residual window) from inflating n_store_matches —
    // the same grain IncrementalDedup.dedupBanded collapses to
    val pairs = scored.groupBy("new_id", "store_id")
      .agg(max("cos").as("cos"))
    val perDoc = pairs.groupBy(col("new_id").as(idCol))
      .agg(count(lit(1)).as("n_store_matches"), min("store_id").as("dup_of"))
    newVecs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        col("dup_of").isNull.as("kept"),
        coalesce(col("n_store_matches"), lit(0L)).as("n_store_matches"),
        col("dup_of"))
  }
}
