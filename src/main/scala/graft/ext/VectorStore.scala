package graft.ext

import graft.core.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental EMBEDDING dedup against a persisted IVF-bucketed vector
  * store — the vector-space twin of [[IncrementalDedup]]'s signature
  * store, and the production shape of x12's whole-corpus embedding
  * near-dup: a continuously-ingested corpus keeps its vectors assigned
  * to coarse IVF cells ([[graft.functions.NearestCentroid]] — the
  * deterministic LCG codebook; a trained k-means codebook drops in by
  * replacing the scorer), written as a catalog table bucketed by
  * `cell`, and each new shard is deduplicated by probing only its
  * `nProbe` best cells — WITHOUT recomputing a single store assignment.
  *
  * Scale shape: the probe join is a `cell`-keyed equi-join whose store
  * side reads its buckets in place (zero shuffle, the q33/x34 story —
  * PlanSpec pins the store subtree Exchange-free); the shard side
  * exchanges once on `cell`. Per-shard cost is
  * O(shard · nProbe · E[cell size]) — proportional to the SHARD, never
  * the corpus. An oversized cell means nCentroids is misconfigured for
  * the corpus (the x38 discussion): AQE's skew-join split bounds the
  * damage at run time, and the fix is a larger codebook, exactly as a
  * blown-up k-means cluster is re-clustered.
  *
  * First-wins over the union: store vectors were ingested earlier, so a
  * new vector matching any store vector (exact cosine ≥ `minCosine`
  * within probed cells) drops; the store never changes retroactively.
  * Same arithmetic as [[Similarity]] end to end (bit-identical LCG
  * centroids, sequential-fold cosine), so the whole path is
  * oracle-checkable bit-for-bit (x45).
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

  /** Compute and persist the vector store for `vecs` as the bucketed
    * catalog table `table` (bucketed+sorted by `cell`). */
  def writeVectorStore(vecs: DataFrame, idCol: String, embCol: String,
                       nCentroids: Int, dim: Int, seedOffset: Long,
                       table: String, buckets: Int): Unit =
    Bucketing.writeBucketed(
      assigned(vecs, idCol, embCol, nCentroids, dim, seedOffset),
      table, Seq("cell"), buckets)

  /** Append a shard's assigned vectors into an existing store (same
    * layout; the ingest loop appends SURVIVORS only, mirroring
    * [[IncrementalDedup.appendSignatures]]). */
  def appendVectors(vecs: DataFrame, idCol: String, embCol: String,
                    nCentroids: Int, dim: Int, seedOffset: Long,
                    table: String, buckets: Int): Unit =
    Bucketing.appendBucketed(
      assigned(vecs, idCol, embCol, nCentroids, dim, seedOffset),
      table, Seq("cell"), buckets)

  /** Deduplicate a NEW shard of vectors against a persisted `store`
    * (a table written by [[writeVectorStore]] with the SAME
    * codebook parameters). Each new vector probes its `nProbe`
    * best cells; store vectors in those cells are scored with the exact
    * sequential-fold cosine; ≥ `minCosine` is a duplicate. The merge
    * hint pins the sort-merge strategy so a small test-scale shard
    * cannot silently broadcast and bypass the bucketed layout being
    * proven.
    *
    * @return one row per new-shard vector: `(id, kept, n_store_matches,
    *         dup_of)` — `dup_of` the smallest matching store id (null
    *         when kept). */
  /** The continuous-ingest form ([[IncrementalDedup.streamIngest]]'s
    * vector twin): each micro-batch is a shard — dedup it against the
    * vector store, write the per-vector verdicts EXACTLY-ONCE
    * (partitioned by `batch_id` with dynamic partition overwrite, so a
    * replayed batch replaces its own partition), append the SURVIVORS'
    * assigned vectors, so the next micro-batch dedups against
    * everything ingested so far. */
  def streamIngest(newVecs: DataFrame, idCol: String, embCol: String,
                   table: String, buckets: Int, minCosine: Double,
                   nCentroids: Int, nProbe: Int, dim: Int, seedOffset: Long,
                   outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newVecs.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, idCol, embCol, table, buckets,
          minCosine, nCentroids, nProbe, dim, seedOffset, outPath)
      }
      .start()

  /** One micro-batch of [[streamIngest]] — also the non-streaming entry
    * point for a caller-driven ingest loop. Verdicts are eagerly
    * materialized (`localCheckpoint`) BEFORE the store append, so the
    * lazy plan over the store table cannot observe the shard's own
    * vectors. */
  def ingestBatch(batch: DataFrame, batchId: Long,
                  idCol: String, embCol: String,
                  table: String, buckets: Int, minCosine: Double,
                  nCentroids: Int, nProbe: Int, dim: Int, seedOffset: Long,
                  outPath: String): Unit = {
    val spark = batch.sparkSession
    val verdicts = dedupAgainstStore(batch, idCol, embCol,
        spark.table(table), minCosine, nCentroids, nProbe, dim, seedOffset)
      .localCheckpoint(true)
    verdicts.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outPath)
    val kept = verdicts.filter(col("kept")).select(col(idCol))
    appendVectors(batch.join(kept, Seq(idCol)), idCol, embCol,
      nCentroids, dim, seedOffset, table, buckets)
  }

  def dedupAgainstStore(newVecs: DataFrame, idCol: String, embCol: String,
                        store: DataFrame, minCosine: Double,
                        nCentroids: Int, nProbe: Int, dim: Int,
                        seedOffset: Long): DataFrame = {
    val scores = Similarity.centroidScores(col(embCol), nCentroids, dim,
      seedOffset)
    val probeW = Window.partitionBy("new_id")
      .orderBy(col("__score").desc, col("cell"))
    val probes = newVecs
      .select(col(idCol).as("new_id"), col(embCol).as("__qe"),
        posexplode(scores).as(Seq("cell", "__score")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col("new_id"), col("__qe"), col("cell"))
    // a store vector lives in exactly ONE cell and a new vector probes
    // each cell at most once, so every (new, store) pair scores at most
    // once — no distinct needed before the per-doc rollup
    val pairs = probes
      .join(store.hint("merge"), Seq("cell"))
      .filter(col("new_id") =!= col(idCol))
      .select(col("new_id"), col(idCol).as("store_id"),
        Similarity.cosine(col("__qe"), col(embCol)).as("cos"))
      .filter(col("cos") >= minCosine)
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
