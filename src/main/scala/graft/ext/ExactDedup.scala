package graft.ext

import graft.core.Bucketing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact deduplication over a text (or any) column: hash-groupBy on the
  * normalized content, keep the smallest id as canonical.
  *
  * Scale shape: one hash-partition shuffle on the (fingerprint) key —
  * identical to a groupBy count. For 100 TB, group on the 128-bit
  * fingerprint rather than the full text so shuffle rows carry 16 bytes
  * + id instead of document bodies; collision probability of md5 at any
  * realistic corpus size is negligible (and a second exact pass within
  * groups can confirm if required).
  *
  * The INCREMENTAL form (the [[IncrementalDedup]] pattern applied to
  * exact fingerprints — in production the FIRST dedup stage, run before
  * the near-dup passes) keeps a persisted FINGERPRINT STORE: one
  * `(fp, canonical_id)` row per distinct content ever ingested, written
  * as a catalog table bucketed+sorted by `fp`
  * ([[writeFingerprintStore]]). Each new shard fingerprints itself and
  * LEFT-joins the store on `fp` ([[dedupExactAgainstStore]]): the store
  * side reads its buckets in place — zero shuffle, zero recompute, no
  * text on the wire (16-byte fp + id rows only) — and the shard side
  * exchanges once on `fp`. First-wins over the union: a shard doc whose
  * fingerprint is already stored drops with `dup_of` = the store's
  * canonical id; survivors' fingerprints append in the same bucket
  * layout ([[appendFingerprints]]), so the next shard dedups against
  * everything ingested so far at cost proportional to the SHARD, never
  * the corpus.
  */
object ExactDedup {

  /** Per-distinct-content row: canonical (min) id, duplicate count, and
    * the content fingerprint. */
  def dedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("dup_count"))
      .select(col("canonical_id"), col("dup_count"), col("fp"))

  /** `(id, fp)` rows — a null/absent text yields a null fingerprint,
    * which never equi-joins: fingerprint-less docs always keep. */
  private def fingerprints(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    docs.select(col(idCol),
      TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))

  /** One `(fp, canonical_id)` row per distinct fingerprint (min id —
    * intra-shard twins collapse here, so the store stays one row per
    * content). */
  private def storeRows(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    fingerprints(docs, idCol, textCol)
      .filter(col("fp").isNotNull)
      .groupBy("fp").agg(min(col(idCol)).as("canonical_id"))

  /** Compute and persist the fingerprint store for `docs` as the
    * bucketed catalog table `table` (bucketed+sorted by `fp`). */
  def writeFingerprintStore(docs: DataFrame, idCol: String, textCol: String,
                            table: String, buckets: Int): Unit =
    Bucketing.writeBucketed(storeRows(docs, idCol, textCol),
      table, Seq("fp"), buckets)

  /** Append a shard's fingerprints into an existing store (same
    * layout). The ingest loop appends SURVIVORS only — their
    * fingerprints are absent from the store by definition of having
    * survived, so the one-row-per-fp invariant holds across appends
    * (intra-shard twins collapse to their min id here). Periodic
    * [[graft.core.Bucketing.compact]] restores one file per bucket. */
  def appendFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         table: String, buckets: Int): Unit =
    Bucketing.appendBucketed(storeRows(docs, idCol, textCol),
      table, Seq("fp"), buckets)

  /** Deduplicate a NEW shard against a persisted fingerprint `store`:
    * one row per shard doc — `(id, kept, dup_of)`, `dup_of` the store's
    * canonical id for the content (null when kept). The merge hint pins
    * the sort-merge strategy so a small test-scale shard cannot
    * silently broadcast and bypass the bucketed layout being proven
    * (PlanSpec pins the store side Exchange-free). */
  def dedupExactAgainstStore(newDocs: DataFrame, idCol: String,
                             textCol: String, store: DataFrame): DataFrame =
    fingerprints(newDocs, idCol, textCol)
      .join(store.select(col("fp"), col("canonical_id").as("dup_of"))
        .hint("merge"), Seq("fp"), "left")
      .select(col(idCol), col("dup_of").isNull.as("kept"), col("dup_of"))
}
