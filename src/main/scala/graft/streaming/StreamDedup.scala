package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for the training-data pipeline (the streaming
  * counterpart of [[graft.ext.ExactDedup]], SURVEY.md §2.9 × north-star):
  * as documents arrive, keep the FIRST occurrence of each content
  * fingerprint and drop subsequent exact duplicates.
  *
  *   - [[exactDedupStream]]: unbounded-state variant —
  *     `dropDuplicates(fp)` keeps one row per fingerprint forever.
  *     Correct for bounded corpora / reprocessing runs; state grows with
  *     distinct-doc count (a 16-byte key per doc — ~1.6 TB of state per
  *     10¹¹ docs, the honest number for a full-corpus streaming dedup).
  *   - [[exactDedupStreamWatermarked]]: bounded-state variant —
  *     `dropDuplicatesWithinWatermark(fp)` deduplicates within the
  *     event-time watermark horizon and EXPIRES fingerprint state beyond
  *     it (the 100 TB continuous-ingest path: crawl re-fetches of the
  *     same page arrive near each other in event time, so a horizon of
  *     days catches them while keeping state proportional to the window,
  *     not the corpus).
  *
  * The fingerprint is [[TextAnalysis.fingerprintMd5]] over normalized
  * text — identical to the batch operator, so a document deduped in
  * streaming and one deduped in batch agree on identity.
  */
object StreamDedup {

  /** Add the content fingerprint column the dedup keys on. */
  def withFingerprint(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprintMd5(col(textCol)))

  /** First-wins exact dedup over the whole stream (unbounded state —
    * see class doc for when that is the right trade). */
  def exactDedupStream(docs: DataFrame, textCol: String): DataFrame =
    withFingerprint(docs, textCol).dropDuplicates("fp")

  /** First-wins exact dedup with fingerprint state expired past the
    * event-time watermark (bounded state). */
  def exactDedupStreamWatermarked(docs: DataFrame, textCol: String,
                                  tsCol: String, delay: String): DataFrame =
    withFingerprint(docs, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
