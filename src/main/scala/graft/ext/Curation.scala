package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation funnel as ONE declarative
  * plan: raw corpus → language filter → quality filter → exact dedup →
  * deterministic sample, reporting the surviving-document count at
  * every stage (the numbers a data-curation run actually publishes).
  * This is the composition the individual operators exist for — the
  * public pre-training recipes (C4, Gopher, FineWeb) are exactly such
  * funnels.
  *
  * Shape at 100 TB: one narrow projection computes the language and
  * quality gates plus the dedup fingerprint per row (every regex runs
  * ONCE per document, all codegen'd); the raw/language/quality stage
  * counts come from a single conditional aggregate over that scan, and
  * the dedup + sample counts from one fingerprint groupBy — the
  * funnel's only shuffle. Nothing ever widens a row beyond
  * (fingerprint, id, two booleans).
  */
object Curation {

  /** @return (stage_no, stage, n_docs) — one row per funnel stage. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             qualityMin: Double, sampleRate: Double): DataFrame = {
    val t = col(textCol)
    val flags = docs.select(col(idCol),
      TextAnalysis.fingerprintMd5(t).as("fp"),
      (TextAnalysis.predictedLang(t) === "en").as("lang_ok"),
      (TextAnalysis.qualityScore(t) >= qualityMin).as("qual_ok"))

    // coalesce: sum over an EMPTY corpus is NULL, but a funnel must
    // publish 0 at every stage (the oracle's count(*) does)
    val scanStages = flags.agg(
        count(lit(1)).as("raw"),
        coalesce(sum(when(col("lang_ok"), 1L).otherwise(0L)), lit(0L)).as("lang_en"),
        coalesce(sum(when(col("lang_ok") && col("qual_ok"), 1L).otherwise(0L)),
          lit(0L)).as("quality"))

    // dedup over the quality survivors; the sample bucket is a function
    // of the canonical (min) id, so both counts fall out of one groupBy
    val canon = flags.filter(col("lang_ok") && col("qual_ok"))
      .groupBy("fp").agg(min(col(idCol)).as(idCol))
    val dedupStages = canon.agg(
      count(lit(1)).as("dedup"),
      coalesce(sum(when(Sampling.hashBucket(col(idCol))
          < math.round(sampleRate * Sampling.Denom), 1L).otherwise(0L)),
        lit(0L)).as("sample"))

    def stage(no: Int, name: String, src: DataFrame): DataFrame =
      src.select(lit(no).as("stage_no"), lit(name).as("stage"),
        col(name).as("n_docs"))

    stage(1, "raw", scanStages)
      .unionByName(stage(2, "lang_en", scanStages))
      .unionByName(stage(3, "quality", scanStages))
      .unionByName(stage(4, "dedup", dedupStages))
      .unionByName(stage(5, "sample", dedupStages))
  }
}
