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
  * Shape at 100 TB: the three filters are narrow codegen'd expressions
  * sitting directly on the scan (language, quality, and the md5 sample
  * bucket are all per-row); the only shuffle in the whole funnel is the
  * dedup's fingerprint groupBy. Stage counts are partial-aggregated
  * map-side. Nothing here widens a row beyond (id, fingerprint).
  */
object Curation {

  /** @return (stage_no, stage, n_docs) — one row per funnel stage. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             qualityMin: Double, sampleRate: Double): DataFrame = {
    val t = col(textCol)
    val base = docs.select(col(idCol), t)
    val lang = base.filter(TextAnalysis.predictedLang(t) === "en")
    val qual = lang.filter(TextAnalysis.qualityScore(t) >= qualityMin)
    val dedup = qual
      .groupBy(TextAnalysis.fingerprintMd5(t).as("fp"))
      .agg(min(col(idCol)).as(idCol))
    val sampled = dedup.filter(
      Sampling.hashBucket(col(idCol)) < math.round(sampleRate * Sampling.Denom))

    def stage(no: Int, name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_docs"))
        .select(lit(no).as("stage_no"), lit(name).as("stage"), col("n_docs"))

    stage(1, "raw", base)
      .unionByName(stage(2, "lang_en", lang))
      .unionByName(stage(3, "quality", qual))
      .unionByName(stage(4, "dedup", dedup))
      .unionByName(stage(5, "sample", sampled))
  }
}
