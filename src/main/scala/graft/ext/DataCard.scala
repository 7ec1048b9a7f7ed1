package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source corpus data card: the one-table summary every published
  * corpus release ships (The Pile's datasheet, FineWeb's per-dump
  * stats) — for each source: document and token counts, language
  * spread, the dominant language and its share, the exact-duplicate
  * rate against the WHOLE corpus, and the mean heuristic quality
  * score.
  *
  * Determinism: the mean quality is the only cross-row float reduction
  * — per-row scores quantize to `floor(score·2²⁰)` int64 BEFORE the
  * sum (order-free integer arithmetic, the x53 LM-score pattern), and
  * only the final mean divides back to double. Everything else is
  * exact counts and single divisions.
  *
  * Shape at 100 TB: one narrow feature projection over the scan; the
  * duplicate rate needs the corpus-wide fingerprint counts, so the fp
  * groupBy + count join is the one corpus-keyed shuffle pair (16-byte
  * fps + ids on the wire, never text); the language distribution and
  * final rollup group on (source[, lang]) — source-cardinality
  * outputs, map-side combined; the top-language table joins back
  * BROADCAST. */
object DataCard {

  /** Quantizer scale for the mean-quality sum (2²⁰ — scores live in
    * [0, 1], so a petabyte-scale source's sum stays far from int64
    * overflow: 2⁶³/2²⁰ ≈ 8.8e12 documents). */
  val QualityScale = 1048576L

  /** @return one row per source:
    *         (source, n_docs, n_tokens, n_langs, top_lang,
    *         top_lang_share, dup_rate, mean_quality), ordered by
    *         nothing (callers order). */
  def perSource(docs: DataFrame, idCol: String, textCol: String,
                langCol: String, sourceCol: String): DataFrame = {
    val t = col(textCol)
    // per-doc features in one projection: token count, quantized
    // quality score (the x03 formula), corpus-dedup fingerprint
    val avgLen = when(col("__nt") === 0, 0.0)
      .otherwise((col("__nc") - col("__nt") + 1).cast("double") / col("__nt"))
    val feats = docs.select(col(idCol), col(langCol), col(sourceCol),
        TextAnalysis.fingerprintMd5(t).as("fp"),
        length(t).cast("long").as("__nc"),
        size(TextAnalysis.wsTokens(t)).cast("long").as("__nt"),
        TextAnalysis.digitRatio(t).as("__digit"),
        TextAnalysis.stopwordRatio(t, TextAnalysis.stopEn).as("__stop"))
      .withColumn("__score_q",
        floor((lit(0.4) * col("__stop")
          + lit(0.3) * (least(avgLen, lit(10.0)) / 10.0)
          + lit(0.3) * (lit(1.0) - col("__digit")))
          * lit(QualityScale.toDouble)).cast("long"))
    // corpus-wide duplicate flag: fp occurrence counts joined back
    val fpCounts = feats.groupBy("fp").agg(count(lit(1)).as("__fp_n"))
    val flagged = feats.join(fpCounts, Seq("fp"))
      .withColumn("__is_dup", (col("__fp_n") > 1).cast("long"))
    val rollup = flagged.groupBy(sourceCol).agg(
      count(lit(1)).as("n_docs"),
      sum("__nt").as("n_tokens"),
      countDistinct(col(langCol)).as("n_langs"),
      sum("__is_dup").as("__n_dup"),
      sum("__score_q").as("__score_sum_q"))
    // dominant language per source: count desc, language asc tie-break
    val langRank = Window.partitionBy(sourceCol)
      .orderBy(col("__ln").desc, col(langCol).asc)
    val topLang = flagged.groupBy(sourceCol, langCol)
      .agg(count(lit(1)).as("__ln"))
      .withColumn("__rk", row_number().over(langRank))
      .filter(col("__rk") === 1)
      .select(col(sourceCol), col(langCol).as("top_lang"),
        col("__ln").as("__top_n"))
    rollup.join(broadcast(topLang), Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("n_langs"), col("top_lang"),
        (col("__top_n").cast("double") / col("n_docs")).as("top_lang_share"),
        (col("__n_dup").cast("double") / col("n_docs")).as("dup_rate"),
        (col("__score_sum_q").cast("double") / lit(QualityScale.toDouble)
          / col("n_docs")).as("mean_quality"))
  }
}
