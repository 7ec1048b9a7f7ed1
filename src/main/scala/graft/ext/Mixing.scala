package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture balancing: compute per-stratum sampling rates that
  * flatten a skewed corpus to a uniform token mixture — the "how much
  * of each language/source do we actually take" step that sits between
  * corpus stats and [[Sampling.stratified]] in every published
  * pre-training recipe.
  *
  * The rate for stratum s is `min_tokens / tokens_s` (the largest
  * uniform target every stratum can still meet without upsampling),
  * capped at 1.0 by construction. Both operands are exact int64 token
  * counts, so the rate is a single correctly-rounded division — the
  * oracle compares bit-exact.
  *
  * Shape at 100 TB: one map-side-combined groupBy over (stratum) with
  * integer token sums, plus an unpartitioned min over the GROUP table
  * (stratum-cardinality input — dozens of rows, not the corpus).
  */
object Mixing {

  /** @return (stratum, n_docs, n_tokens, mix_rate) — one row per
    *         stratum, `mix_rate` in (0, 1]. The uniform target is the
    *         smallest POSITIVE stratum (an empty stratum has no tokens
    *         to contribute — it must not zero everyone else's budget)
    *         and token-less strata get rate 1.0 (keep all of nothing). */
  def uniformRates(docs: DataFrame, stratumCol: String,
                   textCol: String): DataFrame = {
    val stats = docs
      .select(col(stratumCol),
        coalesce(size(Ngrams.normTokens(col(textCol))).cast("long"), lit(0L))
          .as("__nt"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"))
    stats
      .withColumn("__min",
        min(when(col("n_tokens") > 0, col("n_tokens")))
          .over(Window.partitionBy()))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        when(col("n_tokens") === 0, 1.0)
          .otherwise(col("__min").cast("double") / col("n_tokens"))
          .as("mix_rate"))
  }
}
