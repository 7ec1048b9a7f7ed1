package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OBJECTIVE-MIXTURE construction — the recipe step that turns one
  * curated corpus into a multi-objective training set (the UL2 /
  * code-model pattern: a seeded share of documents renders as T5 span
  * corruption ([[SpanCorruption]]), a share as fill-in-the-middle
  * ([[Fim]]), the rest as plain autoregressive text), with exactly ONE
  * objective per document: real pipelines assign per doc and
  * materialize the union, they do not run every transform over
  * everything and triple the token bill.
  *
  * The assignment is the engine-wide seeded-hash draw
  * ([[Sampling.hashBucket]] over `seed:obj:id` against cumulative
  * shares) — reproducible across runs, engines, partitionings,
  * retries. Each leg renders through its OWN checked transform under a
  * derived sub-seed (`seed:span`, `seed:fim`), so the mixture's
  * renderings can never drift from x124/x127's semantics; the FIM leg
  * applies at rate 1.0 within its assignment (the objective share IS
  * the mix rate — FIM-ineligible short docs still pass through under
  * the `fim` label as their own AR rendering, the published
  * keep-in-batch behavior, honestly reported by the audit's char
  * masses rather than silently reassigned).
  *
  * Unified rendering contract: `(id, objective, input_text,
  * target_text)` — span corruption fills both sides (the
  * encoder/decoder pair); FIM and AR are decoder-only streams, so
  * `input_text` is '' and the PSM / plain token stream is the target.
  * Null/token-less docs render ('', '') under their assigned label —
  * the no-silent-drop spine.
  *
  * Scale shape: the assignment is one narrow seeded projection; each
  * leg runs its transform's own documented shape over ITS SUBSET only
  * (the filters sit directly above the scan); the union is free
  * (no shuffle); the audit is one map-side-combined groupBy to
  * (group × objective) cardinality plus a group-cardinality window. */
object Objectives {

  /** Seeded per-doc objective assignment: adds `objective` ∈
    * {'span', 'fim', 'ar'} by cumulative-share draw. */
  def assign(docs: DataFrame, idCol: String, seed: String,
             spanShare: Double, fimShare: Double): DataFrame = {
    require(spanShare >= 0 && fimShare >= 0 && spanShare + fimShare <= 1,
      s"shares must be >= 0 and sum <= 1, got span=$spanShare fim=$fimShare")
    val b = Sampling.hashBucket(concat_ws(":", lit(seed), lit("obj"),
      col(idCol)))
    val spanThr = math.round(spanShare * Sampling.Denom)
    val fimThr = math.round((spanShare + fimShare) * Sampling.Denom)
    docs.withColumn("objective",
      when(b < spanThr, "span").when(b < fimThr, "fim").otherwise("ar"))
  }

  /** The materialized mixture: one row per document,
    * `(id, objective, input_text, target_text)` — see class doc for
    * the per-leg rendering contract. Span-corruption parameters are
    * the T5 defaults the x116 family checks (rate 0.15, span 3). */
  def materializeMix(docs: DataFrame, idCol: String, textCol: String,
                     seed: String, spanShare: Double, fimShare: Double,
                     corruptionRate: Double = 0.15,
                     spanLen: Int = 3): DataFrame = {
    val assigned = assign(docs.select(col(idCol), col(textCol)), idCol,
      seed, spanShare, fimShare)
    val span = SpanCorruption.materialize(
        assigned.filter(col("objective") === "span")
          .select(col(idCol), col(textCol)),
        idCol, textCol, corruptionRate, spanLen, s"$seed:span")
      .select(col(idCol), lit("span").as("objective"),
        col("input_text"), col("target_text"))
    val fim = Fim.transform(
        assigned.filter(col("objective") === "fim")
          .select(col(idCol), col(textCol)),
        idCol, textCol, fimRate = 1.0, seed = s"$seed:fim")
      .select(col(idCol), lit("fim").as("objective"),
        lit("").as("input_text"), col("psm_text").as("target_text"))
    val ar = assigned.filter(col("objective") === "ar")
      .select(col(idCol), lit("ar").as("objective"),
        lit("").as("input_text"),
        array_join(coalesce(Ngrams.normTokens(col(textCol)),
          array().cast("array<string>")), " ").as("target_text"))
    span.unionByName(fim).unionByName(ar)
  }

  /** The per-group MIX AUDIT — realized vs target objective rates
    * plus the exact char masses each leg rendered (the columns that
    * pin the renderings, not just the assignment, through the oracle):
    * `(group, objective, n_docs, realized_rate, target_rate,
    * sum_input_chars, sum_target_chars)`. `realized_rate` divides by
    * the group's doc count (every doc renders exactly once, so the
    * rates per group sum to 1). */
  def mixAudit(docs: DataFrame, idCol: String, textCol: String,
               groupCol: String, seed: String, spanShare: Double,
               fimShare: Double, corruptionRate: Double = 0.15,
               spanLen: Int = 3): DataFrame = {
    val mix = materializeMix(docs.select(col(idCol), col(textCol)), idCol,
      textCol, seed, spanShare, fimShare, corruptionRate, spanLen)
    val target = when(col("objective") === "span", spanShare)
      .when(col("objective") === "fim", fimShare)
      .otherwise(1.0 - spanShare - fimShare)
    docs.select(col(idCol), col(groupCol))
      .join(mix, Seq(idCol))
      .groupBy(groupCol, "objective")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("input_text")).cast("long")).as("sum_input_chars"),
        sum(length(col("target_text")).cast("long")).as("sum_target_chars"))
      .withColumn("__total",
        sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(groupCol)))
      .select(col(groupCol), col("objective"), col("n_docs"),
        (col("n_docs").cast("double") / col("__total").cast("double"))
          .as("realized_rate"),
        target.as("target_rate"),
        col("sum_input_chars"), col("sum_target_chars"))
  }
}
