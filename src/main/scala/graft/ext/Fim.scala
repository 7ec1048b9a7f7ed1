package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle objective construction — the code/infilling
  * pre-training transform (Bavarian et al. 2022, "Efficient Training
  * of Language Models to Fill in the Middle"): for a seeded fraction
  * of documents, cut the token stream at two points into
  * (prefix, middle, suffix) and emit the PSM re-arrangement
  * `<fim_prefix> P <fim_suffix> S <fim_middle> M` — the published
  * result is that training on a FIM mix costs no left-to-right
  * capability while adding infilling, so every modern code pipeline
  * ships this transform next to span corruption ([[SpanCorruption]]'s
  * grain is token spans; FIM's grain is the document).
  *
  * DETERMINISM over the published sampler's RNG (the engine-wide
  * substitute): the apply/skip draw and both cut points are seeded
  * hash buckets ([[Sampling.hashBucket]]) — reproducible across runs,
  * engines, partitionings, retries. Cut points are two independent
  * draws over [1, n−1] ordered into c1 ≤ c2 (equal cuts give an empty
  * middle — the published sampler permits empty spans and so does
  * this one, honestly rendered rather than resampled, which would
  * bias the draw). Docs with fewer than 3 tokens never transform
  * (no interior cut exists); untransformed docs pass through with
  * `fim = false` and the plain token stream (the AR half of the FIM
  * mix).
  *
  * Scale shape: one narrow per-row projection — token array built
  * once, slices/joins are per-row HOF arithmetic; no shuffle, no
  * join, no state. */
object Fim {

  private def bucket(seed: String, tag: String, id: Column): Column =
    Sampling.hashBucket(concat_ws(":", lit(seed), lit(tag), id))

  /** @return (id, n_tokens, fim, c1, c2, psm_text) — `c1`/`c2` null on
    *         pass-through docs; `psm_text` is the PSM rendering for
    *         transformed docs and the plain space-joined tokens
    *         otherwise. */
  def transform(docs: DataFrame, idCol: String, textCol: String,
                fimRate: Double, seed: String): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1,
      s"fimRate must be in [0,1], got $fimRate")
    val thr = math.round(fimRate * Sampling.Denom)
    val toks = Ngrams.normTokens(col(textCol))
    val n = size(col("__toks"))
    // two independent interior cut draws in [1, n-1], ordered; the
    // modulus clamps to >= 1 because the expressions evaluate on
    // short docs too (fim is false there, but ANSI pmod-by-zero would
    // throw before the guard is consulted)
    val interior = greatest(lit(1), n - 1).cast("long")
    val a = pmod(bucket(seed, "c1", col(idCol)), interior).cast("int") + 1
    val b = pmod(bucket(seed, "c2", col(idCol)), interior).cast("int") + 1
    val joinToks = (from: Column, len: Column) =>
      array_join(slice(col("__toks"), from, len), " ")
    docs.select(col(idCol), toks.as("__toks"))
      .withColumn("n_tokens", n.cast("long"))
      .withColumn("fim",
        n >= 3 && bucket(seed, "apply", col(idCol)) < lit(thr))
      .withColumn("c1", when(col("fim"), least(a, b).cast("long")))
      .withColumn("c2", when(col("fim"), greatest(a, b).cast("long")))
      .withColumn("psm_text",
        when(col("fim"),
          concat(lit("<fim_prefix> "),
            joinToks(lit(1), col("c1").cast("int")),
            lit(" <fim_suffix> "),
            joinToks(col("c2").cast("int") + 1, n - col("c2").cast("int")),
            lit(" <fim_middle> "),
            joinToks(col("c1").cast("int") + 1,
              (col("c2") - col("c1")).cast("int"))))
          .otherwise(array_join(col("__toks"), " ")))
      .select(col(idCol), col("n_tokens"), col("fim"), col("c1"),
        col("c2"), col("psm_text"))
  }

  /** The FIM-mix audit: per group, docs, transformed docs, realized
    * rate (expected ≈ fimRate over eligible docs), mean middle-span
    * share of the document (quantized int sums — order-free). */
  def audit(docs: DataFrame, idCol: String, textCol: String,
            groupCol: String, fimRate: Double, seed: String): DataFrame = {
    val t = transform(docs.select(col(idCol), col(groupCol), col(textCol)),
      idCol, textCol, fimRate, seed)
    docs.select(col(idCol), col(groupCol))
      .join(t.select(col(idCol), col("n_tokens"), col("fim"), col("c1"),
        col("c2")), Seq(idCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("fim"), 1L).otherwise(0L)).as("n_fim"),
        sum(when(col("fim"),
          floor((col("c2") - col("c1")).cast("double") /
            col("n_tokens").cast("double") * lit(1048576.0)).cast("long"))
          .otherwise(0L)).as("__mid_q"))
      .select(col(groupCol), col("n_docs"), col("n_fim"),
        (col("n_fim").cast("double") / col("n_docs").cast("double"))
          .as("realized_rate"),
        when(col("n_fim") > 0,
          col("__mid_q").cast("double") / lit(1048576.0) /
            col("n_fim").cast("double")).as("mean_middle_share"))
  }
}
