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
  * substitute): the apply/skip draw is a seeded hash bucket
  * ([[Sampling.hashBucket]] — a RATE needs only 1/10⁴ resolution);
  * the cut points draw from the FULL-WIDTH 60-bit md5-prefix integer
  * — a cut is a POSITION, and reducing it to the 10⁴ sampling bucket
  * first would (a) make positions past 10⁴ unreachable for long
  * documents (exactly the code files FIM targets) and (b) modulo-bias
  * the draw once n approaches 10⁴. 2⁶⁰ mod (n−1) bias is ≤ (n−1)/2⁶⁰
  * — immaterial at any document length. Cut points are two
  * independent draws over [1, n−1] ordered into c1 ≤ c2 (equal cuts
  * give an empty middle — the published sampler permits empty spans
  * and so does this one, honestly rendered rather than resampled,
  * which would bias the draw). Docs with fewer than 3 tokens never
  * transform (no interior cut exists); untransformed docs pass
  * through with `fim = false` and the plain token stream (the AR
  * half of the FIM mix). Null text reads as the empty token stream
  * (n_tokens 0, psm_text '') — the engine-wide
  * coalesce-null-tokens-to-0 convention shared with
  * [[Packing]]/[[Mixing]].
  *
  * Scale shape: one narrow per-row projection — token array built
  * once, slices/joins are per-row HOF arithmetic; no shuffle, no
  * join, no state. */
object Fim {

  private def bucket(seed: String, tag: String, id: Column): Column =
    Sampling.hashBucket(concat_ws(":", lit(seed), lit(tag), id))

  /** Full-width (60-bit) md5-prefix integer — the POSITION draw
    * ([[Sampling.hashBucket]] is for rates; a position draw through
    * the 10⁴ bucket caps and biases the cut distribution). */
  private def wideDraw(seed: String, tag: String, id: Column): Column =
    conv(substring(md5(concat_ws(":", lit(seed), lit(tag), id)), 1, 15),
      16, 10).cast("long")

  /** @return (id, n_tokens, fim, c1, c2, psm_text) — `c1`/`c2` null on
    *         pass-through docs; `psm_text` is the PSM rendering for
    *         transformed docs and the plain space-joined tokens
    *         otherwise. */
  def transform(docs: DataFrame, idCol: String, textCol: String,
                fimRate: Double, seed: String): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1,
      s"fimRate must be in [0,1], got $fimRate")
    val thr = math.round(fimRate * Sampling.Denom)
    // null text = empty token stream (the engine-wide null policy and
    // the oracle's COALESCE-to-'' rendering)
    val toks = coalesce(Ngrams.normTokens(col(textCol)),
      array().cast("array<string>"))
    val n = size(col("__toks"))
    // two independent interior cut draws in [1, n-1], ordered; the
    // modulus clamps to >= 1 because the expressions evaluate on
    // short docs too (fim is false there, but ANSI pmod-by-zero would
    // throw before the guard is consulted)
    val interior = greatest(lit(1), n - 1).cast("long")
    val a = pmod(wideDraw(seed, "c1", col(idCol)), interior).cast("int") + 1
    val b = pmod(wideDraw(seed, "c2", col(idCol)), interior).cast("int") + 1
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

  /** The FIM-mix audit: per group, docs, ELIGIBLE docs (≥ 3 tokens —
    * the apply draw only runs on these, so the realized rate divides
    * by them: a group full of short docs would otherwise
    * systematically under-read), transformed docs, realized rate
    * (expected ≈ fimRate over eligible docs; null when none are
    * eligible — no draws, no evidence), mean middle-span share of the
    * document (quantized int sums — order-free). */
  def audit(docs: DataFrame, idCol: String, textCol: String,
            groupCol: String, fimRate: Double, seed: String): DataFrame = {
    val t = transform(docs.select(col(idCol), col(groupCol), col(textCol)),
      idCol, textCol, fimRate, seed)
    docs.select(col(idCol), col(groupCol))
      .join(t.select(col(idCol), col("n_tokens"), col("fim"), col("c1"),
        col("c2")), Seq(idCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= 3, 1L).otherwise(0L)).as("n_eligible"),
        sum(when(col("fim"), 1L).otherwise(0L)).as("n_fim"),
        sum(when(col("fim"),
          floor((col("c2") - col("c1")).cast("double") /
            col("n_tokens").cast("double") * lit(1048576.0)).cast("long"))
          .otherwise(0L)).as("__mid_q"))
      .select(col(groupCol), col("n_docs"), col("n_eligible"), col("n_fim"),
        when(col("n_eligible") > 0,
          col("n_fim").cast("double") / col("n_eligible").cast("double"))
          .as("realized_rate"),
        when(col("n_fim") > 0,
          col("__mid_q").cast("double") / lit(1048576.0) /
            col("n_fim").cast("double")).as("mean_middle_share"))
  }
}
