package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model quality scoring (the CCNet/KenLM filtering pattern,
  * reduced to an engine-portable core): fit bigram statistics on a
  * REFERENCE corpus (the domain you want more of), then score candidate
  * documents by their mean bigram transition probability
  * `avg over positions i of p(w_{i+1} | w_i) = c(w_i w_{i+1}) / c(w_i)`
  * — fluent in-domain text scores high, boilerplate/junk/out-of-domain
  * text (whose transitions the reference never saw) scores low. Unseen
  * transitions back off to probability 0, so the score is a direct
  * "fraction of familiar mass" signal in [0, 1].
  *
  * Engine-portable arithmetic (the volatility/cents discipline applied
  * to probabilities): each ratio is one IEEE double division of two
  * exact integer counts — identical in any engine — and is then
  * QUANTIZED to floor(ratio·2³⁰) (exact: scaling by a power of two,
  * ratio ≤ 1 since every `w₁w₂` occurrence is a `w₁` occurrence), so
  * the per-doc aggregation is an ORDER-FREE integer sum, never a
  * float reduction whose value depends on Spark's partial-aggregate
  * order. The final score divides two exact values once, in a pinned
  * operation order mirrored by the oracle. No logs, no transcendental
  * functions — nothing that could differ by an ulp across engines.
  * The 2³⁰ scale keeps probabilities to ~1e-9 (ample for a [0,1]
  * filtering signal) while bounding the per-doc sum at
  * n_bigrams·2³⁰ — overflow would need a single ~2³³-token document
  * (tens of GB of text), far past anything a document-grain pipeline
  * feeds this operator.
  *
  * Scale shape at 100 TB: grams are the codegen'd 60-bit
  * [[graft.functions.ShingleMd5]] fingerprints (no gram string ever
  * materializes; nothing wider than fp + count crosses the wire). The
  * fit is two map-side-combined count aggregations; scoring is two
  * fp-keyed equi-joins of the candidate corpus against the compact
  * count relations plus one doc-keyed rollup. A long-lived deployment
  * would persist the two count relations bucketed by fp (the
  * [[IncrementalDedup]] store pattern) so every scoring run reads them
  * in place; the operator takes them as DataFrames, so a bucketed
  * catalog table drops in unchanged.
  */
object LmScore {

  private val QScale = 1073741824.0 // 2^30

  private def toks(textCol: String) =
    Ngrams.normTokens(col(textCol)).as("__toks")

  /** Fit the model in ONE pass over the reference: tokenize once,
    * explode BOTH shingle streams tagged by gram order (the
    * [[Repetition.signals]] share-the-expensive-stage pattern — the
    * regex tokenization is the corpus-proportional cost; two separate
    * count queries would pay it twice), count in one map-side-combined
    * shuffle. Output `(n, fp, c)` with n = 1 (transition denominators:
    * `w₁` occurrences anywhere) and n = 2 (numerators).
    *
    * [[score]] consumes the model relation twice (one filter per gram
    * order), so hand it a MATERIALIZED model — a persisted/checkpointed
    * frame, or the production shape: the relation written as a catalog
    * table (bucketed by `fp`, the [[IncrementalDedup]] store pattern)
    * that every scoring run then reads in place. */
  def fit(docs: DataFrame, textCol: String): DataFrame =
    docs.select(toks(textCol))
      .select(explode(concat(
        transform(graft.functions.ShingleMd5(col("__toks"), 1),
          f => struct(lit(1).as("n"), f.as("fp"))),
        transform(graft.functions.ShingleMd5(col("__toks"), 2),
          f => struct(lit(2).as("n"), f.as("fp"))))).as("g"))
      .groupBy(col("g.n").as("n"), col("g.fp").as("fp"))
      .agg(count(lit(1)).as("c"))

  /** Score `docs` against a fitted model (the [[fit]] relation): one
    * row per doc — `(id, n_bigrams, p_sum_q, lm_score)` with `p_sum_q`
    * the exact integer sum of the quantized transition probabilities
    * and `lm_score = (p_sum_q / 2³⁰) / n_bigrams` ∈ [0, 1] (null for
    * docs with fewer than two tokens — no transitions to judge).
    *
    * `docs` is scanned ONCE: an OUTER position explode keeps a single
    * null-bigram row for transition-less docs, so the per-doc rollup
    * itself is the full id spine — no second pass over (a possibly
    * expensive upstream of) `docs` for a final verdict join. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame = {
    val uniCounts = model.filter(col("n") === 1).select(col("fp"), col("c"))
    val biCounts = model.filter(col("n") === 2).select(col("fp"), col("c"))
    // per-position (prefix-unigram fp, bigram fp) pairs: the two
    // shingle arrays are position-aligned, so the prefix of bigram i is
    // unigram i; a doc with no bigrams keeps one all-null row
    val pairs = docs
      .select(col(idCol), toks(textCol))
      .select(col(idCol),
        graft.functions.ShingleMd5(col("__toks"), 1).as("__u"),
        posexplode_outer(graft.functions.ShingleMd5(col("__toks"), 2))
          .as(Seq("__pos", "bi_fp")))
      .select(col(idCol), col("bi_fp"),
        element_at(col("__u"), col("__pos") + 1).as("uni_fp"))
    pairs
      .join(biCounts.select(col("fp").as("bi_fp"), col("c").as("__c2")),
        Seq("bi_fp"), "left")
      .join(uniCounts.select(col("fp").as("uni_fp"), col("c").as("__c1")),
        Seq("uni_fp"), "left")
      // an unseen bigram (or prefix) carries no familiar mass: ratio 0
      .select(col(idCol), col("bi_fp"),
        floor(coalesce(col("__c2").cast("double") / col("__c1").cast("double"),
          lit(0.0)) * lit(QScale)).as("__q"))
      .groupBy(idCol)
      .agg(count(col("bi_fp")).as("n_bigrams"), // null spine rows don't count
        sum(when(col("bi_fp").isNotNull, col("__q"))).as("p_sum_q"))
      .select(col(idCol),
        col("n_bigrams"),
        col("p_sum_q"),
        (col("p_sum_q").cast("double") / lit(QScale) /
          col("n_bigrams").cast("double")).as("lm_score"))
  }
}
