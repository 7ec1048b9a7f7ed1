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
  * Shape at 100 TB: the per-doc features (language scores, quality
  * features, dedup fingerprint) are STAGED as columns in one narrow
  * projection — each regex/score expression evaluates once per
  * document — and the gate decisions in a second projection reference
  * only those columns. Inlining the argmax over the raw score
  * expressions instead would copy every score subtree into each
  * when-branch, where codegen subexpression elimination cannot reach
  * (measured 1.6 s → 5 s at sf0.1; Catalyst's CollapseProject refuses
  * to merge the two projections for exactly that reason). The
  * raw/language/quality stage counts come from a single conditional
  * aggregate over that scan, and the dedup + sample counts from one
  * fingerprint groupBy — the funnel's only shuffle.
  */
object Curation {

  /** @return (stage_no, stage, n_docs) — one row per funnel stage. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             qualityMin: Double, sampleRate: Double): DataFrame = {
    val t = col(textCol)
    // stage every feature once; gate decisions reference columns only
    val feats = docs.select(
      col(idCol) +:
        TextAnalysis.fingerprintMd5(t).as("fp") +:
        length(t).cast("long").as("__nc") +:
        size(TextAnalysis.wsTokens(t)).cast("long").as("__nt") +:
        TextAnalysis.digitRatio(t).as("__digit") +:
        TextAnalysis.nonAsciiRatio(t).as("__s_zh") +:
        Seq("de", "en", "es", "fr").map(l =>
          TextAnalysis.stopwordRatio(t,
            Map("de" -> TextAnalysis.stopDe, "en" -> TextAnalysis.stopEn,
              "es" -> TextAnalysis.stopEs, "fr" -> TextAnalysis.stopFr)(l))
            .as(s"__s_$l")): _*)
    val avgLen = when(col("__nt") === 0, 0.0)
      .otherwise((col("__nc") - col("__nt") + 1).cast("double") / col("__nt"))
    val score = lit(0.4) * col("__s_en") +
      lit(0.3) * (least(avgLen, lit(10.0)) / 10.0) +
      lit(0.3) * (lit(1.0) - col("__digit"))
    // persisted for the duration of this call (released before return —
    // the eager localCheckpoint below materializes the result first):
    // without materialization, predicate pushdown rewrites the
    // dedup branch's filter in terms of the RAW score trees — every
    // regex re-evaluated per row inside a Filter where subexpression
    // elimination cannot reach (measured 6.8 s for that branch alone at
    // sf0.1 vs ~0.5 s from the cached flags). The cached row is just
    // (id, 16-byte fp, two booleans) — far smaller than the corpus.
    val flags = feats.select(col(idCol), col("fp"),
      (TextAnalysis.argmaxLang(
        Seq("de", "en", "es", "fr", "zh").map(l => l -> col(s"__s_$l")))
        === "en").as("lang_ok"),
      (score >= qualityMin).as("qual_ok"))
      .persist()

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

    // ONE row with all five counts, exploded into stage rows — a union
    // of five single-row aggregates instead would give every branch its
    // own full corpus scan (no exchange to reuse; measured 5 scans / ~5 s
    // at sf0.1 vs 2 scans here: one for the flag counts, one feeding the
    // dedup groupBy)
    val out = scanStages.crossJoin(dedupStages)
      .select(explode(array(
        struct(lit(1).as("stage_no"), lit("raw").as("stage"), col("raw").as("n_docs")),
        struct(lit(2).as("stage_no"), lit("lang_en").as("stage"), col("lang_en").as("n_docs")),
        struct(lit(3).as("stage_no"), lit("quality").as("stage"), col("quality").as("n_docs")),
        struct(lit(4).as("stage_no"), lit("dedup").as("stage"), col("dedup").as("n_docs")),
        struct(lit(5).as("stage_no"), lit("sample").as("stage"), col("sample").as("n_docs"))))
        .as("s"))
      .select(col("s.stage_no"), col("s.stage"), col("s.n_docs"))
      // eager: the whole funnel runs here and only the 5 result rows are
      // retained, which lets this operator release its own cache — the
      // flags table is internal (no caller ever sees it), so unlike the
      // MinHash/Packing signature tables there is no caller to own the
      // lifetime, and repeated funnel() calls must not accumulate
      // CacheManager entries for the session's lifetime
      .localCheckpoint(true)
    flags.unpersist()
    out
  }

  /** Per-group quality-quantile gate — the per-DOMAIN top-fraction
    * selection the published curation recipes apply instead of one
    * global threshold (a cutoff tuned on web text would gut a
    * high-value but stylistically different domain; ranking WITHIN the
    * domain keeps every domain's best half). Keeps the top `fraction`
    * of each group by `scoreCol`: `cume_dist` over the group ascending
    * in score — `(rows ≤ current)/n`, identical arithmetic and
    * whole-tie-group semantics in every engine — kept iff
    * `cume_dist > 1 − fraction`. cume_dist (not percent_rank) is the
    * deliberate choice: a singleton group ranks 1.0 and KEEPS its only
    * row (percent_rank would rank it 0.0 and a half-fraction gate
    * would gut every tiny domain), and a tie group is kept or dropped
    * WHOLE (no arbitrary winner among equals). Rows with a NULL score
    * (nothing to judge) bypass the ranking with null
    * `cume_dist`/`kept`: policy decides them, not this operator — and
    * cross-engine null-ORDERING semantics never enter the window.
    *
    * Scale shape: ONE scan of the (possibly expensive — e.g. a full LM
    * scoring plan) input: the null bypass is a window PARTITION key
    * (`scoreCol IS NULL`), not a second filter branch that would
    * re-evaluate the input's lineage, and the null partition's window
    * values are masked to null in the projection — so one hash
    * exchange on (group, is-null) + an in-partition sort, no global
    * sort, no driver quantile, no double scan (measured: the
    * two-branch union form re-ran x59's LM scoring twice, 3.45 s →
    * this shape). */
  def topFractionPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                          fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1,
      s"fraction must be in (0,1], got $fraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col(scoreCol).isNull)
      .orderBy(col(scoreCol))
    df.withColumn("__cd", cume_dist().over(w))
      .withColumn("cume_dist",
        when(col(scoreCol).isNotNull, col("__cd")))
      .withColumn("kept",
        when(col(scoreCol).isNotNull, col("__cd") > lit(1.0 - fraction)))
      .drop("__cd")
  }

  /** The ONE-SHOT batch recipe composed end to end — the static-corpus
    * counterpart of [[CurationLoop.ingestShard]]'s incremental loop,
    * chaining the published recipe stages in their production order:
    *
    *   1. heuristic rule gate            ([[RuleGate]], x61 — cheapest first)
    *   2. corpus boilerplate removal     ([[PassageDedup.removeBoilerplate]], x65)
    *   3. exact dedup ON THE CLEANED TEXT ([[ExactDedup.dedup]], x01 —
    *      after cleanup, because boilerplate-stripped twins only become
    *      identical once their shared noise is gone)
    *   4. per-source quality-quantile gate over the heuristic score
    *      ([[topFractionPerGroup]], x59's shape)
    *   5. token-budget mixture materialization ([[Mixing]], x60)
    *
    * Every downstream stage consumes the stage-2 CLEANED text (scores,
    * fingerprints and token budgets all see what training would see).
    * The output is the materialized mixture itself — one row per
    * (document, copy), the corpus a trainer reads.
    *
    * Scale shape: each stage keeps its own pinned plan (this method
    * composes the checked operators; it re-plans nothing) — the gate
    * stages are narrow or fp/source-keyed, and the one corpus-sized
    * join chain is id-keyed survivor filtering exactly as the
    * streaming loop does it. */
  def batchRecipe(docs: DataFrame, idCol: String, textCol: String,
                  langCol: String, sourceCol: String,
                  rules: RuleGate.Rules, chunkTokens: Int, minDocFreq: Int,
                  keepFraction: Double, weights: Map[String, Double],
                  budgetTokens: Long): DataFrame = {
    // stage 1: rule gate
    val ruleKept = RuleGate.flags(docs, idCol, textCol, rules)
      .filter(col("keep")).select(col(idCol))
    val s1 = docs.join(ruleKept, Seq(idCol))
      .select(col(idCol), col(langCol), col(sourceCol), col(textCol))
    // stage 2: boilerplate removal — cleaned text replaces the original.
    // The cleaned corpus feeds THREE downstream consumers (dedup
    // fingerprints, quality scoring, mixture token stats): eagerly
    // materialize it once (localCheckpoint) instead of re-running the
    // passage-frequency cascade per consumer (measured 3.2 s → the
    // sum-of-stages cost at sf0.1; at 100 TB the staged corpus is the
    // natural inter-stage artifact, exactly as the incremental loop
    // persists per-stage verdicts)
    val cleaned = PassageDedup.removeBoilerplate(s1, idCol, textCol,
        chunkTokens, minDocFreq)
      .select(col(idCol), col("text_kept").as("__clean"))
    val s2 = s1.join(cleaned, Seq(idCol))
      .select(col(idCol), col(langCol), col(sourceCol), col("__clean"))
      .localCheckpoint(true)
    // stage 3: exact dedup on the cleaned text, min-id canonical keeps
    val canon = ExactDedup.dedup(s2, idCol, "__clean")
      .select(col("canonical_id").as(idCol))
    val s3 = s2.join(canon, Seq(idCol))
    // stage 4: per-source top fraction by the heuristic quality score;
    // the gate output feeds both the mixture's token stats and its
    // materialize join — two consumers, one more checkpoint
    val gated = topFractionPerGroup(
        s3.withColumn("__q", TextAnalysis.qualityScore(col("__clean"))),
        sourceCol, "__q", keepFraction)
      .filter(col("kept"))
      .select(col(idCol), col(langCol), col(sourceCol), col("__clean"))
      .localCheckpoint(true)
    // stage 5: materialize the mixture over the cleaned token counts
    Mixing.materializeMixture(gated, langCol, idCol, "__clean",
        weights, budgetTokens)
      .select(col(idCol), col(langCol), col(sourceCol),
        col("copy_idx"), col("n_copies"))
  }
}
