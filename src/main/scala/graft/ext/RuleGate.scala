package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style heuristic quality-rule gate: the published
  * rule-bundle filter that sits BEFORE model-based scoring in every
  * large pre-training pipeline (MassiveText's quality filtering, C4's
  * cleanup rules) — cheap per-document signals, each with its own
  * threshold, each surfaced as its own flag so the funnel can report
  * per-rule drop counts, plus the conjunction verdict.
  *
  * Signals: word count bounds, mean word length bounds, minimum
  * stopword hits, maximum share of the single most frequent word (the
  * word-soup/repetition tell), maximum symbol-to-word ratio ('#' and
  * '…'-style ellipsis spam), minimum fraction of words containing an
  * alphabetic character.
  *
  * Shape at 100 TB: one narrow per-row projection over the scan — the
  * token array is projected ONCE and every signal is a codegen'd /
  * Catalyst HOF over it; no shuffle, no UDF, no driver state. The one
  * super-linear term is the top-word share (|distinct| × |tokens| per
  * document — bounded by document length, not corpus size).
  *
  * Determinism: ratios are single double divisions of exact int64
  * counts and threshold compares replay the identical IEEE ops in the
  * oracle — bit-exact.
  */
object RuleGate {

  /** Rule thresholds, defaulted to the published Gopher bands scaled
    * for short synthetic documents (production uses 50–100k words). */
  final case class Rules(
      minWords: Int = 20, maxWords: Int = 80,
      minMeanWordLen: Double = 4.0, maxMeanWordLen: Double = 5.0,
      minStopwordHits: Int = 2,
      maxTopWordShare: Double = 0.2,
      maxSymbolRatio: Double = 0.1,
      minAlphaWordRatio: Double = 0.8)

  /** Occurrence count of literal `sym` in `text` (by length delta —
    * pure string arithmetic, no regex). */
  private def occurrences(text: Column, sym: String): Column =
    ((length(text) - length(replace(text, lit(sym), lit(""))))
      / lit(sym.length)).cast("long")

  /** Per-document rule signals + per-rule flags + the `keep`
    * conjunction. Token-less documents fail the word-count rule (and
    * report 0.0 for every ratio rather than NULL/NaN). */
  def flags(docs: DataFrame, idCol: String, textCol: String,
            rules: Rules = Rules(),
            stopwords: Seq[String] = TextAnalysis.stopEn): DataFrame = {
    val projected = docs.select(col(idCol),
      col(textCol).as("__text"),
      Ngrams.normTokens(col(textCol)).as("__toks"))
    val n = size(col("__toks")).cast("long")
    // total characters across tokens as ONE codegen'd string op — the
    // per-token length fold ran through interpreted HOF eval (round 22,
    // guide: eliminate non-codegen expressions in the hot path)
    val charSum = length(array_join(col("__toks"), "")).cast("long")
    val stopHits = size(filter(col("__toks"),
      t => t.isin(stopwords: _*))).cast("long")
    // top-word multiplicity = the longest equal run of the SORTED token
    // array: one O(n log n) sort + one O(n) fold. The previous
    // `aggregate(array_distinct, …, size(filter(…)))` form was
    // O(|distinct| × |tokens|) through interpreted HOF eval and
    // allocated a filtered array per distinct word — measured as the
    // dominant term of the whole rule pass (round 22). Same value:
    // max run length over sorted == max multiplicity.
    val topCount = aggregate(
      array_sort(col("__toks")),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, w) => {
        val run = when(acc.getField("prev") === w,
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val symbols = occurrences(col("__text"), "#") +
      occurrences(col("__text"), "...")
    // "contains a letter" via translate-delta (pure string arithmetic)
    // instead of a per-token regex engine call — same predicate over
    // the lowercase token alphabet
    val alphaWords = size(filter(col("__toks"),
      t => length(translate(t, "abcdefghijklmnopqrstuvwxyz", "")) <
        length(t))).cast("long")
    val ratio = (num: Column) =>
      when(n === 0, 0.0).otherwise(num.cast("double") / n)
    projected
      .select(col(idCol),
        n.as("n_words"),
        ratio(charSum).as("mean_word_len"),
        stopHits.as("stop_hits"),
        ratio(topCount).as("top_word_share"),
        ratio(symbols).as("symbol_ratio"),
        ratio(alphaWords).as("alpha_word_ratio"))
      .withColumn("ok_words",
        col("n_words") >= rules.minWords && col("n_words") <= rules.maxWords)
      .withColumn("ok_word_len",
        col("mean_word_len") >= rules.minMeanWordLen &&
          col("mean_word_len") <= rules.maxMeanWordLen)
      .withColumn("ok_stop", col("stop_hits") >= rules.minStopwordHits)
      .withColumn("ok_top_word",
        col("top_word_share") <= rules.maxTopWordShare)
      .withColumn("ok_symbols", col("symbol_ratio") <= rules.maxSymbolRatio)
      .withColumn("ok_alpha",
        col("alpha_word_ratio") >= rules.minAlphaWordRatio)
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_stop") &&
          col("ok_top_word") && col("ok_symbols") && col("ok_alpha"))
  }
}
