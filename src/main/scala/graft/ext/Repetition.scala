package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models", table A1 — the public repetition filters): per
  * document, the fraction of n-gram occurrences that belong to a
  * duplicated n-gram, and the fraction claimed by the single most
  * frequent n-gram. High values flag boilerplate / spam / degenerate
  * text for pre-training filtering.
  *
  * Shape at 100 TB: gram explosion is map-side; the only shuffles are
  * the (doc, gram) count and the per-doc roll-up — both keyed on the
  * document id, so the second aggregate is a near-no-op after the
  * first (same key prefix). Counts are integers end to end; the only
  * rounded ops are the final int/int → double divisions, which are
  * single-IEEE-op deterministic.
  */
object Repetition {

  /** Per-doc stats for one n: (id, n_grams_{n}, dup_frac_{n},
    * top_frac_{n}). Docs shorter than n tokens get 0 grams and 0.0
    * fractions. */
  def ngramStats(docs: DataFrame, idCol: String, textCol: String,
                 n: Int): DataFrame = {
    val suffix = s"_$n"
    // tokens projected first: a HOF lambda re-evaluates free
    // subexpressions per element (see Decontaminate.grams)
    val counts = docs
      .select(col(idCol), Ngrams.normTokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(Ngrams.ngrams(col("__toks"), n)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.groupBy(idCol)
      .agg(sum("cnt").as("total"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup"),
        max("cnt").as("top"))
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total"), lit(0L)).as(s"n_grams$suffix"),
        when(coalesce(col("total"), lit(0L)) === 0, 0.0)
          .otherwise(col("dup").cast("double") / col("total")).as(s"dup_frac$suffix"),
        when(coalesce(col("total"), lit(0L)) === 0, 0.0)
          .otherwise(col("top").cast("double") / col("total")).as(s"top_frac$suffix"))
  }

  /** The combined 2-gram + 3-gram signal table (one row per doc),
    * computed in ONE corpus pass: tokenize once, explode every n's
    * grams as (n, gram)-tagged rows, count per (doc, n, gram), and
    * roll up per doc with conditional aggregates — the same
    * share-the-expensive-stage fix [[Vocab.oovRates]] got (joining two
    * [[ngramStats]] calls instead re-runs `normTokens` — the regex
    * tokenization, the corpus-proportional cost — once per n, and adds
    * a doc-keyed join). Output schema/order matches the joined form. */
  def signals(docs: DataFrame, idCol: String, textCol: String,
              ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns == ns.distinct, s"ns must be distinct, got $ns")
    // __toks is referenced by every per-n lambda, so CollapseProject
    // keeps the tokenization staged as a real column (see ngramStats)
    val tagged = concat(ns.map(n =>
      transform(Ngrams.ngrams(col("__toks"), n),
        g => struct(lit(n).as("n"), g.as("gram")))): _*)
    val counts = docs
      .select(col(idCol), Ngrams.normTokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(tagged).as("g"))
      .groupBy(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
    val aggs = ns.flatMap { n =>
      Seq(
        sum(when(col("n") === n, col("cnt")).otherwise(lit(0L))).as(s"total_$n"),
        sum(when(col("n") === n && col("cnt") > 1, col("cnt"))
          .otherwise(lit(0L))).as(s"dup_$n"),
        max(when(col("n") === n, col("cnt"))).as(s"top_$n"))
    }
    val stats = counts.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol) +: ns.flatMap { n =>
        val total = coalesce(col(s"total_$n"), lit(0L))
        Seq(total.as(s"n_grams_$n"),
          when(total === 0, 0.0)
            .otherwise(col(s"dup_$n").cast("double") / col(s"total_$n"))
            .as(s"dup_frac_$n"),
          when(total === 0, 0.0)
            .otherwise(col(s"top_$n").cast("double") / col(s"total_$n"))
            .as(s"top_frac_$n"))
      }: _*)
  }
}
