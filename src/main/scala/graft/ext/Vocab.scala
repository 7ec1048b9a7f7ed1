package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency-based vocabulary build + out-of-vocabulary rates — the
  * relational core of tokenizer training: the top-K corpus terms by
  * total count (deterministic tie-break on the term itself) form the
  * vocabulary, and every document is scored by the fraction of its
  * token occurrences falling outside it (the signal used to spot
  * domain shift / junk before spending GPU time on a shard).
  *
  * Shape at 100 TB: term counts are map-side-combined into a (doc,
  * term) and then a term aggregate; the top-K cut is a TakeOrdered (K
  * rows to the driver plan, never a global sort); the vocabulary —
  * K rows — broadcasts back against the per-doc term counts, so the
  * corpus-sized side never shuffles for the membership test.
  */
object Vocab {

  /** Top-K corpus vocabulary: (term, cnt), ordered by count desc then
    * term asc — a total order, so the cut is deterministic. */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)

  /** Per-doc OOV occurrence fraction against the top-K vocabulary.
    * @return (id, n_tokens, n_oov, oov_rate); tokenless docs get 0s. */
  def oovRates(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("n"))
    // the vocabulary derives from the SAME (doc, term) counts — one
    // tokenize+explode of the corpus, not two (the corpus-proportional
    // stage must not run twice for one answer)
    val vocab = counts.groupBy("term").agg(sum("n").as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .select(col("term"), lit(1).as("in_vocab"))
    val perDoc = counts
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(idCol)
      .agg(sum("n").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("n")).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }
}
