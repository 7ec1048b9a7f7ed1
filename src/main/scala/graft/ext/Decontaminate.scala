package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share any
  * word n-gram with a held-out evaluation set — the standard pre-training
  * hygiene sweep (n-gram-overlap decontamination as published for GPT-3 /
  * The Pile / FineWeb).
  *
  * Shape at 100 TB: both sides explode to DISTINCT (doc, gram-md5) pairs
  * — 16-byte fingerprints, never gram text — and meet in a hash
  * equi-join on the fingerprint, followed by a count-aggregate on the
  * train doc id. No cartesian, no broadcast of the (large) eval gram
  * set, and the gram explosion is map-side until the distinct. The
  * only shuffles are on gram-hash and doc-id keys.
  */
object Decontaminate {

  /** Per-doc distinct gram fingerprints: (id, gram_fp). */
  private def docGrams(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol),
        explode(Ngrams.ngrams(Ngrams.normTokens(col(textCol)), n)).as("gram"))
      .select(col(idCol), md5(col("gram")).as("gram_fp"))
      .distinct()

  /** Training docs contaminated by the eval split, with overlap counts.
    *
    * @param evalPred predicate over `docs` columns selecting the eval
    *                 split (e.g. `col("doc_id") % 10 === 0`); train =
    *                 the complement.
    * @return (id, n_grams, n_shared, contamination) — one row per
    *         contaminated train doc; `contamination` = n_shared/n_grams.
    */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   evalPred: Column, n: Int): DataFrame = {
    val grams = docGrams(docs, idCol, textCol, n)
    val evalGrams = docs.filter(evalPred)
      .select(col(idCol), explode(Ngrams.ngrams(Ngrams.normTokens(col(textCol)), n)).as("gram"))
      .select(md5(col("gram")).as("gram_fp"))
      .distinct()
    val train = docs.filter(!evalPred).select(col(idCol))
    val trainGrams = grams.join(train, Seq(idCol))
    val totals = trainGrams.groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"))
    val shared = trainGrams
      .join(evalGrams, Seq("gram_fp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
    shared.join(totals, Seq(idCol))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }
}
