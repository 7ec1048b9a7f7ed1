package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share any
  * word n-gram with a held-out evaluation set — the standard pre-training
  * hygiene sweep (n-gram-overlap decontamination as published for GPT-3 /
  * The Pile / FineWeb).
  *
  * Shape at 100 TB: the split predicate partitions the corpus FIRST, so
  * each side is tokenized exactly once; gram fingerprints come from the
  * native codegen'd [[graft.functions.ShingleMd5]] (one fused
  * digest loop per document — no gram string is ever materialized, no
  * interpreted HOF lambda), reduce to DISTINCT 8-byte longs per side,
  * and meet in ONE left hash equi-join followed by ONE count-aggregate
  * on the train doc id (total and shared grams counted in the same
  * pass). No cartesian, no broadcast of the (large) eval gram set; the
  * only shuffles are on gram-hash and doc-id keys.
  */
object Decontaminate {

  // tokenization is PROJECTED before the shingle expression — inlining
  // it would re-run the regex per output element under a HOF, and even
  // under the native expression the projection keeps the plan readable
  private def grams(docs: DataFrame, textCol: String, n: Int,
                    extraCols: Column*): DataFrame =
    docs.select(extraCols :+ Ngrams.normTokens(col(textCol)).as("__toks"): _*)
      .select(extraCols :+
        explode(graft.functions.ShingleMd5(col("__toks"), n)).as("gram_fp"): _*)
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
    val trainGrams = grams(docs.filter(!evalPred), textCol, n, col(idCol))
    val evalGrams = grams(docs.filter(evalPred), textCol, n)
      .withColumn("__hit", lit(1))
    trainGrams
      .join(evalGrams, Seq("gram_fp"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_shared"))
      .filter(col("n_shared") > 0)
      .select(col(idCol), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }
}
