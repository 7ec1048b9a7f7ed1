package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document salient terms by TF/DF rank — the integer-exact core of
  * TF-IDF keyword extraction. Ranking is (tf DESC, df ASC, term ASC):
  * a term beats another iff it is more frequent in the doc, or equally
  * frequent but rarer in the corpus — the same order `tf·log(N/df)`
  * induces at equal tf, without putting a transcendental (whose last
  * ulp differs across libm implementations) into a checked result.
  * Callers who want the float score can add `tf * log(N/df)` on top;
  * the integer rank is the portable contract.
  *
  * Shape at 100 TB: one shuffle on (doc, term) for tf, one on term for
  * df (map-side-combined counts, never text beyond the term itself),
  * a hash join tf⋈df on the term key, and the per-doc top-k window —
  * partitioned by doc id, so millions of small partitions, no
  * single-partition Exchange anywhere.
  */
object TopTerms {

  /** @return (id, rank, term, tf, df) — `k` rows per doc with at least
    *         one alphabetic token. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val ranked = tf.join(df, "term")
      .withColumn("rank",
        row_number().over(Window.partitionBy(idCol)
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
    ranked.filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }
}
