package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level passage dedup: split every document into fixed-size
  * token chunks ("passages" — the no-newline analogue of the classic
  * line/paragraph dedup used on web crawls), keep only the globally
  * FIRST occurrence of each distinct passage, and reassemble the
  * surviving text per document. First = smallest (doc_id, passage_idx)
  * — a total, content-independent order, so the result is deterministic
  * under any physical execution.
  *
  * Shape at 100 TB: passages shuffle once on their 16-byte md5
  * fingerprint (never the text) for the first-wins rank, then once on
  * doc id for reassembly. The reassembly aggregates
  * `array_sort(collect_list(struct(idx, passage)))` — collect order is
  * nondeterministic but idx is unique per doc, so the sort restores a
  * total order before the join. Per-doc passage counts are bounded
  * (docs/chunkTokens), so no group is skew-prone.
  */
object PassageDedup {

  /** @return (id, n_passages, n_dropped, text_kept) — one row per doc,
    *         `text_kept` the space-joined surviving passages in
    *         original order (empty string when every passage was a
    *         duplicate of an earlier doc's). */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int): DataFrame = {
    // tokens projected first: a HOF lambda re-evaluates free
    // subexpressions per element (see Decontaminate.grams)
    val passages = docs
      .select(col(idCol), Ngrams.normTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(Ngrams.passages(col("__toks"), chunkTokens))
          .as(Seq("idx", "passage")))
      .withColumn("fp", md5(col("passage")))
    val firstWins = passages.withColumn("rn",
      row_number().over(Window.partitionBy("fp").orderBy(col(idCol), col("idx"))))
    firstWins.groupBy(idCol)
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") === 1,
              struct(col("idx"), col("passage"))))),
            s => s.getField("passage")),
          " ").as("text_kept"))
  }
}
