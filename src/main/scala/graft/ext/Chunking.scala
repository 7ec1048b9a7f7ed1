package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window chunking: split each document's token sequence into
  * fixed-size training windows with overlap (window `win`, stride
  * `stride` ≤ `win`, so consecutive chunks share `win − stride`
  * tokens). This is the context-window materialization step for
  * trainers that want overlapping examples; [[Ngrams.passages]] is the
  * degenerate `stride == win` case used by passage dedup, and
  * [[Packing]] is the complementary operator that packs SHORT docs up
  * to a context length rather than splitting long ones down.
  *
  * Window rule (total and engine-portable): starts are
  * `0, stride, 2·stride, …` up to and including the FIRST start whose
  * window reaches the end of the document (`start + win ≥ n`), so a
  * non-empty doc yields `1 + ceil(max(0, n − win) / stride)` chunks
  * and only the last may be short (`n_toks = min(win, n − start)`).
  * Stopping at the first end-reaching window (rather than while
  * `start < n`) matters when `stride < win`: later starts would emit
  * windows whose content is FULLY CONTAINED in the last full window —
  * pure duplicate training text. Empty docs yield no chunks.
  *
  * Scale: tokenize once, then a narrow per-row `explode` — output rows
  * ≈ tokens/stride, no shuffle anywhere in the operator (the only
  * exchange a caller sees is whatever THEY do with the chunks). The
  * emitted `chunk_fp` (md5 of the space-joined window) keeps document
  * text off the wire for downstream dedup/grouping, same convention as
  * [[PassageDedup]].
  *
  * Reference ties: the reference stores one row per (symbol, day)
  * (`dags/sql/4. merge_core.sql:83-84`'s MERGE key); chunking is the
  * document-corpus analogue
  * of that unit-of-work normalization for trainers.
  */
object Chunking {

  /** Per-chunk rows `(id, chunk_idx, start_tok, n_toks, chunk_fp)`. */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    // two staged projections: `__toks` is referenced twice by the upper
    // one (passthrough + size), so CollapseProject keeps the non-cheap
    // tokenization as a real column instead of inlining the regex into
    // every consumer; the empty-doc guard lives INSIDE the generator
    // (`when` → null → explode emits nothing) rather than a Filter,
    // which predicate pushdown would rewrite into a second tokenize
    // below the projection. Net: exactly one `normTokens` in the plan
    // (PlanSpec pins this).
    val toks = df.select(col(idCol),
        Ngrams.normTokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        size(col("__toks")).cast("long").as("__n"))
    toks
      // integer chunk count: 1 + ceil(max(0, n − win) / stride), the
      // ceil via (x + stride − 1) DIV stride — stays in exact int64,
      // never a double division. The formula assumes stride <= win
      // (enforced by the require above): with stride > win it would
      // emit a final start >= n, i.e. an empty/negative-length chunk.
      .withColumn("chunk_idx",
        explode(when(col("__n") > 0,
          sequence(lit(0L),
            expr(s"(greatest(__n - $win, 0L) + ${stride - 1}) DIV $stride")))))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        least(lit(win.toLong), col("__n") - col("start_tok")).as("n_toks"),
        md5(array_join(slice(col("__toks"),
          (col("start_tok") + 1).cast("int"), lit(win)), " ")).as("chunk_fp"))
  }
}
