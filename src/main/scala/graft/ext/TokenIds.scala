package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-ID materialization — the LOADER-facing end of the pipeline:
  * everything upstream (dedup, mixing, packing) manipulates text and
  * counts, but what a training loader actually ingests is the packed
  * window stream of PIECE IDS under the shipped tokenizer. This module
  * closes that gap: assign every vocabulary piece a dense id, encode
  * each document as its id stream, and pivot the packed layout's window
  * manifest ([[Packing.windowManifest]]) so each (window, segment) row
  * carries the segment's id slice.
  *
  * ID assignment: dense 0..|V|−1 in piece sort order — a pure function
  * of the vocabulary CONTENT (no hash, no insertion order), so the
  * assignment is reproducible across engines and replayable by the
  * oracle as one `row_number() OVER (ORDER BY piece)`. The vocabulary
  * is driver-sized by construction (the [[Bpe]] store argument: the
  * alphabet plus exactly one new symbol per merge), so the id table
  * collects to the driver and rides each encode as a
  * [[graft.functions.PieceIdLookup]] reference object — plan size O(1)
  * in |V|, one vocabulary copy per executor via the task binary.
  *
  * Scale shape at 100 TB: the corpus tokenizes ONCE (narrow
  * posexplode); each word joins the BROADCAST encoded word-type table
  * (the [[Bpe.pieceCounts]] pricing join — corpus text never shuffles);
  * the per-document id assembly is ONE hash exchange keyed by the doc
  * id (the rollup that builds each document's id array — output-sized,
  * the stream itself); the packed layout is [[Packing]]'s distributed
  * prefix sum; and the final slice join is doc-id-keyed equi between
  * the manifest and the id stream (both already doc-keyed). No driver
  * state beyond the tokenizer artifact, no RNG, no UDFs.
  */
object TokenIds {

  /** Dense piece→id table over an encoded word-type table's vocabulary:
    * ids 0..|V|−1 in piece sort order. Driver-sized by construction
    * (see class doc). */
  def pieceIds(encoded: DataFrame): Map[String, Long] =
    encoded.select(explode(col("syms")).as("piece")).distinct()
      .orderBy("piece").collect().iterator.map(_.getString(0))
      .zipWithIndex.map { case (p, i) => p -> i.toLong }.toMap

  /** Per-document token-id streams: `(id, n_tokens, ids)` with `ids`
    * the document's pieces in word order mapped through `ids0` —
    * `concat(per-word pieces)` in document order, the x103 encoding
    * made loader-consumable. Wordless (and null-text) documents carry
    * the empty stream, not a null (the engine-wide null policy — a
    * layout must keep every document).
    *
    * CONTRACT: `encoded` must cover every word of `docs` (guaranteed on
    * the [[windowTokenIds]] path, where the word-type table is computed
    * FROM `docs` — [[Bpe.encodeAgainstStore]] encodes the target
    * corpus's own types, so unseen words still encode, just into more
    * pieces). */
  def docTokenIds(docs: DataFrame, idCol: String, textCol: String,
                  encoded: DataFrame, ids0: Map[String, Long]): DataFrame = {
    require(ids0.nonEmpty, "docTokenIds needs a non-empty id table")
    val wordIds = encoded.select(col("word"),
      transform(col("syms"),
        s => graft.functions.PieceIdLookup(s, ids0)).as("__wids"))
    docs
      .select(col(idCol),
        posexplode_outer(TextAnalysis.wordTokens(col(textCol)))
          .as(Seq("__p", "word")))
      .join(broadcast(wordIds), Seq("word"), "left")
      .groupBy(idCol)
      // collect_list skips nulls, so the explode_outer spine row of a
      // wordless doc contributes nothing and the doc keeps ids = []
      .agg(array_sort(collect_list(when(col("word").isNotNull,
        struct(col("__p").as("p"),
          coalesce(col("__wids"), array().cast("array<bigint>"))
            .as("w"))))).as("__s"))
      .select(col(idCol),
        flatten(transform(col("__s"), s => s("w"))).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .select(col(idCol), col("n_tokens"), col("ids"))
  }

  /** The TRAINING STREAM: [[Packing.windowManifest]] over the id-priced
    * packed layout, each (window, segment) row carrying its id slice —
    * `(bin, id, bin_offset, seg_len, is_head, is_tail, ids)`, the
    * artifact a batch loader ingests directly. Per document,
    * `concat(segments in bin order) = the document's full id stream`
    * (TokenIdsSpec pins the round-trip to the x103 encoding).
    *
    * The tokenizer comes from the persisted store `table`
    * ([[Bpe.writeTokenizerStore]]), so the stream prices in the SAME
    * units the budget/packing plan committed to. */
  def windowTokenIds(docs: DataFrame, idCol: String, textCol: String,
                     table: String, windowTokens: Int): DataFrame =
    streamFromWordPieces(docs, idCol, textCol,
      // materialized at the word-type grain (the unigram path already
      // does this in unigramWordPieces): streamFromWordPieces consumes
      // the word→pieces table twice — the pieceIds driver collect and
      // the broadcast pricing side — and without the cut the whole
      // tokenize + k-merge-fold encode lineage runs twice (r20 ADVICE)
      Bpe.encodeAgainstStore(docs, textCol, table).localCheckpoint(true),
      windowTokens)

  /** The default out-of-coverage piece (SentencePiece's `unk_id`
    * convention) — outside the `[a-z]` word-token alphabet, so it can
    * never collide with a real piece. */
  val Unk = "<unk>"

  /** Word→pieces under the STORED UNIGRAM tokenizer with the x131
    * coverage completion, rendered for a LOADER (which, unlike a
    * pricing card, cannot *report* a gap — every word must emit
    * tokens): DP-segmentable words take their Viterbi pieces;
    * DP-failures whose characters sit inside `fallbackChars` take the
    * per-character floor; words outside even the floor emit ONE [[Unk]]
    * piece (the published unk_id move — visible in the stream, never
    * silently dropped). */
  def unigramWordPieces(docs: DataFrame, textCol: String, table: String,
                        fallbackChars: Set[String]): DataFrame = {
    require(fallbackChars.nonEmpty, "fallbackChars must be non-empty")
    fallbackChars.foreach(c => require(c.length == 1,
      s"fallbackChars must be single characters, got '$c'"))
    val (probs, maxPieceLen) = Unigram.servedProbs(docs.sparkSession, table)
    val cls = "^[" + fallbackChars.toSeq.sorted
      .map(java.util.regex.Pattern.quote).mkString + "]+$"
    val words = docs
      .select(explode(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .distinct().withColumn("cnt", lit(1L))
    // MATERIALIZED at the word-type grain (the grain every pricing
    // path already materializes — Bpe.encodeWords checkpoints its
    // merge folds for the same reason): without the cut, downstream
    // projections COLLAPSE the Viterbi DP + backwalk expression into
    // their own trees (the `pieces` column inlines wherever it is
    // referenced), and the first explode over it hands codegen a
    // multi-megabyte generator — measured 96 s of driver-side
    // plan/compile time on a 33-word table vs 0.6 s materialized.
    Unigram.viterbiSegments(words, probs, maxPieceLen)
      .select(col("word"),
        when(col("pieces").isNotNull, col("pieces"))
          .when(col("word").rlike(cls),
            transform(sequence(lit(1), length(col("word"))),
              i => col("word").substr(i, lit(1))))
          .otherwise(array(lit(Unk))).as("syms"))
      .localCheckpoint(true)
  }

  /** [[windowTokenIds]] in the UNIGRAM tokenizer's units — the same id
    * stream served from a unigram store through
    * [[unigramWordPieces]]' coverage-complete rendering (the id path
    * is tokenizer-agnostic: anything that maps word → pieces feeds
    * it). */
  def windowTokenIdsUnigram(docs: DataFrame, idCol: String,
                            textCol: String, table: String,
                            windowTokens: Int,
                            fallbackChars: Set[String] =
                              ('a' to 'z').map(_.toString).toSet): DataFrame =
    streamFromWordPieces(docs, idCol, textCol,
      unigramWordPieces(docs, textCol, table, fallbackChars), windowTokens)

  /** The shared stream assembly over ANY word→pieces table. */
  private def streamFromWordPieces(docs: DataFrame, idCol: String,
                                   textCol: String, wordPieces: DataFrame,
                                   windowTokens: Int): DataFrame = {
    require(windowTokens > 0,
      s"windowTokens must be positive, got $windowTokens")
    val ids = pieceIds(wordPieces)
    // materialized once: the packing prefix sum AND the slice join both
    // consume the id streams — without this the tokenize + broadcast
    // join + per-doc rollup lineage would run twice
    val doc = docTokenIds(docs, idCol, textCol, wordPieces, ids)
      .localCheckpoint(true)
    val packed = Packing.packCountedSequences(
      doc.select(col(idCol), col("n_tokens")), idCol, "n_tokens",
      windowTokens)
    val w = lit(windowTokens.toLong)
    // manifestRows retains the layout offset, so the only join here is
    // the one doc-keyed equi against the id streams
    Packing.manifestRows(packed, idCol, windowTokens)
      .join(doc.select(col(idCol), col("ids")), Seq(idCol))
      .withColumn("ids", slice(col("ids"),
        (col("bin") * w + col("bin_offset") - col("offset") + 1).cast("int"),
        col("seg_len").cast("int")))
      .select(col("bin"), col(idCol), col("bin_offset"), col("seg_len"),
        col("is_head"), col("is_tail"), col("ids"))
  }
}
