package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING — the tokenizer-construction step
  * the published pipelines run after sizing the vocabulary (the
  * [[Vocab.coverageCurve]] analysis says how big; this builds it):
  * Sennrich et al.'s greedy pair-merge over word types, re-expressed as
  * iterative exact-count aggregations so the whole fit is relational
  * and oracle-replayable.
  *
  * Algorithm (the published one, made deterministic):
  *   1. collapse the corpus to its WORD-TYPE table `(word, cnt)` —
  *      the one corpus-proportional aggregation in the whole fit;
  *   2. split each word into character symbols plus a dedicated
  *      end-of-word marker `</w>` (so merges can learn word-final
  *      units — the published trick that lets `est</w>` differ from
  *      `est`);
  *   3. per merge step: count adjacent symbol pairs weighted by word
  *      count (overlapping positions each count, the reference
  *      implementation's collections.Counter semantics), pick the
  *      max-count pair with the deterministic `(count desc, left,
  *      right)` tie-break, and merge every occurrence greedily
  *      left-to-right; stop early when no pair reaches `minPairCount`
  *      (merging a pair seen once memorizes, not generalizes).
  *
  * Determinism: counts are exact int64; the tie-break is total; the
  * greedy left-to-right application is a pure fold (see [[mergeOnce]])
  * — so the merge SEQUENCE is a pure function of the word-type table,
  * invariant under row order, partitioning, and duplicate-document
  * layout (spec-pinned by a permutation property).
  *
  * Scale shape at 100 TB: the corpus is touched ONCE (tokenize +
  * word-type count, map-side combinable); every merge round runs on
  * the word-TYPE table — millions of rows where the corpus is
  * billions — as one narrow fold-rewrite plus one map-side-combined
  * pair count plus a 1-row TakeOrdered to the driver (the merge table
  * itself is driver-sized by construction: k rows). The evolving
  * symbols column is `localCheckpoint`ed each round so the plan stays
  * flat across k rounds instead of nesting k lambdas deep. Encoding a
  * corpus with the learned merges ([[pieceCounts]]) broadcasts the
  * encoded word-type table — the corpus-sized side never shuffles.
  *
  * Symbols live in the `[a-z]` + `</w>` alphabet
  * ([[TextAnalysis.wordTokens]] word forms), so no symbol ever
  * contains a space — the invariant the space-joined oracle fold
  * replay relies on.
  */
object Bpe {

  /** End-of-word marker symbol (Sennrich et al.'s `</w>`). */
  val EndOfWord = "</w>"

  /** The corpus collapsed to its word-type table with initial symbol
    * sequences: `(word, cnt, syms)` where `syms` = the word's
    * characters plus [[EndOfWord]]. The ONE corpus-proportional stage
    * of a BPE fit. */
  def wordSymbols(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        concat(
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))),
          array(lit(EndOfWord))).as("syms"))

  /** One greedy left-to-right merge of the adjacent pair `(a, b)` in a
    * symbol array — the BPE application step as a pure fold: walking
    * the symbols, a new symbol `b` arriving when the accumulated tail
    * is `a` replaces that tail with `a+b`, else appends. The fold IS
    * the reference semantics for overlapping runs: in `[a,a,a]` with
    * pair `(a,a)` the leftmost occurrence merges and the freshly
    * merged `aa` does not re-merge with the next `a` this round —
    * positions merge alternately within each maximal run. `get` (not
    * `element_at`) reads the tail so the empty accumulator yields null
    * (falls to append) instead of an ANSI out-of-bounds error. */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(get(acc, size(acc) - 1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent-pair counts over the current word-type symbols, weighted
    * by word count — overlapping positions each count (the reference
    * Counter semantics). Pairs are built as aligned structs inside a
    * `transform` lambda (bound, in-range indices — never a
    * posexplode + `element_at(pos + 1)` against a detached spine). */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) > 1)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("lhs"),
          element_at(col("syms"), i + 1).as("rhs")))).as("pr"))
      .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** The training loop over an existing word-symbol table — shared by
    * the from-scratch fit and continuation training (the loop is
    * Markov on the word table, which is exactly why
    * fit(k + e) ≡ extend(fit(k), e) — spec-pinned and x105-checked). */
  // validated at every public entry point BEFORE the corpus-
  // proportional work runs — a bad argument must fail instantly, not
  // after the 100 TB word-type aggregation (review finding, round 19
  // second pass)
  private def validate(numMerges: Int, minPairCount: Long): Unit = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
  }

  private def trainMerges(words0: DataFrame, numMerges: Int,
                          minPairCount: Long,
                          firstStep: Int): Seq[(Int, String, String, Long)] = {
    var words = words0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = firstStep
    // counting down avoids the `firstStep + numMerges` Int overflow a
    // "train until convergence" Int.MaxValue sentinel would hit
    var remaining = numMerges
    var done = false
    while (remaining > 0 && !done) {
      val top = pairCounts(words)
        .filter(col("pair_count") >= minPairCount)
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1).collect() // 1 row — the merge table is driver-sized
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((step, a, b, c))
        words = words.withColumn("syms", mergeOnce(col("syms"), a, b))
          .localCheckpoint(true) // flat plan: k rounds, not k nested folds
        step += 1
        remaining -= 1
      }
    }
    merges.result()
  }

  /** Train `numMerges` BPE merges over the corpus.
    * @return the merge table `(step, lhs, rhs, pair_count)` — step
    *         1-based in merge order; fewer than `numMerges` rows when
    *         training stops early (no pair reaches `minPairCount`). */
  def fitMerges(docs: DataFrame, textCol: String, numMerges: Int,
                minPairCount: Long = 2L): DataFrame = {
    validate(numMerges, minPairCount)
    val spark = docs.sparkSession
    val rows = trainMerges(wordSymbols(docs, textCol).localCheckpoint(true),
      numMerges, minPairCount, firstStep = 1)
    import spark.implicits._
    rows.toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Replay a learned merge sequence over a word-symbol table —
    * encoding. `merges` is the (driver-sized, k-row) merge list in
    * step order. Narrow: k fold-rewrites, no shuffle. */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.zipWithIndex.foldLeft(words) { case (w, ((a, b), i)) =>
      val merged = w.withColumn("syms", mergeOnce(col("syms"), a, b))
      // checkpoint every few rounds: keeps the lambda nesting shallow
      // without paying a materialization per merge
      if ((i + 1) % 4 == 0) merged.localCheckpoint(true) else merged
    }

  /** Apply a learned tokenizer to a CORPUS: per document, the BPE
    * piece count (the number every mixture/budget operator actually
    * consumes — x60's token budgets, priced in the real tokenizer's
    * units instead of whitespace tokens). The corpus re-tokenizes once
    * (narrow) and joins each word to the BROADCAST encoded word-type
    * table — the corpus-sized side never shuffles; the rollup is
    * map-side combinable. Token-less docs count 0 (evidence of
    * absence, not absent evidence). */
  /** The ONE pricing join (shared by [[pieceCounts]] and
    * [[fertilityCard]] so the two can never diverge on what a piece
    * costs): tokenize the corpus once (narrow), broadcast-join each
    * word to the encoded word-type table, roll up exact int64 masses
    * per `keyCol`. Rows with no words get (0, 0) — evidence of
    * absence, not absent evidence. */
  private def priceWords(docs: DataFrame, keyCol: String, textCol: String,
                         encoded: DataFrame): DataFrame = {
    val pieces = encoded.select(col("word"),
      size(col("syms")).cast("long").as("__pieces"))
    docs.select(col(keyCol),
        explode_outer(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .join(broadcast(pieces), Seq("word"), "left")
      .groupBy(keyCol)
      .agg(coalesce(sum("__pieces"), lit(0L)).as("n_pieces"),
        count(col("word")).as("n_words"))
  }

  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  encoded: DataFrame): DataFrame =
    priceWords(docs, idCol, textCol, encoded)
      .select(col(idCol), col("n_pieces"), col("n_words"))

  /** TOKENIZER FERTILITY card — per group (source/language), pieces
    * per word under the learned tokenizer: the published audit for
    * tokenizer bias (a source whose fertility is 2× the corpus's pays
    * 2× the context budget per word — the signal behind "extend the
    * tokenizer for code/multilingual" decisions, and the reason
    * multilingual papers report fertility per language). One row per
    * group: exact int64 word/piece masses and `fertility` = one
    * correctly rounded division (null when the group has no words —
    * no evidence, the shared null policy). Words the tokenizer never
    * saw still price exactly (the merge replay runs on the TARGET
    * corpus's word types — unseen words just merge less and price
    * high, which is precisely what fertility is for).
    *
    * Scale shape: [[pieceCounts]]'s broadcast pricing join, then one
    * map-side-combined groupBy on the group key. */
  def fertilityCard(docs: DataFrame, groupCol: String, textCol: String,
                    encoded: DataFrame): DataFrame =
    priceWords(docs, groupCol, textCol, encoded)
      .select(col(groupCol), col("n_words"), col("n_pieces"),
        when(col("n_words") > 0,
          col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"))

  // ---------------- persisted tokenizer store ----------------

  def tokenizerMeta(table: String): String = s"${table}_meta"

  /** Persist a trained tokenizer as catalog tables: `table` = the
    * merge table in step order, `table_meta` = (n_merges,
    * min_pair_count) — the COMMIT MARKER, written last.
    *
    * This store deliberately breaks with the six big stores' pattern,
    * and the differences are the point:
    *   - NO buckets: the merge table is k rows — driver-sized by
    *     construction — there is nothing to co-locate; a bucketed
    *     layout would be cargo cult.
    *   - NO ledgered deltas / streamed ingest: every merge conditions
    *     on the FULL previous merge state, so there is no commutative
    *     per-batch delta to ledger — the honest "streamed" form of BPE
    *     training is a refit (the x55 serve-≡-refit adjudication,
    *     answered the other way because the math differs). What a
    *     tokenizer has instead is CONTINUATION training
    *     ([[extendTokenizer]]): resume the merge loop from the stored
    *     sequence, with fit(k+e) ≡ extend(fit(k), e) spec-pinned and
    *     oracle-checked (x105).
    *   - Crash safety is REBUILD, not repair: the meta writes last, a
    *     meta-less store refuses loud everywhere, and the documented
    *     remedy is re-running this method — a BPE fit is k word-type
    *     aggregations (seconds), where an LmScore store is a
    *     corpus-sized count table (hours at 100 TB); paying ledger
    *     machinery to avoid a cheap rebuild would be the wrong trade. */
  def writeTokenizerStore(docs: DataFrame, textCol: String, numMerges: Int,
                          table: String, minPairCount: Long = 2L): Unit = {
    validate(numMerges, minPairCount)
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${tokenizerMeta(table)}`")
    val merges = fitMerges(docs, textCol, numMerges, minPairCount).collect()
    import spark.implicits._
    merges.toSeq.map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .toDF("step", "lhs", "rhs", "pair_count")
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    commitMeta(spark, table, merges.length.toLong, minPairCount)
  }

  private def commitMeta(spark: org.apache.spark.sql.SparkSession,
                         table: String, nMerges: Long,
                         minPairCount: Long): Unit = {
    import spark.implicits._
    // callers already hold the merge count on the driver — no re-count
    // scan of the just-written table (review finding, round 19 second
    // pass)
    Seq((nMerges, minPairCount))
      .toDF("n_merges", "min_pair_count")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(tokenizerMeta(table))
  }

  private def requireTokenizerContract(
      spark: org.apache.spark.sql.SparkSession,
      table: String): org.apache.spark.sql.Row = {
    require(spark.catalog.tableExists(tokenizerMeta(table)),
      s"tokenizer store '$table' has no meta table — a (re)build or " +
        "extension crashed before committing; re-run writeTokenizerStore")
    spark.table(tokenizerMeta(table)).head()
  }

  /** The stored merge sequence in step order — k rows to the driver,
    * the store's whole point (a tokenizer artifact IS driver-sized). */
  def mergesFromStore(spark: org.apache.spark.sql.SparkSession,
                      table: String): Seq[(String, String)] = {
    requireTokenizerContract(spark, table)
    spark.table(table).orderBy("step").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
  }

  /** Encode a corpus's word types with the STORED tokenizer. */
  def encodeAgainstStore(docs: DataFrame, textCol: String,
                         table: String): DataFrame =
    encodeWords(wordSymbols(docs, textCol),
      mergesFromStore(docs.sparkSession, table))

  /** [[pieceCounts]] served from the store — the deployment path. */
  def pieceCountsAgainstStore(docs: DataFrame, idCol: String,
                              textCol: String, table: String): DataFrame =
    pieceCounts(docs, idCol, textCol, encodeAgainstStore(docs, textCol, table))

  /** CONTINUATION training: replay the stored sequence over the
    * corpus's word types, run `extraMerges` more rounds from that
    * state, and commit the extended sequence (drop meta → rewrite →
    * meta last; a crash in between leaves a loudly-refusing store —
    * see [[writeTokenizerStore]] for why rebuild beats a ledger here).
    * Over the SAME corpus this equals a deeper one-shot fit (the loop
    * is Markov on the word table); over a NEW corpus it is domain
    * continuation — the published "extend the tokenizer for code/
    * multilingual" move. */
  def extendTokenizer(docs: DataFrame, textCol: String, extraMerges: Int,
                      table: String): Unit = {
    val spark = docs.sparkSession
    val meta = requireTokenizerContract(spark, table)
    val minPairCount = meta.getAs[Long]("min_pair_count")
    validate(extraMerges, minPairCount)
    val stored = spark.table(table).orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_count"))).toSeq
    val words = encodeWords(wordSymbols(docs, textCol),
      stored.map(t => (t._2, t._3))).localCheckpoint(true)
    val more = trainMerges(words, extraMerges, minPairCount,
      firstStep = stored.size + 1)
    spark.sql(s"DROP TABLE IF EXISTS `${tokenizerMeta(table)}`")
    import spark.implicits._
    (stored ++ more).toDF("step", "lhs", "rhs", "pair_count")
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    commitMeta(spark, table, (stored.size + more.size).toLong, minPairCount)
  }
}
