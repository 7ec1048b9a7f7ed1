package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training — the SentencePiece counterpart of
  * the BPE family ([[Bpe]]): seed a piece vocabulary from substring
  * counts, segment every word type by maximum-probability Viterbi
  * under the current piece distribution, re-estimate piece
  * probabilities from usage, iterate, and prune unused pieces (Kudo
  * 2018's unigram model, in its HARD-EM / Viterbi variant).
  *
  * DETERMINISM DECISIONS, per the engine's no-transcendentals
  * discipline ([[LmScore]]'s "no logs, nothing engine-dependent"):
  *
  *   - Probabilities are QUANTIZED RATIONALS on the 2⁻²⁰ grid:
  *     `q(piece) = max(1, (cnt·2²⁰) div total) / 2²⁰` — the integer
  *     division is exact on both engines and the final division by a
  *     power of two is an exact double. The max(1,·) floor keeps every
  *     vocabulary piece usable (a zero-probability piece would zero
  *     every segmentation through it).
  *   - Viterbi maximizes the PRODUCT of piece probabilities directly —
  *     published trainers sum logs, but `log` is not correctly-rounded
  *     IEEE and diverges across engines in the last ulp; double
  *     multiplication IS correctly rounded, and the DP multiplies in
  *     one fixed left-to-right order, so both engines land on the
  *     identical double at every cell.
  *   - Ties break deterministically: (max product, FEWEST pieces,
  *     LONGEST last piece), realized as one ascending sort on the
  *     state struct `(negs = −product, k, b)` — no reliance on either
  *     engine's `min_by`/argmax tie policy.
  *   - Hard-EM over soft-EM, deliberately: the published E-step's
  *     forward-backward expectations are sums of float products in
  *     data-dependent order (engine-hashable only through brittle
  *     quantization); Viterbi counts are exact integers. Same
  *     fixed-point family, bit-exact replay. Pruning drops pieces with
  *     ZERO final-round usage (the x103 used-pieces discipline) rather
  *     than Kudo's likelihood-loss ranking, for the same reason.
  *
  * Scale shape (the x102 discipline): the corpus collapses ONCE to its
  * word-TYPE table — every fold below runs per word type, never per
  * corpus occurrence; the vocabulary is k-row (collected per round —
  * the accepted merge-table pattern) and enters the DP as ONE
  * reference-object expression per lookup site
  * ([[graft.functions.VocabProbLookup]] — plan size O(1) in |V|, the
  * table torrent-broadcast with the task binary; a `typedlit` map
  * literal would grow the plan O(|V|) per site and fail codegen at
  * production vocabulary sizes); piece-usage re-estimation is one
  * map-side-combined
  * explode + groupBy per round. Pricing joins the scored corpus to its
  * priced word types BROADCAST — corpus text never shuffles.
  */
object Unigram {

  /** Probability quantizer: 2²⁰ (the engine-wide fractional grid). */
  val Scale = 1048576L

  /** Corpus word-TYPE table `(word, cnt)` over lowercase alphabetic
    * tokens (the [[Bpe.wordSymbols]] token grain, minus the
    * end-of-word marker — unigram pieces are plain substrings). */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Occurrence-weighted substring counts up to `maxPieceLen` — the
    * seed statistics (SentencePiece seeds from suffix-array substring
    * counts; this is the same quantity for bounded piece length). */
  private def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - i + 1)), l =>
            col("word").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("cnt"))

  /** Seed vocabulary: ALL single characters (the coverage floor —
    * every corpus word stays segmentable) plus the top `vocabSize`
    * multi-character substrings by (count desc, piece asc). */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
                vocabSize: Int): DataFrame = {
    val counts = seedCounts(words, maxPieceLen)
    counts.filter(length(col("piece")) === 1)
      .unionByName(counts.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(vocabSize))
  }

  /** `(cnt, total)` → the quantized probability as an exact double:
    * `max(1, cnt·2²⁰ div total) / 2²⁰`. */
  private def qProb(cnt: Column, total: Column): Column = {
    val prod = cnt.cast("decimal(38,0)") * lit(Scale)
    val den = total.cast("decimal(38,0)")
    greatest(lit(1L), ((prod - prod % den) / den).cast("long"))
      .cast("double") / lit(Scale.toDouble)
  }

  /** Sentinel `negs` for "prefix unreachable": every REAL state's negs
    * is negative (−product of probabilities in (0,1]), so +1.0 sorts
    * AFTER all real candidates and a `least()` only yields it when no
    * segmentation exists. A sentinel instead of NULL, deliberately:
    * aggregate()'s accumulator type is derived from its (constant-
    * folded) init expression, so a nullable-by-expression struct field
    * collapses to non-nullable at the physical stage and a runtime
    * NULL written into it reads back as 0.0 under codegen —
    * plan-DEPENDENT silent garbage (UnigramSpec's foreign-word and
    * distinct-input cases pin this). With the sentinel the state
    * struct is null-free end to end and no nullability metadata can
    * bite. */
  private val Unreachable = 1.0

  /** The Viterbi DP state array for `word` under the vocabulary served
    * by `prob` (key → probability, NULL on miss — the
    * [[graft.functions.VocabProbLookup]] reference-object expression:
    * one plan node per lookup SITE regardless of |V|, where a
    * `typedlit` map literal would embed 2·|V| nodes per site and blow
    * the plan at production vocabulary sizes; PlanSpec pins the
    * independence): element p+1 = best state for the prefix of length
    * p, as `(negs = −bestProduct, k = pieces, b = last-piece start)`;
    * negs = [[Unreachable]] where no segmentation exists. One
    * `aggregate` fold over positions; the ≤ maxPieceLen last-piece
    * candidates are UNROLLED in Scala (an `array(...)` of expressions,
    * NOT an inner `transform` lambda over `acc` — nested-HOF capture of
    * the outer fold's accumulator is a second plan-dependent hazard),
    * decided by one `least()` (ascending struct order IS the
    * tie-break). */
  private def viterbiState(word: Column, prob: Column => Column,
                           maxPieceLen: Int): Column = {
    val sentinel = struct(lit(Unreachable).as("negs"),
      lit(0).as("k"), lit(-1).as("b"))
    aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(-1.0).as("negs"), lit(0).as("k"), lit(-1).as("b"))),
      (acc, i) => {
        // candidate with last piece of length d: start jj = i-d+1 >= 1
        val cands = (1 to maxPieceLen).map { d =>
          val jj = i - (d - 1)
          // try_element_at: jj can fall below 1 for short prefixes, and
          // ANSI element_at would throw before the guard is consulted
          val prev = try_element_at(acc, jj)
          val p = prob(word.substr(jj, lit(d)))
          when(jj < 1 || prev("negs") >= Unreachable || p.isNull, sentinel)
            .otherwise(struct((prev("negs") * p).as("negs"),
              (prev("k") + 1).as("k"), (jj - 1).as("b")))
        }
        concat(acc, array(least(cands: _*)))
      })
  }

  /** Per-word-type Viterbi results under a piece-probability map:
    * `(word, cnt, n_pieces, pieces)` — `pieces` in FORWARD word
    * order (concat(pieces) = word); `n_pieces`/`pieces` NULL when
    * the word cannot be segmented (an unseen character outside the
    * vocabulary's coverage — impossible for the training corpus by the
    * seed's char floor, the honest verdict for foreign words). */
  def viterbiSegments(words: DataFrame, probs: Map[String, Double],
                      maxPieceLen: Int): DataFrame = {
    require(probs.nonEmpty, "viterbiSegments needs a non-empty vocabulary")
    val pm: Column => Column =
      key => graft.functions.VocabProbLookup(key, probs)
    val n = length(col("word"))
    val staged = words
      .withColumn("__st", viterbiState(col("word"), pm, maxPieceLen))
      .withColumn("__ok",
        element_at(col("__st"), n + 1)("negs") < Unreachable)
    val back = aggregate(
      sequence(lit(1), n),
      struct(n.as("pos"), array().cast("array<string>").as("ps")),
      (acc, _) => {
        val b = element_at(col("__st"), acc("pos") + 1)("b")
        when(acc("pos") <= 0, acc)
          .otherwise(struct(b.as("pos"),
            concat(array(col("word").substr(b + 1, acc("pos") - b)),
              acc("ps")).as("ps")))
      })
    staged.select(col("word"), col("cnt"),
      when(col("__ok"),
        element_at(col("__st"), n + 1)("k").cast("long")).as("n_pieces"),
      when(col("__ok"), back("ps")).as("pieces"))
  }

  /** The hard-EM loop: `rounds` × (Viterbi segment under the current
    * quantized probabilities + usage recount). Markov on
    * (word table, vocab counts) — which is what makes the persisted
    * store's CONTINUATION training exact: `extend(fit(r), e) ≡
    * fit(r+e)` over the same corpus. */
  private def emRounds(words: DataFrame, vocab0: DataFrame, rounds: Int,
                       maxPieceLen: Int): DataFrame = {
    var vocab = vocab0
    for (_ <- 1 to rounds) {
      val probs = withProbs(vocab).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      vocab = viterbiSegments(words, probs, maxPieceLen)
        .filter(col("pieces").isNotNull)
        .select(col("cnt"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("cnt"))
    }
    vocab
  }

  /** Train the tokenizer: seed → `rounds` × (Viterbi segment +
    * re-estimate) → prune to the pieces the final round actually used.
    * @return the vocabulary `(piece, cnt, prob)` — usage counts of the
    *         final round and their quantized probabilities. */
  def fit(docs: DataFrame, textCol: String, vocabSize: Int,
          maxPieceLen: Int, rounds: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = wordTypes(docs, textCol).localCheckpoint(true)
    withProbs(emRounds(words, seedVocab(words, maxPieceLen, vocabSize),
      rounds, maxPieceLen))
  }

  // ---------------------------------------------------------------------
  // Persisted unigram tokenizer — the [[Bpe.writeTokenizerStore]] shape:
  // a tokenizer artifact IS driver-sized (a k-row vocabulary), so the
  // store is a plain catalog table with the 1-row meta as the COMMIT
  // MARKER (dropped first, written last; meta-less stores refuse loud;
  // crash recovery is a documented REBUILD). No streamed ingest, by the
  // same argument as BPE: every EM round conditions on the full prior
  // vocabulary, no commutative delta exists — CONTINUATION training is
  // the honest incremental form, and it is EXACT (the loop is Markov on
  // the word table + vocab counts).
  // ---------------------------------------------------------------------

  /** Name of the 1-row meta next to a unigram store:
    * `(vocab_size, max_piece_len, rounds, q_scale)`. */
  def tokenizerMeta(table: String): String = s"${table}_meta"

  private def commitMeta(spark: org.apache.spark.sql.SparkSession,
                         table: String, vocabSize: Int, maxPieceLen: Int,
                         rounds: Int): Unit = {
    import spark.implicits._
    Seq((vocabSize, maxPieceLen, rounds, Scale))
      .toDF("vocab_size", "max_piece_len", "rounds", "q_scale")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(tokenizerMeta(table))
  }

  private def requireContract(spark: org.apache.spark.sql.SparkSession,
                              table: String): org.apache.spark.sql.Row = {
    require(spark.catalog.tableExists(tokenizerMeta(table)),
      s"unigram store '$table' has no meta table — a (re)build or " +
        "extension crashed before committing; re-run writeUnigramStore")
    val m = spark.table(tokenizerMeta(table)).head()
    require(m.getAs[Long]("q_scale") == Scale,
      s"unigram store '$table' was built with quantizer scale " +
        s"${m.getAs[Long]("q_scale")}, this engine serves at $Scale — " +
        "rebuild the store")
    m
  }

  /** Fit and persist the vocabulary counts as catalog table `table`
    * (piece, cnt); meta committed LAST. */
  def writeUnigramStore(docs: DataFrame, textCol: String, vocabSize: Int,
                        maxPieceLen: Int, rounds: Int,
                        table: String): Unit = {
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${tokenizerMeta(table)}`")
    fit(docs, textCol, vocabSize, maxPieceLen, rounds)
      .select(col("piece"), col("cnt"))
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    commitMeta(spark, table, vocabSize, maxPieceLen, rounds)
  }

  /** The stored vocabulary served with its quantized probabilities —
    * bit-identical to [[fit]]'s return (one oracle, two plan shapes:
    * the x105 precedent). */
  def serveVocab(spark: org.apache.spark.sql.SparkSession,
                 table: String): DataFrame = {
    requireContract(spark, table)
    withProbs(spark.table(table).select(col("piece"), col("cnt")))
  }

  /** [[pieceCounts]] served from the store — the deployment path
    * (probabilities and the piece-length bound come FROM the committed
    * meta, so a caller cannot price under mismatched parameters). */
  def pieceCountsAgainstStore(docs: DataFrame, idCol: String,
                              textCol: String, table: String): DataFrame = {
    val (probs, maxPieceLen) = servedProbs(docs.sparkSession, table)
    pieceCounts(docs, idCol, textCol, probs, maxPieceLen)
  }

  /** The stored vocabulary's quantized probabilities and piece-length
    * bound served under the meta contract — the driver-sized artifact
    * every store-serving composition starts from (pricing, fertility,
    * the [[TokenIds]] id stream). One contract read: withProbs over
    * the raw table, not [[serveVocab]] (which would re-run
    * requireContract and re-read the meta). */
  def servedProbs(spark: org.apache.spark.sql.SparkSession,
                  table: String): (Map[String, Double], Int) = {
    val meta = requireContract(spark, table)
    val probs = withProbs(spark.table(table).select(col("piece"), col("cnt")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    (probs, meta.getAs[Int]("max_piece_len"))
  }

  /** Per-group unigram FERTILITY card — [[Bpe.fertilityCard]]'s twin
    * (pieces per word, the published tokenizer-bias audit), with the
    * unigram-specific honesty column: BPE prices every word as far as
    * its merges reach, but a Viterbi segmentation simply does not
    * exist for words with out-of-coverage characters — those count in
    * `n_unpriced` and the fertility divides over PRICED words only.
    * Same scale shape as pricing: word types priced once by the DP,
    * broadcast join back, one map-side-combined rollup. */
  def fertilityCard(docs: DataFrame, groupCol: String, textCol: String,
                    probs: Map[String, Double],
                    maxPieceLen: Int): DataFrame = {
    val priced = pricedWordTypes(docs, textCol, probs, maxPieceLen)
    docs.select(col(groupCol),
        explode_outer(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .join(broadcast(priced), Seq("word"), "left")
      .groupBy(groupCol)
      .agg(count(col("word")).as("n_words"),
        sum(when(col("word").isNotNull && col("n_pieces").isNotNull, 1L)
          .otherwise(0L)).as("n_priced"),
        sum(coalesce(col("n_pieces"), lit(0L))).as("n_pieces"),
        sum(when(col("word").isNotNull && col("n_pieces").isNull, 1L)
          .otherwise(0L)).as("n_unpriced"))
      .select(col(groupCol), col("n_words"), col("n_priced"),
        col("n_pieces"), col("n_unpriced"),
        when(col("n_priced") > 0,
          col("n_pieces").cast("double") / col("n_priced").cast("double"))
          .as("fertility"))
  }

  /** CONTINUATION training: run `extraRounds` more hard-EM rounds from
    * the stored vocabulary over `docs`' word types and commit the
    * extended store (drop meta → rewrite → meta last). Over the SAME
    * corpus this equals a deeper one-shot fit (the loop is Markov);
    * over a NEW corpus it is domain continuation. */
  /** @return the number of word TYPES the continuation could not
    *         segment (characters outside the stored vocabulary's
    *         coverage) — they contribute nothing to any EM round, and
    *         a domain continuation where this is large needs a refit
    *         with a re-seeded vocabulary instead (the no-silent-drop
    *         policy: training reports its dropped mass the way
    *         [[pieceCounts]] reports n_unpriced). */
  def extendUnigram(docs: DataFrame, textCol: String, extraRounds: Int,
                    table: String): Long = {
    require(extraRounds >= 1, s"extraRounds must be >= 1, got $extraRounds")
    val spark = docs.sparkSession
    val meta = requireContract(spark, table)
    val maxPieceLen = meta.getAs[Int]("max_piece_len")
    val vocab0 = spark.table(table).select(col("piece"), col("cnt"))
      .localCheckpoint(true)
    val words = wordTypes(docs, textCol).localCheckpoint(true)
    val probs0 = withProbs(vocab0).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val dropped = viterbiSegments(words, probs0, maxPieceLen)
      .filter(col("pieces").isNull).count()
    val extended = emRounds(words, vocab0, extraRounds, maxPieceLen)
      .localCheckpoint(true)
    spark.sql(s"DROP TABLE IF EXISTS `${tokenizerMeta(table)}`")
    extended.write.mode("overwrite").format("parquet").saveAsTable(table)
    commitMeta(spark, table, meta.getAs[Int]("vocab_size"), maxPieceLen,
      meta.getAs[Int]("rounds") + extraRounds)
    dropped
  }

  /** Attach the quantized probability column to a `(piece, cnt)`
    * table (total = Σ cnt, one scalar window — vocab-cardinality). */
  private def withProbs(vocab: DataFrame): DataFrame =
    vocab.withColumn("__total",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("piece"), col("cnt"),
        qProb(col("cnt"), col("__total")).as("prob"))

  /** Price a corpus in trained-tokenizer units: per doc, word count,
    * piece count, and unpriced words (NULL-segmentation foreign
    * words — reported, never silently dropped). The scored corpus's
    * word TYPES are priced once by the DP and join back BROADCAST —
    * the [[Bpe.pieceCounts]] shape. */
  /** The scored corpus's word TYPES priced once by the DP:
    * (word, n_pieces) — shared by [[pieceCounts]] and
    * [[fertilityCard]] so the pricing grain cannot diverge. */
  private def pricedWordTypes(docs: DataFrame, textCol: String,
                              probs: Map[String, Double],
                              maxPieceLen: Int): DataFrame =
    viterbiSegments(
      docs.select(explode(TextAnalysis.wordTokens(col(textCol))).as("word"))
        .distinct().withColumn("cnt", lit(1L)),
      probs, maxPieceLen)
      .select(col("word"), col("n_pieces"))

  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  probs: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val priced = pricedWordTypes(docs, textCol, probs, maxPieceLen)
    docs.select(col(idCol),
        explode_outer(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .join(broadcast(priced), Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(col("word")).as("n_words"),
        sum(coalesce(col("n_pieces"), lit(0L))).as("n_pieces"),
        sum(when(col("word").isNotNull && col("n_pieces").isNull, 1L)
          .otherwise(0L)).as("n_unpriced"))
  }

  /** CHARACTER-FALLBACK pricing — the coverage-completion step every
    * shipped unigram tokenizer carries (SentencePiece's
    * character-coverage floor): hard-EM pruning keeps only the pieces
    * the final round USED, so a char can drop from the vocabulary and
    * a NEW word recombining it stops segmenting even though the
    * tokenizer's declared alphabet covers it. Words the DP cannot
    * segment fall back to per-character pricing (one piece per char —
    * the seed's single-char floor) when every character is inside
    * `fallbackChars` (the tokenizer's DECLARED coverage — the
    * engine-wide token alphabet `a..z` by default); words outside even
    * the declared coverage stay `n_unpriced` — reported, never
    * silently dropped.
    *
    * `total_tokens = n_pieces + fallback_tokens` is the mass a
    * budget/packing stage must plan with: pricing only the
    * DP-segmentable words under-reads exactly the out-of-distribution
    * documents a mixture most needs to account for (UnigramSpec pins
    * that a packed layout over `total_tokens` reconciles to the
    * column's sum).
    *
    * Same scale shape as [[pieceCounts]]: word types priced once by
    * the DP (+ one narrow regex per type for the coverage test),
    * broadcast join back, one map-side-combined rollup.
    *
    * @return (id, n_words, n_pieces, fallback_words, fallback_tokens,
    *         n_unpriced, total_tokens). */
  def pieceCountsWithFallback(docs: DataFrame, idCol: String,
                              textCol: String, probs: Map[String, Double],
                              maxPieceLen: Int,
                              fallbackChars: Set[String] =
                                ('a' to 'z').map(_.toString).toSet): DataFrame = {
    require(fallbackChars.nonEmpty, "fallbackChars must be non-empty")
    fallbackChars.foreach(c => require(c.length == 1,
      s"fallbackChars must be single characters, got '$c'"))
    val cls = "^[" + fallbackChars.toSeq.sorted
      .map(java.util.regex.Pattern.quote).mkString + "]+$"
    val priced = pricedWordTypes(docs, textCol, probs, maxPieceLen)
      .withColumn("__fb", col("n_pieces").isNull && col("word").rlike(cls))
    val isWord = col("word").isNotNull
    val fb = isWord && col("n_pieces").isNull && col("__fb")
    docs.select(col(idCol),
        explode_outer(TextAnalysis.wordTokens(col(textCol))).as("word"))
      .join(broadcast(priced), Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(col("word")).as("n_words"),
        sum(coalesce(col("n_pieces"), lit(0L))).as("n_pieces"),
        sum(when(fb, 1L).otherwise(0L)).as("fallback_words"),
        sum(when(fb, length(col("word")).cast("long")).otherwise(0L))
          .as("fallback_tokens"),
        sum(when(isWord && col("n_pieces").isNull && !col("__fb"), 1L)
          .otherwise(0L)).as("n_unpriced"))
      .withColumn("total_tokens", col("n_pieces") + col("fallback_tokens"))
  }
}
