package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** BPE merge training: hand-computed greedy semantics (including the
  * overlapping-run case), the deterministic tie-break, early stop,
  * permutation invariance of the merge sequence, replay encoding, and
  * corpus piece counting. */
class BpeSpec extends SparkSpec {

  // word types: aaa ×3, ab ×2 — hand-traced merge sequence:
  //   round 1: (a,a)=6 [positions 1,2 of aaa ×3, overlap counted],
  //            (a,</w>)=3, (a,b)=2, (b,</w>)=2 → merge (a,a), aaa→[aa,a,</w>]
  //   round 2: (aa,a)=3 ties (a,</w>)=3 → lhs tie-break picks (a,</w>)
  //   round 3: (aa,a</w>)=3
  private def corpus = df(Seq(
    (1L, "aaa aaa ab"), (2L, "aaa ab")))
    .toDF("doc_id", "text")

  test("fitMerges: hand-computed greedy sequence with overlap counting and tie-break") {
    val merges = Bpe.fitMerges(corpus, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == Seq(
      (1, "a", "a", 6L),
      (2, "a", "</w>", 3L),
      (3, "aa", "a</w>", 3L),
      (4, "a", "b", 2L),
      (5, "ab", "</w>", 2L)))
  }

  test("fitMerges: greedy leftmost application — [a,a,a] merges to [aa,a], not [a,aa]") {
    val words = df(Seq(Tuple1("x"))).toDF("w")
      .select(split(lit("a a a a a"), " ").as("syms"))
    val out = words.select(Bpe.mergeOnce(col("syms"), "a", "a").as("m"))
      .head.getSeq[String](0)
    assert(out == Seq("aa", "aa", "a"),
      "runs merge alternately from the left; a fresh merge never re-merges in the same round")
  }

  test("fitMerges: stops early when no pair reaches minPairCount") {
    val once = df(Seq((1L, "ab cd"))).toDF("doc_id", "text")
    assert(Bpe.fitMerges(once, "text", numMerges = 4, minPairCount = 2)
      .count() == 0L)
    // with the threshold at 1 the same corpus trains merges
    assert(Bpe.fitMerges(once, "text", numMerges = 2, minPairCount = 1)
      .count() == 2L)
  }

  test("fitMerges: merge sequence invariant under row permutation and partitioning") {
    val base = Bpe.fitMerges(corpus, "text", numMerges = 5)
      .collect().toSeq.map(_.toSeq)
    val shuffled = Bpe.fitMerges(
      corpus.orderBy(col("doc_id").desc).repartition(7), "text",
      numMerges = 5).collect().toSeq.map(_.toSeq)
    assert(base == shuffled)
  }

  test("tokenizer store: continuation training equals the deeper one-shot fit") {
    try {
      Bpe.writeTokenizerStore(corpus, "text", numMerges = 2, table = "bpe_spec_tok")
      Bpe.extendTokenizer(corpus, "text", extraMerges = 3, table = "bpe_spec_tok")
      val extended = spark.table("bpe_spec_tok").orderBy("step")
        .collect().map(_.toSeq).toSeq
      val oneShot = Bpe.fitMerges(corpus, "text", numMerges = 5)
        .orderBy("step").collect().map(_.toSeq).toSeq
      assert(extended == oneShot,
        "the merge loop is Markov on the word table: resume ≡ refit deeper")
      // serve path reads the store
      val served = Bpe.pieceCountsAgainstStore(corpus, "doc_id", "text",
        "bpe_spec_tok").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(served(1L) == 3L && served(2L) == 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bpe_spec_tok")
      spark.sql(s"DROP TABLE IF EXISTS ${Bpe.tokenizerMeta("bpe_spec_tok")}")
    }
  }

  test("tokenizer store: a meta-less (crashed) store refuses serve AND extend, loud") {
    try {
      Bpe.writeTokenizerStore(corpus, "text", numMerges = 2, table = "bpe_spec_crash")
      // simulate a crash between the merge-table write and the meta commit
      spark.sql(s"DROP TABLE ${Bpe.tokenizerMeta("bpe_spec_crash")}")
      val e1 = intercept[IllegalArgumentException] {
        Bpe.pieceCountsAgainstStore(corpus, "doc_id", "text", "bpe_spec_crash")
      }
      assert(e1.getMessage.contains("no meta table"))
      val e2 = intercept[IllegalArgumentException] {
        Bpe.extendTokenizer(corpus, "text", extraMerges = 1, "bpe_spec_crash")
      }
      assert(e2.getMessage.contains("no meta table"))
      // the documented repair: re-run the (cheap) build — serve recovers
      Bpe.writeTokenizerStore(corpus, "text", numMerges = 2, table = "bpe_spec_crash")
      assert(Bpe.pieceCountsAgainstStore(corpus, "doc_id", "text",
        "bpe_spec_crash").count() == 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bpe_spec_crash")
      spark.sql(s"DROP TABLE IF EXISTS ${Bpe.tokenizerMeta("bpe_spec_crash")}")
    }
  }

  test("encode handles words the training corpus never saw (merge less, price high)") {
    val merges = Bpe.fitMerges(corpus, "text", numMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // serve a NEW corpus: 'aaab' never occurred in training, but the
    // learned merges still apply to its prefix ((a,a) then (a,</w>) has
    // no site, (aa,a</w>) has no site, (a,b) then (ab,</w>) hit)
    val served = df(Seq((1L, "aaab aaa zzz"))).toDF("doc_id", "text")
    val enc = Bpe.encodeWords(Bpe.wordSymbols(served, "text"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(enc("aaa") == Seq("aaa</w>"), "seen word replays to its trained pieces")
    assert(enc("aaab") == Seq("aa", "ab</w>"),
      "unseen word merges as far as the learned sequence reaches")
    assert(enc("zzz") == Seq("z", "z", "z", "</w>"),
      "wholly novel characters stay unmerged — priced high, the fertility signal")
    val fert = Bpe.fertilityCard(
      served.withColumn("source", lit("s0")), "source", "text",
      Bpe.encodeWords(Bpe.wordSymbols(served, "text"), merges))
      .head
    assert(fert.getLong(1) == 3L && fert.getLong(2) == 7L)
    assert(fert.getDouble(3) == 7.0 / 3.0)
  }

  test("encodeWords replays the learned sequence; pieceCounts prices the corpus in BPE units") {
    val mergeRows = Bpe.fitMerges(corpus, "text", numMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val encoded = Bpe.encodeWords(Bpe.wordSymbols(corpus, "text"), mergeRows)
    val byWord = encoded.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(byWord("aaa") == Seq("aaa</w>"))
    assert(byWord("ab") == Seq("ab</w>"))
    val counts = Bpe.pieceCounts(
      corpus.unionByName(df(Seq((3L, ""))).toDF("doc_id", "text")),
      "doc_id", "text", encoded)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts(1L) == ((3L, 3L))) // aaa aaa ab -> 1+1+1 pieces
    assert(counts(2L) == ((2L, 2L)))
    assert(counts(3L) == ((0L, 0L)), "token-less docs count 0, not null")
  }
}
