package graft

import graft.ext.{Chunking, CorpusShuffle, Pii}
import org.apache.spark.sql.functions._

/** Semantics of the round-7 corpus-preparation operators: PII
  * scrubbing, deterministic global shuffle, and sliding-window
  * chunking. */
class PiiSpec extends SparkSpec {
  private def annotateOne(text: String) = {
    val s = spark
    import s.implicits._
    Pii.annotate(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
  }

  test("each PII class is counted and redacted with its typed placeholder") {
    val s = spark
    import s.implicits._
    val r = Seq((1L, "mail a.b+c@foo.example.org or 10.0.0.1 or 555-123-4567 end"))
      .toDF("doc_id", "text")
      .select(Pii.redact(col("text"))).collect().head.getString(0)
    assert(r == "mail <EMAIL> or <IP> or <PHONE> end")
    val a = annotateOne("x@y.io and w@z.co, 1.2.3.4, none")
    assert(a.getAs[Long]("n_emails") == 2L)
    assert(a.getAs[Long]("n_ips") == 1L)
    assert(a.getAs[Long]("n_phones") == 0L)
    assert(a.getAs[Long]("n_pii") == 3L)
  }

  test("clean text is untouched: zero counts, fingerprint equals md5 of the original") {
    val a = annotateOne("no personal data here, just words")
    assert(a.getAs[Long]("n_pii") == 0L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("no personal data here, just words".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(a.getAs[String]("redacted_fp") == expected)
  }

  test("overlapping spans count once: n_pii equals the number of redacted spans") {
    // the email regex swallows the whole token; the embedded IPv4
    // substring must not ALSO count (it is never separately redacted)
    val a = annotateOne("reach me at 1.2.3.4@example.com today")
    assert(a.getAs[Long]("n_emails") == 1L)
    assert(a.getAs[Long]("n_ips") == 0L)
    assert(a.getAs[Long]("n_phones") == 0L)
    assert(a.getAs[Long]("n_pii") == 1L)
    val s = spark
    import s.implicits._
    val r = Seq((1L, "reach me at 1.2.3.4@example.com today"))
      .toDF("doc_id", "text")
      .select(Pii.redact(col("text"))).collect().head.getString(0)
    assert(r == "reach me at <EMAIL> today")
  }

  test("n_pii equals the number of placeholders actually inserted, on randomized PII-dense text") {
    // the invariant behind the overlap fix: counts are defined AS the
    // placeholders redact() inserts, so they must agree exactly — for
    // any input, including overlapping spans
    val s = spark
    import s.implicits._
    var seed = 0x9115EEDL
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 16, bound).toInt
    }
    val pieces = Vector("hello", "1.2.3.4", "a@b.io", "555-123-4567",
      "1.2.3.4@example.com", "x1.2.3.4y", "call 555-000-1111 now",
      "u.5@d7.org", "10.0.0.255", "., -", "5551234567")
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(2 + nxt(6))(pieces(nxt(pieces.size))).mkString(" ")))
    val out = Pii.annotate(docs.toDF("doc_id", "text"), "doc_id", "text")
      .join(docs.toDF("doc_id", "text")
        .select(col("doc_id"), Pii.redact(col("text")).as("red")), "doc_id")
      .select(col("doc_id"), col("n_pii"), col("n_emails"), col("n_ips"),
        col("n_phones"), col("red")).collect()
    out.foreach { r =>
      val red = r.getAs[String]("red")
      def occ(tok: String): Long = {
        var c = 0L; var i = red.indexOf(tok)
        while (i >= 0) { c += 1; i = red.indexOf(tok, i + tok.length) }
        c
      }
      assert(r.getAs[Long]("n_emails") == occ("<EMAIL>"), s"emails @ ${r.getLong(0)}: $red")
      assert(r.getAs[Long]("n_ips") == occ("<IP>"), s"ips @ ${r.getLong(0)}: $red")
      assert(r.getAs[Long]("n_phones") == occ("<PHONE>"), s"phones @ ${r.getLong(0)}: $red")
      assert(r.getAs[Long]("n_pii") == occ("<EMAIL>") + occ("<IP>") + occ("<PHONE>"))
    }
  }

  test("email redaction runs before the phone pass (digits in local parts do not double-match)") {
    val s = spark
    import s.implicits._
    val r = Seq((1L, "ping 555-123-4567x@mail.example.com"))
      .toDF("doc_id", "text")
      .select(Pii.redact(col("text"))).collect().head.getString(0)
    // the whole token is one email (local part may contain digits/dashes)
    assert(r == "ping <EMAIL>")
  }
}

class CorpusShuffleSpec extends SparkSpec {
  private def ids(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("shard manifest: counts, token mass, contiguity; any content change flips the fingerprint") {
    val s = spark
    import s.implicits._
    val docs = (0L until 10L).map(i => (i, s"w$i " * 3)).toDF("doc_id", "text")
    def manifest(d: org.apache.spark.sql.DataFrame) =
      CorpusShuffle.shardManifest(
        CorpusShuffle.order(d, "doc_id", seed = "s1", shardSize = 4L),
        d, "doc_id", "text")
        .orderBy("shard_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
    val m = manifest(docs)
    assert(m.map(_._2).toSeq == Seq(4L, 4L, 2L))
    assert(m.map(_._3).toSeq == Seq(12L, 12L, 6L)) // 3 tokens per doc
    m.foreach { r => assert(r._6 - r._5 + 1 == r._2, s"non-contiguous: $r") }
    // a single-document edit flips exactly its shard's fingerprint
    val tampered = docs.withColumn("text",
      when($"doc_id" === 3L, lit("tampered")).otherwise($"text"))
    val t = manifest(tampered)
    val changed = m.zip(t).filter { case (a, b) => a._4 != b._4 }
    assert(changed.length == 1, s"exactly one shard fingerprint must flip")
    // identical twin TEXTS do not XOR out: the id is inside the hash
    val twins = Seq((1L, "same"), (2L, "same")).toDF("doc_id", "text")
    val tw = manifest(twins)
    assert(tw.head._4 != 0L)
  }

  test("manifest framing is unambiguous: a separator-shift (id, text) swap flips the fingerprint") {
    val s = spark
    import s.implicits._
    // under separator-based framing ('id#text') the pairs ('a', 'b#x')
    // and ('a#b', 'x') hashed the same string 'a#b#x', so EACH corpus
    // below XOR-ed to 0 — a content change from the x-corpus to the
    // y-corpus kept the fingerprint identical and the integrity check
    // passed silently; fixed-width md5 framing separates them
    def fp(rows: Seq[(String, String)]) =
      CorpusShuffle.shardManifest(
        CorpusShuffle.order(rows.toDF("doc_id", "text"), "doc_id",
          seed = "s1", shardSize = 16L),
        rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.getAs[Long]("content_xor")).head
    val original = Seq(("a", "b#x"), ("a#b", "x"))
    val corrupted = Seq(("a", "b#y"), ("a#b", "y"))
    assert(fp(original) != fp(corrupted))
  }

  test("verifyShards: ok / first-diff mismatch / missing / unexpected verdicts") {
    val s = spark
    import s.implicits._
    val docs = (0L until 12L).map(i => (i, s"tok$i alpha beta")).toDF("doc_id", "text")
    def ordered(d: org.apache.spark.sql.DataFrame) =
      CorpusShuffle.order(d, "doc_id", seed = "v1", shardSize = 4L)
    val manifest = CorpusShuffle.shardManifest(ordered(docs), docs,
      "doc_id", "text").localCheckpoint(true)
    // pristine receipt: every shard ok, no first_diff
    val clean = CorpusShuffle.verifyShards(manifest, ordered(docs), docs,
      "doc_id", "text").collect()
    assert(clean.length == 3 && clean.forall(_.getString(1) == "ok"))
    // same-token-count tamper: only that shard flips, diagnosed by the xor
    val tam = docs.withColumn("text",
      when($"doc_id" === 5L, lit("tokX alpha beta")).otherwise($"text"))
    val v = CorpusShuffle.verifyShards(manifest, ordered(tam), tam,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).sortBy(_._1)
    assert(v.count(_._2 == "mismatch") == 1)
    assert(v.find(_._2 == "mismatch").get._3.contains("content_xor"),
      "equal counts and positions must fall through to the xor verdict")
    // a manifest shard nothing arrived for -> missing; a received shard
    // the manifest never listed -> unexpected
    val truncated = CorpusShuffle.verifyShards(manifest,
        ordered(docs).filter(col("shard_id") < 2L),
        docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(truncated(2L) == "missing")
    val extra = CorpusShuffle.verifyShards(
        manifest.filter(col("shard_id") < 2L), ordered(docs), docs,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(extra(2L) == "unexpected")
  }

  test("order is a permutation: pos is dense 0..n-1 and shards are contiguous runs") {
    val out = CorpusShuffle.order(ids(10), "doc_id", seed = "s1", shardSize = 4L)
      .orderBy("pos").collect()
    assert(out.map(_.getAs[Long]("pos")).toSeq == (0L until 10L))
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L until 10L))
    assert(out.map(_.getAs[Long]("shard_id")).toSeq ==
      Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L, 2L))
    // pos order IS shuffle_key order
    assert(out.map(_.getAs[String]("shuffle_key")).toSeq ==
      out.map(_.getAs[String]("shuffle_key")).sorted.toSeq)
  }

  test("the permutation is seed-pinned: same seed reproduces it, a new seed changes it") {
    def perm(seed: String) =
      CorpusShuffle.order(ids(64), "doc_id", seed, shardSize = 16L)
        .orderBy("pos").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(perm("graft") == perm("graft"))
    assert(perm("graft") != perm("graft2"))
  }
}

class ChunkingSpec extends SparkSpec {
  private def chunksOf(text: String, win: Int, stride: Int) = {
    val s = spark
    import s.implicits._
    Chunking.chunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", win, stride)
      .orderBy("chunk_idx").collect()
  }

  test("overlapping windows: 1 + ceil((n-win)/stride) chunks, no fully-contained tail") {
    // 5 tokens, win=3 stride=2 → starts 0,2 (start=2 reaches the end;
    // a start=4 window "e" would be fully contained in "c d e")
    val rows = chunksOf("a b c d e", win = 3, stride = 2)
    assert(rows.map(r => (r.getAs[Long]("chunk_idx"),
      r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks"))).toSeq ==
      Seq((0L, 0L, 3L), (1L, 2L, 3L)))
    // 6 tokens, win=3 stride=2 → starts 0,2,4; only the LAST may be short
    val rows6 = chunksOf("a b c d e f", win = 3, stride = 2)
    assert(rows6.map(r => (r.getAs[Long]("start_tok"),
      r.getAs[Long]("n_toks"))).toSeq == Seq((0L, 3L), (2L, 3L), (4L, 2L)))
  }

  test("chunk fingerprints hash the window content (verified against md5 of the slice)") {
    val rows = chunksOf("a b c d e", win = 3, stride = 2)
    def fp(sliceText: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(sliceText.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.map(_.getAs[String]("chunk_fp")).toSeq ==
      Seq(fp("a b c"), fp("c d e")))
  }

  test("empty docs yield no chunks; stride == win degenerates to disjoint passages") {
    assert(chunksOf("   ", win = 4, stride = 2).isEmpty)
    val rows = chunksOf("a b c d e", win = 2, stride = 2)
    assert(rows.map(r => (r.getAs[Long]("start_tok"),
      r.getAs[Long]("n_toks"))).toSeq == Seq((0L, 2L), (2L, 2L), (4L, 1L)))
  }

  test("stride must not exceed the window") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Chunking.chunks(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", win = 2, stride = 3)
    }
  }
}
