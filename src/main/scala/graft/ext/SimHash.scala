package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: a 60-bit locality-sensitive content
  * fingerprint (bit j = sign of the per-bit majority vote over shingle
  * hashes), banded for candidate generation, with Hamming distance as the
  * similarity measure — the classic web-dedup fingerprint, complementary
  * to [[MinHash]] (SimHash responds to the shingle *multiset*'s bitwise
  * profile; MinHash to set resemblance).
  *
  * 60 bits because the shingle hash is the md5-prefix integer shared with
  * DuckDB (15 hex chars) — every step is integer arithmetic both engines
  * execute identically, so the operator is oracle-checkable bit-for-bit.
  *
  * Scale shape: fingerprints are narrow per-row integer work; candidate
  * pairs come from a self equi-join on (band, band_key) — 4 bands of 15
  * bits, which finds every pair with Hamming distance ≤ 3 guaranteed
  * (pigeonhole: ≤ 3 differing bits cannot touch all 4 bands) without any
  * all-pairs comparison.
  */
object SimHash {

  val Bits = 60
  val Bands = 4
  val BandBits: Int = Bits / Bands // 15

  /** 60-bit SimHash over a (materialized) shingle-hash array column: for
    * each bit j, +1/−1 vote per shingle on bit j of its hash; bit set
    * when the vote sum is ≥ 0. Packed MSB-first by an exact integer fold
    * (`acc·2 + bit`, ≡ Σ bit_j·2^j). Null for empty shingle arrays. */
  // shiftright with a COLUMN shift amount (the Scala helper only takes a
  // literal Int; the SQL function accepts expressions for both args)
  private def shr(x: Column, n: Column): Column = call_function("shiftright", x, n)

  def simhash(shingleHashes: Column): Column =
    when(size(shingleHashes) === 0, lit(null)).otherwise(
      aggregate(sequence(lit(Bits - 1), lit(0), lit(-1)), lit(0L),
        (acc, j) => acc * 2 + when(
          aggregate(shingleHashes, lit(0),
            (v, h) => v + when(shr(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
            >= 0, 1L).otherwise(0L)))

  /** Per-doc fingerprint table `(id, __simhash)`. Uses the native
    * [[graft.functions.SimHash60]] expression — bit-identical to the
    * [[simhash]] HOF formulation above (SimHashSpec pins the parity) but
    * one fused codegen loop instead of 60 interpreted array re-scans per
    * doc (measured at sf0.1: 431 s interpreted → <1 s native; the
    * fingerprint step is the corpus-proportional cost at 100 TB). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int): DataFrame =
    MinHash.shingleHashArrays(docs, idCol, textCol, shingleN)
      .select(col(idCol), graft.functions.SimHash60(col("__hh")).as("__simhash"))
      .filter(col("__simhash").isNotNull)

  /** Near-dup candidate pairs: docs agreeing on at least one 15-bit band
    * of the fingerprint, kept when Hamming distance ≤ `maxHamming`.
    * Output: (doc_a, doc_b, hamming). For maxHamming ≤ 3 the banding is
    * exhaustive (no false negatives vs the full fingerprint).
    * `maxBandDocs` — see [[MinHash.candidatePairs]] (hot-bucket cap;
    * 0 = off; note a cap makes the ≤-3-Hamming guarantee bounded by the
    * skipped buckets). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, maxHamming: Int, maxBandDocs: Int = 0): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandKeys = transform(sequence(lit(0), lit(Bands - 1)), b =>
      shr(col("__simhash"), lit(BandBits) * b).bitwiseAND(lit((1L << BandBits) - 1)))
    val bands = fps.select(col(idCol), posexplode(bandKeys).as(Seq("band", "band_key")))
    MinHash.candidatePairs(bands, idCol, maxBandDocs)
      .join(fps.select(col(idCol).as("doc_a"), col("__simhash").as("__fa")), "doc_a")
      .join(fps.select(col(idCol).as("doc_b"), col("__simhash").as("__fb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("__fa").bitwiseXOR(col("__fb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
