package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection via MinHash + LSH banding over word
  * shingles: shingle → md5-derived integer hash → N permutation minima →
  * bands → `groupBy(band)` candidate join. No all-pairs comparison
  * anywhere: the only wide ops are an equi self-join on (band, band_key)
  * and a distinct — the standard web-scale near-dup plan.
  *
  * Cache ownership: the pair-finding operators `persist()` their narrow
  * signature tables (consumed ≥3× by the returned plan), and the CALLER
  * owns the cache lifetime — the blocks must outlive the returned
  * (lazy) DataFrame's evaluation, so the operator cannot safely
  * unpersist them itself. Release them with `spark.catalog.clearCache()`
  * (as `graft.Bench` does between queries) or by keeping a handle to the
  * input session; under memory pressure MEMORY_AND_DISK blocks are
  * LRU-evicted, so an unreleased cache degrades to recompute, never to
  * failure. Same contract for [[SimHash]] and [[Similarity]].
  *
  * Every step is deterministic integer arithmetic shared with DuckDB
  * (md5 prefix → int64, LCG permutation parameters, mod 1e9+7), so the
  * whole operator is oracle-checkable bit-for-bit.
  */
object MinHash {

  /** Large prime modulus for the permutation hashes (fits comfortably in
    * int64: a·h + b < (1e9+7)² ≈ 1.0e18 < 2^63). */
  val P = 1000000007L

  /** Word n-gram shingles over whitespace tokens of lowercased trimmed
    * text (same tokenizer as [[TextAnalysis.wsTokens]]). */
  def shingles(text: Column, n: Int): Column = {
    val toks = regexp_extract_all(lower(trim(text)), lit("\\S+"), lit(0))
    // guard: sequence(0, negative) would DESCEND, yielding bogus indices
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*)))
  }

  /** 60-bit integer hash of a shingle: first 15 hex chars of md5 — the
    * primitive both Spark (`conv(_,16,10)`) and DuckDB
    * (`CAST('0x'||_ AS UBIGINT)`) parse to the same value. */
  def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Permutation parameters for hash function i (0-based): LCG-derived,
    * a_i non-zero mod P (canonical definition shared with the native
    * expression in [[graft.functions.MinHashSig]]). */
  private def permA(i: Int): Long = graft.functions.MinHashSig.permA(i)
  private def permB(i: Int): Long = graft.functions.MinHashSig.permB(i)

  /** MinHash signature (array of `numHashes` longs) over a shingle-hash
    * array: element i = min over shingles of (a_i·(h mod P) + b_i) mod P.
    * Null for rows with no shingles. */
  def signature(shingleHashes: Column, numHashes: Int): Column =
    when(size(shingleHashes) === 0, lit(null)).otherwise(
      transform(sequence(lit(0), lit(numHashes - 1)), i => {
        val perms = transform(shingleHashes, h =>
          // element_at on the constant arrays below would also work, but
          // inlining per-i constants keeps everything foldable
          (element_at(typedLit((0 until numHashes).map(permA)), i + 1)
            * (h % P) + element_at(typedLit((0 until numHashes).map(permB)), i + 1)) % P)
        array_min(perms)
      }))

  /** Per-doc signature table `(id, __sig)`, built as STAGED projections
    * that materialize tokens → shingles → hashes → signature as real
    * columns. This is a performance contract, not style: higher-order
    * functions evaluate their lambdas interpreted, with no common-
    * subexpression elimination, so the one-shot nested expression
    * (`signature(transform(shingles(text), hash))`) re-runs the regex
    * tokenization and md5 once per lambda reference — ~80× redundant work
    * (measured: 265 s → ~2 s at sf0.1). Catalyst's CollapseProject keeps
    * the stages separate because each intermediate column is referenced
    * more than once. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int, numHashes: Int): DataFrame =
    shingleHashArrays(docs, idCol, textCol, shingleN)
      // native twin of [[signature]] (MinHashSpec pins the parity): one
      // fused codegen pass maintaining all minima vs numHashes interpreted
      // re-scans of the shingle array per doc (~8.7 s → ~1 s at sf0.1)
      .select(col(idCol), graft.functions.MinHashSig(col("__hh"), numHashes).as("__sig"))
      .filter(col("__sig").isNotNull)

  /** `(id, __hh)` — the staged shingle-hash pipeline shared by MinHash,
    * [[SimHash]], and exact n-gram Jaccard (same staging rationale as
    * [[signatures]]). */
  def shingleHashArrays(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int): DataFrame = {
    // tokenization stays a Spark expression (regex + Unicode lowercasing
    // must match the DuckDB oracle); the shingle build + md5 runs in the
    // native ShingleMd5 expression — one fused loop per doc instead of
    // two interpreted lambdas per shingle (MinHashSpec pins the parity
    // with the [[shingles]]+[[shingleHash]] HOF chain)
    val toks = regexp_extract_all(lower(trim(col(textCol))), lit("\\S+"), lit(0))
    docs.select(col(idCol),
      graft.functions.ShingleMd5(toks, shingleN).as("__hh"))
  }

  /** The per-band string keys of a signature (array of `nBands`
    * strings) — the one definition shared by [[bandedSignature]] and
    * the persisted-store layout in [[IncrementalDedup]], so the two
    * can never drift. Null-propagating: a null signature yields a null
    * array (NOT an array of nBands empty strings — `concat_ws` skips
    * null elements, so without the guard every signatureless doc would
    * collide on band_key "" and pile a quadratically-growing candidate
    * set onto nBands hot keys in the incremental store). */
  def bandKeys(sigCol: Column, nBands: Int, rowsPerBand: Int): Column =
    when(sigCol.isNotNull,
      transform(sequence(lit(0), lit(nBands - 1)), b =>
        concat_ws("-", (0 until rowsPerBand).map(r =>
          element_at(sigCol, b * rowsPerBand + r + 1).cast("string")): _*)))

  /** Number of agreeing positions between two equal-length signature
    * arrays — the exact-integer MinHash agreement count, the one
    * definition shared by [[nearDupPairs]] (as `est_jaccard`'s
    * numerator) and [[IncrementalDedup.dedupAgainstStore]] (as
    * `n_match`), so the batch and incremental paths can never drift. */
  def sigAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, m) => acc + m)

  /** (id, band, band_key) rows: signature split into `nBands` bands of
    * `rowsPerBand` values, joined into a string key. Docs with no
    * signature (fewer than n words) are dropped. */
  def bandedSignature(df: DataFrame, idCol: String, sigCol: String,
                      nBands: Int, rowsPerBand: Int): DataFrame =
    df.filter(col(sigCol).isNotNull)
      .select(col(idCol),
        posexplode(bandKeys(col(sigCol), nBands, rowsPerBand))
          .as(Seq("band", "band_key")))

  /** Unordered candidate pairs `(doc_a, doc_b)`, `doc_a < doc_b`, of
    * docs agreeing on at least one LSH band — the self equi-join both
    * [[nearDupPairs]] and [[exactJaccardPairs]] build on.
    *
    * `maxBandDocs > 0` skips band keys matching MORE than that many
    * docs before the join: a hot bucket (boilerplate text — cookie
    * banners, license headers, near-empty docs — collapses many docs
    * onto one key) contributes pairs QUADRATICALLY in its size, and at
    * corpus scale a single million-doc bucket means 10¹² candidate
    * rows through one skewed key. A pair sharing a skipped key is
    * still found through any of its other nBands−1 bands (and true
    * boilerplate is exact-dedup's job upstream — [[ExactDedup]] runs
    * first in the curation funnel), so the cap trades a bounded recall
    * loss on exactly the docs exact dedup already covers for a hard
    * ceiling on per-key join work. 0 (the default, and the
    * oracle-checked configuration) disables the cap.
    *
    * Shared across the near-dup family: [[SimHash.nearDupPairs]] and
    * [[Similarity.nearDupPairs]] generate candidates through this same
    * definition (band_key type differs — string here, packed int
    * there — the join logic is identical). */
  private[ext] def candidatePairs(bands: DataFrame, idCol: String,
                                  maxBandDocs: Int): DataFrame = {
    val kept =
      if (maxBandDocs > 0) {
        // map-side-combined count per key, then a broadcast-size-agnostic
        // semi filter; the count shuffles (band, band_key, n) rows only
        val sizes = bands.groupBy("band", "band_key")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBandDocs)
          .select("band", "band_key")
        bands.join(sizes, Seq("band", "band_key"), "left_semi")
      } else bands
    kept.as("a").join(kept.as("b"), Seq("band", "band_key"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** End-to-end candidate-pair near-dup detection: for every unordered
    * pair of docs agreeing on at least one LSH band, the estimated
    * Jaccard similarity (= matching signature fraction, an exact integer
    * over numHashes). Output: (doc_a, doc_b, est_jaccard ≥ minJaccard).
    *
    * Plan shape: narrow signature computation → explode(bands) →
    * self equi-join on (band, band_key) → distinct pairs → two id-joins
    * to fetch signatures → narrow estimate. No cartesian products.
    * `maxBandDocs` — see [[candidatePairs]] (hot-bucket cap; 0 = off). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, numHashes: Int, nBands: Int,
                   minJaccard: Double, maxBandDocs: Int = 0): DataFrame =
    nearDupPairsOwned(docs, idCol, textCol, shingleN, numHashes, nBands,
      minJaccard, maxBandDocs)._1

  /** [[nearDupPairs]] with the signature cache OWNERSHIP made explicit
    * (the [[graft.ext.Decontaminate.contaminatedAgainstStoreOwned]]
    * convention): the second element unpersists exactly the internal
    * signature frame — call it once the pairs are CONSUMED (an eager
    * materialization downstream), instead of the session-wide
    * `clearCache()` the plain overload's contract falls back to. A
    * composing operator that runs per corpus snapshot
    * ([[Curation.batchRecipe]]) must not accumulate one signature cache
    * per call. */
  def nearDupPairsOwned(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int, nBands: Int,
                        minJaccard: Double, maxBandDocs: Int = 0)
      : (DataFrame, () => Unit) = {
    val rowsPerBand = numHashes / nBands
    // The signature table is consumed three times (band explode + the two
    // per-pair signature lookups): persist the narrow (id, 16×long) rows
    // so the shingle/hash pipeline runs once. At warehouse scale this is
    // the step one would materialize as a signatures table.
    val sigs = signatures(docs, idCol, textCol, shingleN, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = bandedSignature(sigs, idCol, "__sig", nBands, rowsPerBand)
    val pairs = candidatePairs(bands, idCol, maxBandDocs)
      .join(sigs.select(col(idCol).as("doc_a"), col("__sig").as("__sa")), "doc_a")
      .join(sigs.select(col(idCol).as("doc_b"), col("__sig").as("__sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (sigAgreement(col("__sa"), col("__sb")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
    (pairs, () => { sigs.unpersist(); () })
  }

  /** Find-then-confirm near-dup: candidate pairs from the LSH bands,
    * confirmed with the EXACT n-gram Jaccard over distinct shingle-hash
    * sets (set intersection/union sizes — exact small-integer ratio, so
    * the double is engine-identical). This is the standard two-phase
    * web-dedup pipeline: sketches find, exact verifies; still no
    * all-pairs work anywhere. `maxBandDocs` — see [[candidatePairs]]
    * (hot-bucket cap; 0 = off). */
  def exactJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int, nBands: Int,
                        minJaccard: Double, maxBandDocs: Int = 0): DataFrame = {
    val rowsPerBand = numHashes / nBands
    // ONE shingle/hash pipeline feeds both the signature-band candidate
    // generation and the exact hash-set confirms (persisted because it is
    // consumed three times; evicted LRU — at warehouse scale this is the
    // materialized signatures table)
    val hashes = shingleHashArrays(docs, idCol, textCol, shingleN)
      .filter(size(col("__hh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = hashes.select(col(idCol),
      graft.functions.MinHashSig(col("__hh"), numHashes).as("__sig"))
    val bands = bandedSignature(sigs, idCol, "__sig", nBands, rowsPerBand)
    val hsets = hashes.select(col(idCol), array_distinct(col("__hh")).as("__hset"))
    candidatePairs(bands, idCol, maxBandDocs)
      .join(hsets.select(col(idCol).as("doc_a"), col("__hset").as("__ha")), "doc_a")
      .join(hsets.select(col(idCol).as("doc_b"), col("__hset").as("__hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("__ha"), col("__hb"))).cast("double")
          / size(array_union(col("__ha"), col("__hb")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
