package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for a training-data
  * pipeline: reproducible Bernoulli sampling and per-stratum rate mixing
  * (the "80% en, 30% zh, 50% everything else" recipe step).
  *
  * No `rand()` anywhere: the keep/drop decision is a pure function of a
  * stable key — `md5(key) mod denom < rate·denom` using the md5-prefix
  * integer primitive shared with the DuckDB oracle — so a sample is
  * reproducible across runs, engines, partitionings and retries
  * (`rand()`-based sampling changes under AQE re-planning and task
  * retry, which silently breaks dataset reproducibility at scale).
  * Narrow per-row expressions: no shuffle, fully codegen'd, and the
  * filter sits directly above the scan.
  */
object Sampling {

  /** Sampling denominator: rates are resolved to 1/10000 granularity. */
  val Denom = 10000

  /** Stable bucket in [0, Denom) from any key column. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(Denom.toLong))

  /** Deterministic Bernoulli sample: keep rows whose key-bucket falls
    * under `rate` (0.0–1.0). */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(col(keyCol)) < math.round(rate * Denom))
  }

  /** SOFT (score-proportional) sampling — the published alternative to
    * a hard quality threshold (FineWeb-Edu keeps by classifier-score
    * band; the soft form keeps each document with probability equal to
    * its own per-row rate, so marginal documents contribute
    * proportionally instead of cliff-dropping at a cutoff): keep a row
    * iff its seeded key-bucket falls under `floor(rate·Denom)`. The
    * draw is the engine-wide deterministic-Bernoulli substitute for an
    * RNG ([[hashBucket]] — reproducible across runs, engines,
    * partitionings, retries); rates are clamped to [0, 1] and a NULL
    * rate keeps nothing (no evidence, no draw — the shared null
    * policy). Map-side narrow filter; no shuffle, no state. */
  def softSample(df: DataFrame, keyCol: String, rateCol: String,
                 seed: String): DataFrame =
    // the explicit isNotNull guard matters: concat_ws SKIPS a null key
    // (every null-key row would share the bucket of md5(seed) — kept
    // all-or-nothing), while the engine-wide null-key convention and
    // the oracle's '||' concatenation keep NOTHING for a null key
    df.filter(col(keyCol).isNotNull &&
      hashBucket(concat_ws(":", lit(seed), col(keyCol))) <
      floor(least(greatest(col(rateCol), lit(0.0)), lit(1.0))
        * Denom.toDouble).cast("long"))

  /** Near-dup-SAFE train/validation split: a random per-document split
    * leaks a near-duplicate of every held-out doc into training (the
    * dedup-before-split hazard published with "Deduplicating Training
    * Data Makes Language Models Better" — the held-out perplexity is
    * then measured on memorized text). The fix is to draw the split
    * from the duplicate CLUSTER, not the document: every member of a
    * near-dup component shares its canonical id's bucket, so a cluster
    * lands wholly in train or wholly in valid. `clusters` is the
    * (doc_id, canonical_id) frame of [[DupClusters]] — only docs with
    * at least one dup pair appear in it; singletons fall back to their
    * own id. Returns every doc with its `split_key` (the id the draw
    * used) and `split` ("train" / "valid").
    *
    * Shape at 100 TB: one hash equi-join docs ⋈ clusters on the id (the
    * cluster frame is dup-pair-sized, not corpus-sized, but NOT
    * assumed broadcastable — duplicate-heavy web crawls have billions
    * of clustered docs), then the same narrow md5-bucket filter as
    * [[bernoulli]]; deterministic under retries and AQE like every
    * draw in this file. */
  def clusterSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
                       validRate: Double): DataFrame = {
    require(validRate >= 0 && validRate <= 1,
      s"validRate must be in [0,1], got $validRate")
    docs
      .join(clusters.select(col("doc_id").as(idCol),
        col("canonical_id")), Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("canonical_id"), col(idCol)))
      .withColumn("split",
        when(hashBucket(col("split_key")) < math.round(validRate * Denom),
          lit("valid")).otherwise(lit("train")))
      .drop("canonical_id")
  }

  /** SPLIT-LEAKAGE AUDIT — the verification twin of
    * [[clusterSafeSplit]] (the x84 audit discipline: every operator
    * that makes a promise gets a checkable report of it): given the
    * corpus's near-dup pairs and a split assignment, count pairs per
    * unordered split combination. A (train, valid) row with a non-zero
    * count IS the dedup-before-split leak — the held-out side contains
    * a near-duplicate of a training doc, so its metrics partly measure
    * memorization; a cluster-safe split must audit to zero there by
    * construction, a naive per-document draw will not.
    *
    * Shape at 100 TB: two id-keyed joins attach the split to each pair
    * end (pairs-sized work, never corpus-sized), then a
    * map-side-combined groupBy on the ≤ |splits|² combination space. */
  def splitLeakage(pairs: DataFrame, split: DataFrame, idCol: String,
                   splitCol: String): DataFrame =
    pairs
      .join(split.select(col(idCol).as("doc_a"), col(splitCol).as("__sa")),
        Seq("doc_a"))
      .join(split.select(col(idCol).as("doc_b"), col(splitCol).as("__sb")),
        Seq("doc_b"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))

  /** [[clusterSafeSplit]] composed end-to-end from text: MinHash/LSH
    * near-dup pairs → connected components → cluster-keyed split. */
  def clusterSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, numHashes: Int, nBands: Int,
                       minJaccard: Double, validRate: Double): DataFrame = {
    val (pairs, release) = MinHash.nearDupPairsOwned(docs, idCol, textCol,
      shingleN, numHashes, nBands, minJaccard)
    val clusters = DupClusters.connectedComponentsStars(pairs)
      .localCheckpoint(true)
    release()
    clusterSafeSplit(docs, idCol, clusters, validRate)
  }

  /** Per-stratum rate mixing: keep a row iff its key-bucket falls under
    * its stratum's rate (`defaultRate` for unlisted strata). The rate
    * lookup compiles to a CASE chain — still one narrow codegen'd
    * filter over the scan. */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1], got $r"))
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultRate * Denom)): Column) { case ((stratum, r), acc) =>
      when(col(stratumCol) === stratum, lit(math.round(r * Denom))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** EXACT-k per-stratum sample — the fixed-size draw (eval-set
    * construction, per-domain human-review batches: "exactly k docs
    * per source", not "roughly rate·n"). Rows rank within their
    * stratum by the seeded md5 key (the [[CorpusShuffle]] permutation
    * primitive — a different seed draws a different, reproducible
    * sample; the doc key itself tie-breaks the astronomically unlikely
    * digest collision so the cut is total-ordered) and the top k per
    * stratum survive. Strata with ≤ k rows keep everything — a draw,
    * not a guarantee of k.
    *
    * Scale shape: one hash exchange on the stratum + an in-partition
    * sort — the [[Curation.topFractionPerGroup]] window shape; no
    * global sort, no driver state. Hot strata are one window partition
    * each — the same documented skew bound as every per-group rank in
    * this engine. */
  def exactKPerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(CorpusShuffle.shuffleKey(keyCol, seed), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
