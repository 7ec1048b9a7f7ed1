package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share any
  * word n-gram with a held-out evaluation set — the standard pre-training
  * hygiene sweep (n-gram-overlap decontamination as published for GPT-3 /
  * The Pile / FineWeb).
  *
  * Shape at 100 TB: the split predicate partitions the corpus FIRST, so
  * each side is tokenized exactly once; gram fingerprints come from the
  * native codegen'd [[graft.functions.ShingleMd5]] (one fused
  * digest loop per document — no gram string is ever materialized, no
  * interpreted HOF lambda), reduce to DISTINCT 8-byte longs per side,
  * and meet in ONE left hash equi-join followed by ONE count-aggregate
  * on the train doc id (total and shared grams counted in the same
  * pass). No cartesian, no broadcast of the (large) eval gram set; the
  * only shuffles are on gram-hash and doc-id keys.
  */
object Decontaminate {

  // tokenization is PROJECTED before the shingle expression — inlining
  // it would re-run the regex per output element under a HOF, and even
  // under the native expression the projection keeps the plan readable
  private def grams(docs: DataFrame, textCol: String, n: Int,
                    extraCols: Column*): DataFrame =
    docs.select(extraCols :+ Ngrams.normTokens(col(textCol)).as("__toks"): _*)
      .select(extraCols :+
        explode(graft.functions.ShingleMd5(col("__toks"), n)).as("gram_fp"): _*)
      .distinct()

  /** Training docs contaminated by the eval split, with overlap counts.
    *
    * @param evalPred predicate over `docs` columns selecting the eval
    *                 split (e.g. `col("doc_id") % 10 === 0`); train =
    *                 the complement.
    * @return (id, n_grams, n_shared, contamination) — one row per
    *         contaminated train doc; `contamination` = n_shared/n_grams.
    */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   evalPred: Column, n: Int): DataFrame = {
    val trainGrams = grams(docs.filter(!evalPred), textCol, n, col(idCol))
    val evalGrams = grams(docs.filter(evalPred), textCol, n)
      .withColumn("__hit", lit(1))
    trainGrams
      .join(evalGrams, Seq("gram_fp"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_shared"))
      .filter(col("n_shared") > 0)
      .select(col(idCol), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }

  // session caps on Spark's runtime bloom filter (the expression
  // rejects larger values): 4e6 items / 6.7e7 bits by default
  private val MaxBloomItems = 4000000L
  private val MaxBloomBits = 67108864L

  /** Exact bloom sizing from a measured distinct-gram count, clamped to
    * the session caps — shared by the inline and persisted-store paths
    * so the two can never desynchronize. */
  private def bloomSizing(count: Long, fpp: Double): (Long, Long) = {
    val items = math.min(math.max(count, 1L), MaxBloomItems)
    val bits = math.min(MaxBloomBits, math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
    (items, bits)
  }

  /** [[contaminated]] with a BLOOM PREFILTER on the eval gram set —
    * identical results (the bloom is a prefilter; an exact semi-join
    * confirm removes its false positives), cheaper shape at corpus
    * scale: [[contaminated]] shuffles EVERY distinct train gram through
    * the gram-keyed join, while here the gram-keyed exchange carries
    * only the grams that (probably) hit the eval set — true overlaps
    * plus an `fpp` fraction of the rest — and the per-doc totals come
    * from a doc-keyed map-side-combined count that never touches the
    * join. This is the published decontamination deployment shape
    * (bloom over the benchmark n-grams, streamed over the corpus), and
    * it is Spark's own runtime-filter pattern made explicit
    * ([[graft.functions.Bloom]]); the one driver-side value is the
    * serialized filter itself (same O(1)-scalar convention as the
    * surrogate-id max). Bloom sizing is exact (the eval gram count is
    * measured, not guessed), clamped to the expression's caps.
    *
    * CACHE LIFETIME CONTRACT (the MinHash convention, stated loudly):
    * the returned DataFrame keeps referencing the persisted train-gram
    * rows — a long-lived session must release them with
    * `spark.catalog.clearCache()` once the result is consumed. The
    * eval-gram cache is NOT part of the contract: it is unpersisted
    * inside this method as soon as the bloom bytes are collected (its
    * two driver actions are done by then; the confirm semi-join
    * re-derives the small eval side once at execution instead of
    * pinning a second relation for the caller to remember). The bloom
    * filter itself is plan-embedded driver state, capped at
    * [[MaxBloomBits]] bits. */
  def contaminatedBloom(docs: DataFrame, idCol: String, textCol: String,
                        evalPred: Column, n: Int,
                        fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // train grams are consumed twice lazily (totals + candidates):
    // persist the narrow (id, long) rows — released by the caller per
    // the contract above
    val trainGrams = grams(docs.filter(!evalPred), textCol, n, col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eval grams are consumed by two EAGER actions (count + bloom agg)
    // back to back: persist only across them, then release before
    // returning — the lazy confirm join recomputes the eval side once
    val evalGrams = grams(docs.filter(evalPred), textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloomBytes =
      try {
        val (nEval, numBits) = bloomSizing(evalGrams.count(), fpp)
        evalGrams
          .agg(graft.functions.Bloom.agg(col("gram_fp"), nEval, numBits))
          .head.getAs[Array[Byte]](0)
      } finally evalGrams.unpersist()
    val candidates =
      if (bloomBytes == null) trainGrams.filter(lit(false)) // empty eval split
      else trainGrams.filter(
        graft.functions.Bloom.mightContain(lit(bloomBytes), col("gram_fp")))
    val shared = candidates.join(evalGrams, Seq("gram_fp"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    val totals = trainGrams.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    shared.join(totals, Seq(idCol))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }

  /** Name of the 1-row meta table kept next to a benchmark store
    * `table`: `(n, fpp, n_grams, bloom)` — the gram size the store was
    * built with (read back by [[contaminatedAgainstStore]], so a shard
    * can never be checked with a mismatched n), the bloom's target
    * false-positive rate, the measured distinct-gram count, and the
    * serialized bloom filter itself. */
  def benchmarkMeta(table: String): String = s"${table}_meta"

  /** Persist a held-out benchmark's decontamination state — the
    * PRODUCTION shape of [[contaminatedBloom]]: the benchmark (eval
    * set) changes rarely while training shards arrive continuously, so
    * its distinct gram fingerprints are written ONCE as a catalog table
    * bucketed by `gram_fp` (the exact-confirm side — every later
    * shard's semi-join reads these buckets in place, shuffle-free) and
    * the bloom filter over them is trained ONCE and stored in the
    * 1-row meta table ([[benchmarkMeta]]) next to it (the prefilter
    * side — a shard reads the serialized bits back instead of
    * re-aggregating the benchmark per run). Bloom sizing is exact
    * (measured gram count), clamped to the session caps. */
  /** Crash-consistency: the meta table is the COMMIT MARKER of a store
    * (re)build — it is DROPPED first and written LAST, so a crash
    * anywhere inside the rebuild leaves a store with NO meta table and
    * [[contaminatedAgainstStore]] fails loudly instead of silently
    * checking shards against a gram table / bloom pair from two
    * different benchmark versions (a stale bloom over fresh grams would
    * false-negative exactly the newly-added benchmark grams). The
    * repair is to re-run this method. */
  def writeBenchmarkStore(evalDocs: DataFrame, textCol: String, n: Int,
                          table: String, buckets: Int,
                          fpp: Double = 0.01): Unit = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val spark = evalDocs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${benchmarkMeta(table)}`")
    graft.core.Bucketing.writeBucketed(grams(evalDocs, textCol, n),
      table, Seq("gram_fp"), buckets)
    // the written grams feed two eager actions (count + bloom agg):
    // persist across them, the contaminatedBloom convention
    val written = spark.table(table)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (nEval, numBits) = bloomSizing(written.count(), fpp)
      written
        .agg(graft.functions.Bloom.agg(col("gram_fp"), nEval, numBits)
          .as("bloom"))
        .select(lit(n).as("n"), lit(fpp).as("fpp"), lit(nEval).as("n_grams"),
          col("bloom"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(benchmarkMeta(table))
    } finally written.unpersist()
  }

  /** Decontaminate a TRAINING shard against a persisted benchmark store
    * (written by [[writeBenchmarkStore]]) — identical results to
    * [[contaminatedBloom]] over the same split, without touching the
    * benchmark's documents: the gram size and bloom bits come from the
    * meta table (a 1-row driver read), candidates bloom-prefilter
    * map-side, and the exact confirm is a semi-join whose store side
    * reads its buckets in place (PlanSpec pins it Exchange-free).
    * Per-shard cost is O(shard grams) + the (shard ∩ benchmark)-sized
    * join — never a re-tokenization or re-aggregation of the benchmark.
    *
    * Same cache-lifetime contract as [[contaminatedBloom]]: the result
    * references the persisted train-gram rows; long-lived sessions
    * release them with `spark.catalog.clearCache()` after consuming. */
  def contaminatedAgainstStore(trainDocs: DataFrame, idCol: String,
                               textCol: String, table: String): DataFrame = {
    val spark = trainDocs.sparkSession
    require(spark.catalog.tableExists(benchmarkMeta(table)),
      s"benchmark store '$table' has no meta table — a (re)build crashed " +
        "before committing; re-run writeBenchmarkStore before checking shards")
    val meta = spark.table(benchmarkMeta(table)).head()
    val n = meta.getAs[Int]("n")
    val bloomBytes = meta.getAs[Array[Byte]]("bloom")
    val trainGrams = grams(trainDocs, textCol, n, col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates =
      if (bloomBytes == null) trainGrams.filter(lit(false)) // empty benchmark
      else trainGrams.filter(
        graft.functions.Bloom.mightContain(lit(bloomBytes), col("gram_fp")))
    val shared = candidates
      .join(spark.table(table).hint("merge"), Seq("gram_fp"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    val totals = trainGrams.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    shared.join(totals, Seq(idCol))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams")).as("contamination"))
  }
}
