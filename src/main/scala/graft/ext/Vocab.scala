package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Frequency-based vocabulary build + out-of-vocabulary rates — the
  * relational core of tokenizer training: the top-K corpus terms by
  * total count (deterministic tie-break on the term itself) form the
  * vocabulary, and every document is scored by the fraction of its
  * token occurrences falling outside it (the signal used to spot
  * domain shift / junk before spending GPU time on a shard).
  *
  * Shape at 100 TB: term counts are map-side-combined into a (doc,
  * term) and then a term aggregate; the top-K cut is a TakeOrdered (K
  * rows to the driver plan, never a global sort); the vocabulary —
  * K rows — broadcasts back against the per-doc term counts, so the
  * corpus-sized side never shuffles for the membership test.
  */
object Vocab {

  /** Top-K corpus vocabulary: (term, cnt), ordered by count desc then
    * term asc — a total order, so the cut is deterministic. */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)

  /** VOCABULARY COVERAGE CURVE — the Zipf analysis that sizes a
    * tokenizer's vocabulary (every tokenizer-training writeup plots
    * it: what fraction of all token OCCURRENCES does the top-k
    * vocabulary cover, for a grid of k — the knee of that curve is
    * where another 10× of vocab stops buying coverage). One row per
    * requested k: `(k, n_terms = min(k, |vocab|), covered, total,
    * coverage)` with `covered`/`total` exact int64 occurrence counts
    * and `coverage` one correctly rounded division.
    *
    * Scale shape: term counts are one map-side-combined aggregate;
    * the cumulative-occurrence ranking is the [[Packing.packSequences]]
    * DISTRIBUTED prefix sum over the (cnt desc, term) range order —
    * a RANGE exchange + two narrow passes with one count-per-partition
    * driver array, never a single-partition window (a 10⁹-term
    * vocabulary must rank in parallel); the curve assembly reads only
    * the |ks| boundary rows. The ranked frame is persisted across the
    * two passes for the same determinism reason Packing documents
    * (both passes must see identical partition contents), and released
    * before returning — the result is the collected boundary rows
    * re-parallelized (|ks| rows, driver-sized by construction). */
  def coverageCurve(docs: DataFrame, textCol: String,
                    ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      s"ks must be non-empty positive vocabulary sizes, got $ks")
    val spark = docs.sparkSession
    val counts = docs
      .select(explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .select(col("term"), col("cnt"))
      .repartitionByRange(col("cnt").desc, col("term").asc)
      .sortWithinPartitions(col("cnt").desc, col("term").asc)
    val cached = counts.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rdd = cached.rdd
      // pass 1: per-partition (row count, occurrence mass)
      val partStats = rdd.mapPartitions { it =>
        var rows = 0L; var mass = 0L
        it.foreach { r => rows += 1; mass += r.getLong(1) }
        Iterator.single((rows, mass))
      }.collect()
      val rankBefore = partStats.map(_._1).scanLeft(0L)(_ + _)
      val massBefore = partStats.map(_._2).scanLeft(0L)(_ + _)
      val totalTerms = partStats.map(_._1).sum
      val totalMass = partStats.map(_._2).sum
      // pass 2: (rank, cumulative occurrences) per term, narrow
      val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
        var rank = rankBefore(pid)
        var cum = massBefore(pid)
        it.map { r =>
          rank += 1; cum += r.getLong(1)
          Row(rank, cum)
        }
      }
      // the curve reads ONE boundary row per k: rank = min(k, |vocab|)
      val boundaries = ks.map(k => math.min(k.toLong, totalTerms)).toSet
      val hit = ranked.filter(r => boundaries.contains(r.getLong(0)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val s2 = spark
      import s2.implicits._
      ks.map { k =>
        val b = math.min(k.toLong, totalTerms)
        val covered = if (b == 0L) 0L else hit(b)
        (k, b, covered, totalMass,
          if (totalMass == 0L) 0.0 else covered.toDouble / totalMass.toDouble)
      }.toDF("k", "n_terms", "covered", "total", "coverage")
    } finally cached.unpersist()
  }

  /** Per-doc OOV occurrence fraction against the top-K vocabulary.
    * @return (id, n_tokens, n_oov, oov_rate); tokenless docs get 0s. */
  def oovRates(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(TextAnalysis.wordTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("n"))
    // the vocabulary derives from the SAME (doc, term) counts — one
    // tokenize+explode of the corpus, not two (the corpus-proportional
    // stage must not run twice for one answer)
    val vocab = counts.groupBy("term").agg(sum("n").as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .select(col("term"), lit(1).as("in_vocab"))
    val perDoc = counts
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(idCol)
      .agg(sum("n").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("n")).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }
}
