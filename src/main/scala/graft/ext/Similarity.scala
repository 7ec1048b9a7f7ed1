package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`, or
  * `array<double>` for computed embeddings such as the multimodal
  * feature bridge — [[graft.functions.CosineSimilarity]] and
  * [[graft.functions.NearestCentroid]] dispatch on the element type):
  * exact brute-force cosine top-k as the baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * All arithmetic is pure `Column` expressions (higher-order functions,
  * no UDFs) and is engine-portable bit-for-bit:
  *   - each `float * float` product is computed in DOUBLE (exact: 24-bit
  *     mantissas multiply into 48 bits < 53);
  *   - array sums are sequential left-to-right folds (`aggregate` HOF),
  *     matching DuckDB's `list_sum(list_transform(...))` fold order —
  *     verified bit-identical;
  *   - the LSH hyperplanes are derived from an integer LCG, so both
  *     engines construct the exact same planes.
  *
  * Scale shape: the brute-force path is a broadcast nested-loop of a
  * SMALL query set against the corpus — O(|Q|·N) work with no shuffle of
  * the corpus, the honest exact baseline. The LSH path replaces the
  * nested loop with an equi-join on (band, signature) keys: corpus and
  * queries are both hashed to buckets and only bucket-mates are compared,
  * so the plan is a hash join + re-rank, never a cartesian product.
  */
object Similarity {

  /** Sequential-fold dot product of two float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm (sequential fold, double). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with the exact operation sequence
    * `dot / (sqrt(na) * sqrt(nb))` — keep this shape mirrored in any
    * oracle SQL so the IEEE rounding steps are identical. Delegates to
    * the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression (same fold order bit-for-bit; the HOF formulation
    * `dot(a,b) / (norm(a) * norm(b))` is ~50× slower interpreted). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Exact cosine top-k of each query vector against the corpus.
    * `queries` must be small (it is broadcast); self-matches (same id)
    * are excluded. Output: (query_id, rank, neighbor_id, sim), rank 1..k
    * with ties broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("__qe"), col(embCol)).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Deterministic pseudo-random value in [-1, 1): a 31-bit LCG on an
    * integer index, exact in both Spark and DuckDB int64 arithmetic (and
    * the final scaling is exact in double: numerator and denominator are
    * < 2^31). */
  private def lcgUnit(k: Column): Column =
    ((lit(1103515245L) * k + lit(12345L)) % lit(2147483648L)).cast("double") /
      lit(2147483648.0) * 2.0 - 1.0

  /** Random-hyperplane signature: `nPlanes` sign bits of the dot product
    * with LCG-derived hyperplanes. A sign bit flips across engines only
    * if a dot product lands within 1 ulp of exactly 0 — and here both
    * engines produce bit-identical dots, so the signatures match exactly.
    * Computed by the native fused [[graft.functions.HyperplaneSig]]
    * (bit-parity with [[hyperplaneSignatureHof]] pinned by spec). */
  def hyperplaneSignature(emb: Column, nPlanes: Int, dim: Int): Column =
    graft.functions.HyperplaneSig(emb, nPlanes, dim)

  /** The interpreted HOF formulation hyperplaneSignature replaced — kept
    * as the readable semantic spec and the parity-test reference. */
  private[graft] def hyperplaneSignatureHof(emb: Column, nPlanes: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val terms = zip_with(emb, sequence(lit(0), lit(dim - 1)),
        (x, j) => x.cast("double") *
          lcgUnit(p.cast("long") * dim + j.cast("long")))
      when(aggregate(terms, lit(0.0), (acc, t) => acc + t) >= 0, 1).otherwise(0)
    })

  /** (id, band, band_key) rows: the signature split into `nBands` bands
    * of `bandBits` bits each, packed into a small int key. Exploded shape
    * so candidate generation is a plain equi-join on (band, band_key). */
  def bandedSignatures(df: DataFrame, idCol: String, embCol: String,
                       nBands: Int, bandBits: Int, dim: Int): DataFrame = {
    val sig = hyperplaneSignature(col(embCol), nBands * bandBits, dim)
    val bandKeys = transform(sequence(lit(0), lit(nBands - 1)), b =>
      aggregate(sequence(lit(0), lit(bandBits - 1)), lit(0),
        (acc, i) => acc * 2 + element_at(col("__sig"), b * bandBits + i + 1)))
    df.withColumn("__sig", sig)
      .select(col(idCol), posexplode(bandKeys).as(Seq("band", "band_key")))
  }

  /** LSH-bucketed approximate top-k: candidates are corpus vectors that
    * share at least one (band, band_key) bucket with the query; exact
    * cosine re-rank within candidates. The physical plan is
    * hash-join-shaped (broadcast of the small query band table), with no
    * cartesian product — the 100 TB path. Recall is tunable via
    * nBands × bandBits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, embCol: String, k: Int,
              nBands: Int, bandBits: Int, dim: Int): DataFrame = {
    val corpusBands = bandedSignatures(corpus, idCol, embCol, nBands, bandBits, dim)
    val queryBands = bandedSignatures(queries, idCol, embCol, nBands, bandBits, dim)
      .withColumnRenamed(idCol, "query_id")
    val candidates = corpusBands
      .join(broadcast(queryBands), Seq("band", "band_key"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"))
      .distinct()
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"))
    val scored = candidates
      .join(broadcast(q), "query_id")
      .join(c, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qe"), col("__ce")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Per-centroid cosine scores against `nCentroids` LCG-derived coarse
    * centroids (IVF's codebook, made deterministic and engine-portable —
    * a trained k-means codebook drops in by replacing `w`). Element k =
    * dot(v, c_k) / ‖c_k‖ — a monotone proxy for cosine since ‖v‖ is
    * constant within a row. */
  def centroidScores(emb: Column, nCentroids: Int, dim: Int,
                     seedOffset: Long): Column =
    transform(sequence(lit(0), lit(nCentroids - 1)), k => {
      def w(j: Column): Column =
        lcgUnit(lit(seedOffset) + k.cast("long") * dim + j.cast("long"))
      val dotC = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, j) => x.cast("double") * w(j)),
        lit(0.0), (acc, t) => acc + t)
      val normC = sqrt(aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, j) => acc + w(j) * w(j)))
      dotC / normC
    })

  /** IVF-style approximate top-k: the second scale path next to
    * [[lshTopK]]. Corpus vectors are assigned to their nearest coarse
    * centroid (narrow, per-row); each query probes its `nProbe` best
    * centroids; candidates are the corpus vectors in probed cells; exact
    * cosine re-ranks. The plan is a broadcast hash join on the centroid
    * id — at 100 TB the corpus side would additionally be PARTITIONED BY
    * centroid so a probe prunes file partitions instead of scanning. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, embCol: String, k: Int,
              nCentroids: Int, nProbe: Int, dim: Int,
              seedOffset: Long = 100000L): DataFrame =
    ivfTopKWith(corpus, queries, idCol, embCol, k,
      LcgCellScorer(nCentroids, dim, seedOffset), nProbe)

  /** [[ivfTopK]] with a TRAINED codebook: the deterministic LCG
    * centroids are replaced by fitted k-means centroids
    * ([[KMeans.fit]]) — the "a trained codebook drops in" contract,
    * proven rather than claimed (RecallSpec pins recall@k ≥ the LCG
    * codebook's at the same cell/probe budget). Cells are scored by
    * exact integer L2 in the quantized domain ([[KMeans.quantize]] —
    * the same arithmetic the trainer used, so assignment is
    * bit-faithful to [[KMeans.lloyd]]'s, ties to the lowest cell).
    *
    * The codebook is collected driver-side (k·dim longs — algorithm
    * state, the same broadcast convention as [[KMeans]]' assignment
    * rounds) into ONE codegen reference object
    * ([[graft.functions.TrainedCellDists]]), so corpus-side assignment
    * stays a narrow per-row expression AND plan size stays O(1) in k —
    * no per-centroid literals, no join, no shuffle beyond the candidate
    * equi-join itself: exactly the [[ivfTopK]] plan with a different
    * scorer, viable at IVF-realistic k (thousands of cells). Cells are
    * indexed positionally in `cid` order (training may drop empty
    * clusters); both sides use the same indexing. */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame,
                     idCol: String, embCol: String, k: Int,
                     centroids: DataFrame, nProbe: Int): DataFrame =
    ivfTopKWith(corpus, queries, idCol, embCol, k,
      TrainedCellScorer.fromCodebook(centroids), nProbe)

  /** The shared IVF top-k core, parameterized by the coarse-quantizer
    * seam ([[CellScorer]]): per-row corpus assignment, query-side probe
    * ranking (best `nProbe` cells in the scorer's order, ties to the
    * lowest cell), candidate generation via a broadcast equi-join on the
    * cell id, exact-cosine re-rank. */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame,
                  idCol: String, embCol: String, k: Int,
                  scorer: CellScorer, nProbe: Int): DataFrame = {
    val assigned = corpus.withColumn("__centroid", scorer.cell(col(embCol)))
    // probe selection is one codegen'd expression + a narrow explode
    // (CellScorer.topCells — no k-wide score explode, no Window); the
    // query side is small by contract, but the same machinery serves
    // the shard side of VectorStore.dedupAgainstStoreWith, which scales
    val probes = queries
      .select(col(idCol).as("query_id"), col(embCol).as("__qe"),
        explode(scorer.topCells(col(embCol), nProbe)).as("__centroid"))
    val scored = assigned.join(broadcast(probes), Seq("__centroid"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("__qe"), col(embCol)).as("sim"))
      .distinct() // a neighbor can sit in several probed cells
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-dup over the WHOLE corpus (no query set):
    * candidate pairs share at least one LSH band; exact cosine confirms
    * against `minCosine`. The self-join on (band, band_key) replaces the
    * O(N²) all-pairs comparison — the only wide ops are one shuffle join
    * on band keys and the id-joins to fetch vectors. Recall is the LSH
    * trade-off and is tunable via nBands × bandBits.
    * `maxBandDocs` — see [[MinHash.candidatePairs]] (hot-bucket cap;
    * 0 = off). */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
                   minCosine: Double, nBands: Int, bandBits: Int,
                   dim: Int, maxBandDocs: Int = 0): DataFrame = {
    val bands = bandedSignatures(corpus, idCol, embCol, nBands, bandBits, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = MinHash.candidatePairs(bands, idCol, maxBandDocs)
      .withColumnRenamed("doc_a", "vec_a").withColumnRenamed("doc_b", "vec_b")
    pairs
      .join(corpus.select(col(idCol).as("vec_a"), col(embCol).as("__ea")), "vec_a")
      .join(corpus.select(col(idCol).as("vec_b"), col(embCol).as("__eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosine(col("__ea"), col("__eb")).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
