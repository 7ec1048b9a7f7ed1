package graft

import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval QUALITY of the approximate similarity paths — the check the
  * determinism oracles cannot make: x09/x13's oracles replay the same
  * LSH/IVF plan in DuckDB, so they prove the approximation is computed
  * correctly, not that it retrieves the right neighbors. This spec
  * measures recall@k of [[Similarity.lshTopK]] and [[Similarity.ivfTopK]]
  * against the exact [[Similarity.bruteForceTopK]] on the same corpus
  * and parameters as the checked queries (sf0.01, the CORRECTNESS
  * gate's scale, 32 queries).
  *
  * Two pins per path:
  *   - a COLLAPSE bound well under the measured recall (LSH 0.44, IVF
  *     0.40 at the checked queries' deliberately-cheap parameters on
  *     this synthetic data): a hashing/parameter regression that halves
  *     retrieval fails CI even while the determinism oracles stay green;
  *     the slack absorbs data refreshes.
  *   - a MONOTONICITY check along each path's recall knob, using
  *     configurations whose candidate sets are supersets BY
  *     CONSTRUCTION (finer bands over the same hyperplanes; more
  *     probed cells over the same centroids) — so the inequality is a
  *     theorem about the implementation, not a property of the data,
  *     and pins that the knob a user would turn to buy recall at 100 TB
  *     actually buys it.
  */
class RecallSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"
  private val K = 5

  private lazy val emb = graft.util.Tables.embeddings(spark, sf)
  private lazy val queries = emb.filter(col("vec_id") < 32)
  private lazy val exact = Similarity.bruteForceTopK(
    emb, queries, "vec_id", "embedding", K)

  /** Mean over queries of |approx top-k ∩ exact top-k| / k. */
  private def recallAtK(approx: DataFrame): Double = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val nQueries = exact.select("query_id").distinct().count()
    val totalHits = hits.agg(coalesce(sum("hits"), lit(0L))).head().getLong(0)
    totalHits.toDouble / (nQueries * K)
  }

  test("LSH recall@k: above the collapse bound; finer banding of the same planes only helps") {
    // x09's parameters: 16 hyperplanes as 4 bands × 4 bits
    val coarse = recallAtK(Similarity.lshTopK(emb, queries, "vec_id",
      "embedding", K, nBands = 4, bandBits = 4, dim = 64))
    // SAME 16 planes split 8 × 2: any 4-bit band match implies both its
    // 2-bit halves match, so the candidate set is a superset — recall
    // cannot drop (implementation theorem, data-independent)
    val fine = recallAtK(Similarity.lshTopK(emb, queries, "vec_id",
      "embedding", K, nBands = 8, bandBits = 2, dim = 64))
    info(f"LSH recall@$K: 4×4 bands = $coarse%.3f, 8×2 bands = $fine%.3f")
    assert(coarse >= 0.30, f"LSH recall collapsed: $coarse%.3f (expected ≥ 0.30)")
    assert(fine >= coarse,
      f"finer banding must not lose candidates: $fine%.3f < $coarse%.3f")
  }

  test("IVF recall@k: above the collapse bound; probing more cells only helps") {
    // x13's parameters: 16 cells, probe 4
    val p4 = recallAtK(Similarity.ivfTopK(emb, queries, "vec_id",
      "embedding", K, nCentroids = 16, nProbe = 4, dim = 64))
    // probing 8 of the same 16 cells examines a superset of candidates
    val p8 = recallAtK(Similarity.ivfTopK(emb, queries, "vec_id",
      "embedding", K, nCentroids = 16, nProbe = 8, dim = 64))
    info(f"IVF recall@$K: probe4 = $p4%.3f, probe8 = $p8%.3f")
    assert(p4 >= 0.30, f"IVF recall collapsed: $p4%.3f (expected ≥ 0.30)")
    assert(p8 >= p4, f"more probes must not lose candidates: $p8%.3f < $p4%.3f")
  }

  test("trained-codebook IVF: fitted k-means cells match or beat the LCG codebook") {
    // same cell/probe budget as x13's checked parameters — the only
    // change is the codebook, so the comparison isolates what training
    // buys: cells shaped by the data instead of random hypervectors
    val lcg = recallAtK(Similarity.ivfTopK(emb, queries, "vec_id",
      "embedding", K, nCentroids = 16, nProbe = 4, dim = 64))
    val codebook = graft.ext.KMeans.fit(emb, "vec_id", "embedding",
      k = 16, rounds = 2)
    val trained = recallAtK(Similarity.ivfTopKTrained(emb, queries, "vec_id",
      "embedding", K, codebook, nProbe = 4))
    // the monotonicity theorem holds for any codebook: probing more of
    // the SAME cells examines a superset of candidates
    val trained8 = recallAtK(Similarity.ivfTopKTrained(emb, queries, "vec_id",
      "embedding", K, codebook, nProbe = 8))
    info(f"IVF recall@$K: LCG probe4 = $lcg%.3f, trained probe4 = $trained%.3f, trained probe8 = $trained8%.3f")
    assert(trained >= lcg,
      f"trained codebook lost recall vs the LCG codebook: $trained%.3f < $lcg%.3f")
    assert(trained8 >= trained,
      f"more probes must not lose candidates: $trained8%.3f < $trained%.3f")
  }

  test("store-path retrieval: a trained store serves recall ≥ the LCG store at the same probe budget") {
    import graft.ext.{KMeans, LcgCellScorer, VectorStore}
    // the PRODUCTION path of the recall win: both codebooks persisted as
    // vector stores, queries served from the stores' materialized
    // assignments (topKAgainstStore) — not recomputed batch-side
    VectorStore.writeVectorStore(emb, "vec_id", "embedding",
      nCentroids = 16, dim = 64, seedOffset = 100000L,
      table = "recall_store_lcg", buckets = 8)
    val codebook = KMeans.fit(emb, "vec_id", "embedding", k = 16, rounds = 2)
    VectorStore.writeVectorStoreTrained(emb, "vec_id", "embedding",
      codebook, table = "recall_store_tr", buckets = 8)
    val lcgStore = recallAtK(VectorStore.topKAgainstStore(queries,
      "vec_id", "embedding", spark.table("recall_store_lcg"), K,
      LcgCellScorer(16, 64, 100000L), nProbe = 4))
    val trStore = recallAtK(VectorStore.topKAgainstStore(queries,
      "vec_id", "embedding", spark.table("recall_store_tr"), K,
      VectorStore.trainedScorer(spark, "recall_store_tr"), nProbe = 4))
    info(f"store-path recall@$K: LCG = $lcgStore%.3f, trained = $trStore%.3f")
    assert(trStore >= lcgStore,
      f"trained STORE lost recall vs the LCG store: $trStore%.3f < $lcgStore%.3f")
    // and the store path is exactly the batch path: serving from the
    // store's materialized cells returns bit-identical results to
    // recomputing assignment per query run
    val batch = Similarity.ivfTopKTrained(emb, queries, "vec_id",
      "embedding", K, codebook, nProbe = 4).collect().map(_.toSeq).toSet
    val served = VectorStore.topKAgainstStore(queries, "vec_id", "embedding",
      spark.table("recall_store_tr"), K,
      VectorStore.trainedScorer(spark, "recall_store_tr"), nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(served == batch,
      "store-served top-k diverged from the recomputed batch top-k")
  }
}
