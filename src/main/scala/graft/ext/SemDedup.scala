package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup shape, Abbas et al. 2023):
  * cluster the corpus embeddings with k-means, then find
  * high-cosine pairs ONLY within each cluster and drop every document
  * that has a smaller-id cluster-mate above the threshold. The cluster
  * stage is what makes this a 100 TB operator: candidate generation is
  * an equi-join on the cluster id, so the comparison count is
  * Σ|cluster|² instead of N² — the operator's cost is controlled by
  * picking k so that the expected cluster size N/k stays bounded as the
  * corpus grows (the paper runs ~10⁵ clusters over 10⁸ docs; here k is
  * a parameter, and AQE's skew-join split handles an oversized cluster
  * the same way it handles any skewed shuffle key).
  *
  * Everything downstream of the clustering is exact and engine-portable:
  * the k-means is [[KMeans.lloyd]]'s integer-exact variant
  * (deterministic under any partitioning — the x23 oracle replays it
  * bit-for-bit), and the in-cluster scoring is the same sequential-fold
  * cosine as [[Similarity]] (native codegen'd, bit-identical to the
  * DuckDB fold). The keep rule is greedy-by-id first-wins — one pass,
  * no iteration: a doc is dropped iff SOME smaller-id doc in its
  * cluster is within the threshold, whether or not that doc itself
  * survives (the same convention as passage dedup's global first-wins,
  * [[PassageDedup]], and a deterministic stand-in for the paper's
  * keep-one-random-per-group).
  *
  * Reference ties: the reference pipeline dedups on exact business keys
  * (`dags/sql/4. merge_core.sql:83-84`'s MERGE key); semantic near-dup
  * is the
  * embedding-space generalization its training-data users need.
  */
object SemDedup {

  /** Per-document verdicts: `(id, cluster, kept, dup_of)` where
    * `dup_of` is the smallest-id cluster-mate with cosine ≥
    * `minCosine` (null ⇒ `kept`). `k`/`rounds` parameterize the
    * clustering exactly as [[KMeans.lloyd]].
    *
    * `maxClusterDocs > 0` excludes clusters LARGER than that many docs
    * from pair generation entirely (their members are all kept) — the
    * same hard ceiling on per-key quadratic join work as
    * [[MinHash.candidatePairs]]'s hot-bucket cap. A blown-up cluster
    * means k is too small for the corpus (the paper re-clusters such
    * clusters); the cap converts that misconfiguration from a runaway
    * shuffle into a bounded, observable recall loss. 0 (the default)
    * disables the cap; the x38 oracle-checked configuration engages it
    * at `ceil(1.05 · N/k)` so the guard is exercised, not just
    * available.
    */
  def verdicts(vecs: DataFrame, idCol: String, embCol: String,
               k: Int, rounds: Int, minCosine: Double,
               maxClusterDocs: Int = 0): DataFrame = {
    // the assignment feeds the pair join (twice, as both self-join
    // sides), the optional size guard, and the final verdict join —
    // persist the narrow (id, cluster) rows so the k-means rounds run
    // once, not once per consumer (MinHash cache contract: released by
    // `spark.catalog.clearCache()`)
    val assigned = KMeans.lloyd(vecs, idCol, embCol, k, rounds)
      .select(col(idCol), col("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = vecs.select(col(idCol), col(embCol)).join(assigned, idCol)
    val paired =
      if (maxClusterDocs > 0) {
        val sizes = assigned.groupBy("cluster")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxClusterDocs)
          .select("cluster")
        v.join(sizes, Seq("cluster"), "left_semi")
      } else v
    // in-cluster candidate pairs: equi-join on the cluster id (never a
    // cartesian), scored with the exact native cosine
    val a = paired.select(col(idCol).as("id_a"), col(embCol).as("ea"),
      col("cluster").as("ca"))
    val b = paired.select(col(idCol).as("id_b"), col(embCol).as("eb"),
      col("cluster").as("cb"))
    val dropped = a.join(b, col("ca") === col("cb") && col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("ea"), col("eb")) >= minCosine)
      .groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("dup_of"))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }
}
