package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (the output of
  * [[MinHash.nearDupPairs]] / [[SimHash.nearDupPairs]] /
  * [[Similarity.nearDupPairs]]) into connected components with a
  * canonical document per cluster — the step a real dedup pipeline needs
  * before it can keep one representative per duplicate group ("keep
  * min-id, drop the rest").
  *
  * Algorithm: minimum-label propagation. Every node starts labeled with
  * itself; each round every node takes the min of its own label and its
  * neighbors' labels; stop when a round changes nothing. Rounds needed =
  * graph diameter ≤ cluster size — near-dup clusters are shallow (dup
  * groups of a few docs), so this converges in 2-4 rounds in practice,
  * and `maxIters` bounds pathological chains.
  *
  * Scale shape: each round is one equi-join of the label table with the
  * edge list plus a groupBy-min — hash-shuffle work proportional to the
  * CANDIDATE-PAIR graph (tiny next to the corpus), never to the corpus
  * itself. Each round's labels are materialized via `localCheckpoint`
  * so the iterative plan does not grow with rounds (the classic
  * iterative-algorithm lineage trap). For planet-scale graphs swap in
  * the large-star/small-star formulation (Kiveris et al.) — same
  * join-per-round shape, fewer rounds.
  */
object DupClusters {

  /** (doc_id, canonical_id) for every document that appears in at least
    * one pair; canonical_id = min doc id reachable through the dup
    * graph. Docs with no duplicates are absent (their canonical is
    * themselves by definition). */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIters: Int = 25): DataFrame = {
    val fwd = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val edges = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxIters) {
      // min neighbor label per node, one join + one aggregation
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("label").as("nl")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true) // cut lineage: plan stays one-round deep
      changed = updated.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      labels = updated
      rounds += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }
}
