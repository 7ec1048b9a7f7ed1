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
  * join-per-round shape, fewer rounds — implemented here as
  * [[connectedComponentsStars]] (same interface and output contract,
  * StarCcSpec pins agreement with the propagation form), so the
  * planet-scale swap is a demonstrated one-line change, not a claim.
  */
object DupClusters {

  /** (doc_id, canonical_id) for every document that appears in at least
    * one pair; canonical_id = min doc id reachable through the dup
    * graph. Docs with no duplicates are absent (their canonical is
    * themselves by definition).
    *
    * Throws `IllegalStateException` if the graph has not converged
    * within `maxIters` rounds (a component whose diameter exceeds the
    * budget — e.g. a duplicate CHAIN longer than `maxIters` links):
    * returning the partial labels would silently split one cluster into
    * several, which downstream dedup would never detect. For graphs
    * where long chains are plausible, use
    * [[connectedComponentsStars]] — its round count is polylog in
    * component size, not linear in diameter (StarCcSpec demonstrates a
    * 200-link chain resolving in ≤ 12 star rounds, where propagation
    * needs 200). */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIters: Int = 25): DataFrame = {
    val fwd = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val edges = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // one propagation round: min neighbor label per node (one join + one
    // aggregation), returning the new labels and how many changed
    def step(lbl: DataFrame): (DataFrame, Long) = {
      val nbrMin = edges
        .join(lbl.select(col("id").as("v"), col("label").as("nl")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val updated = lbl.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true) // cut lineage: plan stays one-round deep
      val n = updated.join(lbl.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      (updated, n)
    }
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxIters) {
      val (updated, n) = step(labels)
      labels = updated
      changed = n
      rounds += 1
    }
    if (changed > 0) {
      // round maxIters still reported changes, but it may have been the
      // COMPLETING round (the loop never observes the confirming
      // zero-change pass): one verification round distinguishes
      // exact-at-budget convergence from genuine non-convergence
      val (updated, n) = step(labels)
      labels = updated
      changed = n
    }
    edges.unpersist()
    if (changed > 0) throw new IllegalStateException(
      s"label propagation did not converge in $maxIters rounds " +
        s"($changed labels still changing) — a component's diameter " +
        "exceeds the budget; raise maxIters or use connectedComponentsStars")
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }

  /** [[connectedComponents]] via the alternating large-star/small-star
    * algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    * and Beyond", §3 Two-Phase): the planet-scale form. Label
    * propagation needs one round per graph-DIAMETER hop; the star
    * operations contract whole subtrees per round, converging in
    * O(log²) rounds on adversarial chains — the difference between 4
    * rounds and 40 on a crawl graph with long duplicate chains. Same
    * output contract as [[connectedComponents]].
    *
    * Each operation is one groupBy-min plus one equi-join over the pair
    * graph, every edge oriented larger→smaller throughout:
    *   - large-star connects every neighbor v > u to m(u) = min of u's
    *     closed neighborhood;
    *   - small-star connects every neighbor v < u (and u itself) to the
    *     smallest such neighbor.
    * Both preserve connectivity and strictly shrink tree height until
    * the component is a star (child, root) edge set — detected as a
    * fixed point of the composed round (count + set equality), at which
    * point children point at the component minimum and roots label
    * themselves. */
  def connectedComponentsStars(pairs: DataFrame, aCol: String = "doc_a",
                               bCol: String = "doc_b",
                               maxIters: Int = 50): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min(col("v")).as("m"))
      val rewired = e.join(mins, "u")
      rewired.select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .union(rewired.select(col("u"), col("m").as("v")))
        .distinct()
    }
    // materialize the normalized pair set ONCE (upstream `pairs` is
    // typically a shuffle-heavy candidate pipeline — band self-join +
    // distinct + signature joins): both the initial edge set and the
    // final node list derive from this checkpoint, so the pipeline never
    // re-executes. Self-pairs survive to here (they carry nodes whose
    // only pair is a self-pair) and drop only from the edge set.
    val base = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .distinct()
      .localCheckpoint(true)
    var edges = base.filter(col("u") =!= col("v"))
    var rounds = 0
    var converged = false
    // carried across rounds: each round's edge count is next round's
    // previous count, so the loop pays ONE count job per round instead
    // of two (round 22, guide §1.2 — the loop is driver-sequential and
    // every job in it is wall-clock)
    var edgeCount = -1L
    while (!converged && rounds < maxIters) {
      if (edgeCount < 0) edgeCount = edges.count()
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edges = next
      edgeCount = nextCount
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"star rounds did not converge in $maxIters iterations — " +
        "raise maxIters (round count is polylog in component size)")
    // label every node of the ORIGINAL pair graph ([[connectedComponents]]'s
    // contract): star children take their root, everything else — roots
    // and nodes whose only pair was a self-pair — labels itself. Nodes
    // come from the materialized `base`, not the raw `pairs` plan, so
    // the candidate pipeline runs exactly once.
    val nodes = base.select(col("u").as("doc_id"))
      .union(base.select(col("v").as("doc_id"))).distinct()
    nodes.join(edges.select(col("u").as("doc_id"), col("v").as("__root")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__root"), col("doc_id")).as("canonical_id"))
  }

  /** QUALITY-AWARE canonicalization of near-dup clusters — the
    * published keep-the-best-duplicate heuristic (near-dup web pages
    * keep the LONGEST member, since truncated/stripped re-crawls are
    * the common duplicate form; any quality score works — token count,
    * an LM score, a rule-gate pass count): remap every cluster's
    * canonical from the structural min id to its highest-quality
    * member, id breaking quality ties and null-quality members sorting
    * LAST (the [[ExactDedup.dedupWithPriority]] nulls-last
    * convention — a member missing from the quality frame must not win
    * by accident of null ordering).
    *
    * Shape at 100 TB: `clusters` is dup-pair-sized, not corpus-sized;
    * one id-keyed join attaches the quality, one map-side-combined
    * `min(struct)` per cluster finds the winner, one cluster-keyed
    * join-back remaps — only (id, cluster id, quality) rows shuffle.
    *
    * @return the remapped (doc_id, canonical_id) — same shape as
    *         [[connectedComponentsStars]], winner's own row included. */
  def canonicalByQuality(clusters: DataFrame, quality: DataFrame,
                         idCol: String, qCol: String): DataFrame = {
    val q = quality.select(col(idCol).as("doc_id"), col(qCol).as("__q"))
    val joined = clusters.join(q, Seq("doc_id"), "left")
    // argmax in two aggregations instead of min(struct(-q, id)):
    // negating an integer quality overflows at Long.MinValue (it
    // negates to ITSELF and would sort the worst member first), so
    // find the max quality per cluster, then the min id among the
    // members carrying it. max() ignores nulls, so a mixed cluster's
    // null-quality members can never win; the null-safe <=> keeps the
    // all-null cluster working (its max is null and every member ties,
    // falling to the id tie-break).
    val best = joined.groupBy("canonical_id").agg(max(col("__q")).as("__bq"))
    val winners = joined.join(best, Seq("canonical_id"))
      .filter(col("__q") <=> col("__bq"))
      .groupBy("canonical_id").agg(min(col("doc_id")).as("__win"))
    clusters.join(winners, Seq("canonical_id"))
      .select(col("doc_id"), col("__win").as("canonical_id"))
  }
}
