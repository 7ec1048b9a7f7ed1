package graft

import graft.queries.Registry

/** Physical-plan regression pins for the scale-critical queries: these
  * assert the plan SHAPE the 100 TB design depends on (broadcast dims,
  * pushed filters, top-k as TakeOrdered, no accidental cartesians), so a
  * refactor that silently degrades a plan fails CI, not the cluster.
  * Runs against sf0.001 — plan shape, not data volume, is under test. */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Registry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q13 star join broadcasts the dimension sides") {
    val p = plan("q13_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q14 semi join stays a semi join") {
    assert(plan("q14_semi_join").contains("LeftSemi"))
  }

  test("q03 scan is column-pruned to the single grouping column") {
    // q03's only row filter is post-aggregate (HAVING) — nothing is
    // pushable; the scan contract is column pruning instead
    assert(plan("q03_count_gate").contains("ReadSchema: struct<l_shipdate"))
  }

  test("x07 query-side predicate is pushed down to the parquet scan") {
    assert(plan("x07_knn_exact").contains("LessThan(vec_id,8)"))
  }

  test("q19 global top-n compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q19_top_n_global").contains("TakeOrderedAndProject"))
  }

  test("x08/x09 LSH paths have no cartesian product") {
    Seq("x08_neardup_minhash", "x09_knn_lsh").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("x07 brute force is exactly one broadcast nested loop (the intended shape)") {
    val p = plan("x07_knn_exact")
    assert(p.contains("BroadcastNestedLoopJoin")) // small query side × corpus
    assert(!p.contains("CartesianProduct"))
  }

  test("x01 exact dedup shuffles fingerprints, not document bodies") {
    // the pre-shuffle projection must not carry the text column
    val executed = Registry.queries("x01_dedup_exact")(spark, sf)
      .queryExecution.executedPlan
    val root = executed match { // unwrap AQE so collect() sees the exchanges
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val exchanges = root.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    exchanges.foreach(e =>
      assert(!e.child.output.map(_.name).contains("text")))
  }
}
