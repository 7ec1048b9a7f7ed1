package graft.dim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: maintain full attribute history
  * with `effective_from` / `effective_to` validity ranges — the
  * standard warehouse extension of the reference's insert-only
  * dimension maintenance (`dags/sql/5. merge_dim_security.sql:17-36`
  * tracks only the CURRENT attribute row; SCD2 keeps every version).
  *
  * Open rows carry `effective_to` = 9999-12-31 (a high-date sentinel
  * rather than NULL, so range predicates and engine-portable orderings
  * need no null handling). Applying a snapshot:
  *   - key in both, attributes equal   → open row unchanged;
  *   - key in both, attributes differ  → close the open row at the
  *     snapshot date and append a new open version;
  *   - key only in history             → unchanged (no delete handling);
  *   - key only in snapshot            → new open version.
  * Closed rows always pass through untouched.
  *
  * Shape at 100 TB: one hash equi-join of the OPEN slice against the
  * snapshot on the dimension key plus a union — no window, no skew
  * (dimension keys are unique on both sides), and the closed majority
  * of the history never moves. The attribute comparison is an explicit
  * column-wise equality (null-safe), not a hash, so it is exact and
  * oracle-portable.
  */
object Scd2 {

  val OpenDate = "9999-12-31"

  /** Seed a history table from a first snapshot: every row open. */
  def init(snapshot: DataFrame, fromDate: String): DataFrame =
    snapshot
      .withColumn("effective_from", lit(fromDate).cast("date"))
      .withColumn("effective_to", lit(OpenDate).cast("date"))

  /** Apply `snapshot` (one row per key, attribute columns only) to
    * `history` as of `snapDate`. */
  def apply(history: DataFrame, snapshot: DataFrame, keyCols: Seq[String],
            attrCols: Seq[String], snapDate: String): DataFrame = {
    val open = history.filter(col("effective_to") === lit(OpenDate).cast("date"))
    val closed = history.filter(col("effective_to") =!= lit(OpenDate).cast("date"))
    val snap = snapshot.select((keyCols ++ attrCols).map(col): _*)

    val changedPred = attrCols
      .map(a => !(col(s"o.$a") <=> col(s"n.$a")))
      .reduce(_ || _)
    val joined = open.alias("o").join(snap.alias("n"),
      keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _), "full_outer")

    val keyPresentOld = col(s"o.${keyCols.head}").isNotNull
    val keyPresentNew = col(s"n.${keyCols.head}").isNotNull

    // open rows that survive unchanged (unmatched, or matched-equal)
    val carried = joined.filter(keyPresentOld && (!keyPresentNew || !changedPred))
      .select(open.columns.map(c => col(s"o.$c").as(c)): _*)
    // open rows closed out by a changed snapshot version
    val closedOut = joined.filter(keyPresentOld && keyPresentNew && changedPred)
      .select(open.columns.map(c =>
        (if (c == "effective_to") lit(snapDate).cast("date") else col(s"o.$c")).as(c)): _*)
    // new versions: changed keys + brand-new keys
    val opened = joined.filter(keyPresentNew && (!keyPresentOld || changedPred))
      .select((keyCols ++ attrCols).map(c => col(s"n.$c").as(c)): _*)
      .withColumn("effective_from", lit(snapDate).cast("date"))
      .withColumn("effective_to", lit(OpenDate).cast("date"))
      .select(open.columns.map(col): _*)

    closed.unionByName(carried).unionByName(closedOut).unionByName(opened)
  }
}
