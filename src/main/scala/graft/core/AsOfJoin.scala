package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical securities-pricing lookup
  * the reference's warehouse answers with correlated `MAX(date) <= d`
  * subqueries (`/root/reference/dags/sql/8. extract_to_csv.sql` reads the
  * fact table per-date; the dashboards' "price as of" cards are this
  * shape): for each probe row, attach the latest quote row of the same
  * key whose time is `<=` the probe's time (inclusive), with a
  * deterministic tie-break.
  *
  * Spark has no ASOF JOIN operator, and the naive formulations collapse
  * at scale: a theta-join `q.ts <= p.ts` is a BroadcastNestedLoopJoin
  * (O(|P|·|Q|) per key), and a per-probe `max_by` subquery re-scans the
  * quote side. Instead this is the standard distributed formulation:
  * UNION the tagged sides, hash-shuffle ONCE on the key, sort each
  * partition by (time, side, tie-break), and carry the most recent quote
  * forward with a running `last(_, ignoreNulls)` frame. Cost: one
  * shuffle + one sort — the same as a single window aggregate, and it
  * scales per-key (AQE's skew handling splits oversized key partitions;
  * a hot key's sort is the residual cost, as with any per-key window).
  *
  * Quote columns are carried through ONE struct (row-atomic: the probe
  * sees one coherent quote row, never a column-wise mix of quotes, even
  * when some quote attributes are null). At equal times the quote is
  * visible to the probe (inclusive semantics, quote sorts first) and the
  * greatest `tieBreak` among same-instant quotes wins.
  */
object AsOfJoin {

  /** @param probes   left side; all its columns are preserved
    * @param quotes   right side; must contain `keys`, `quoteTime`,
    *                 `tieBreak`, and every `carry` column
    * @param keys     equi-join key columns (same names on both sides)
    * @param probeTime probe-side event-time column (same orderable type
    *                 as `quoteTime`)
    * @param quoteTime quote-side event-time column
    * @param tieBreak quote column breaking same-instant ties (greatest
    *                 wins — "latest ingested quote", matching
    *                 [[Dedup.latestIngestWins]]'s winner orientation)
    * @param carry    quote columns to attach, emitted as `<prefix><name>`
    *                 (null when no quote precedes the probe)
    */
  def asOf(probes: DataFrame, quotes: DataFrame, keys: Seq[String],
           probeTime: String, quoteTime: String, tieBreak: String,
           carry: Seq[String], prefix: String = "quote_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(carry.nonEmpty, "nothing to carry from the quote side")
    val q = quotes.select(
      keys.map(col) ++ Seq(
        col(quoteTime).as("__ao_t"),
        col(tieBreak).as("__ao_tb"),
        struct(carry.map(col): _*).as("__ao_q"),
        lit(0).as("__ao_side")): _*)
    val p = probes
      .withColumn("__ao_t", col(probeTime))
      .withColumn("__ao_side", lit(1))
    // missing columns (probe payload on quote rows, __ao_q/__ao_tb on
    // probe rows) become nulls — exactly the "no value from this side"
    // encoding the running frame below relies on
    val unioned = p.unionByName(q, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ao_t"), col("__ao_side"), col("__ao_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__ao_last", last(col("__ao_q"), ignoreNulls = true).over(w))
      .filter(col("__ao_side") === 1)
    carry.foldLeft(attached) { (df, c) =>
      df.withColumn(s"$prefix$c", col(s"__ao_last.$c"))
    }.drop("__ao_t", "__ao_tb", "__ao_q", "__ao_side", "__ao_last")
  }
}
