package graft.sa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serving-layer analytics measures (SURVEY.md §2.3 A6-A10, §2.6 W3-W6) —
  * the dashboard capability surface of the reference
  * (`dashboard/securities_market_report1.jpg`, `…report2.jpg`): rolling
  * liquidity, daily returns, volatility, ranks, contribution shares.
  *
  * Numeric policy: sums/averages run through exact DECIMAL accumulation
  * (order-independent, so results are identical on any partitioning /
  * any engine) and only the final scalar is cast to DOUBLE. This is both
  * a correctness property (deterministic under AQE re-planning and at any
  * cluster size) and the reason these measures hash-match the DuckDB
  * oracle bit-for-bit.
  */
object Analytics {

  /** Engine-proof DOUBLE → DECIMAL(18,2) quantization. A direct
    * `CAST(double AS DECIMAL)` rounds half-way values HALF_UP in Spark
    * but HALF_EVEN in (some versions of) DuckDB, so checked queries must
    * never cast a fractional double to decimal. Instead: `floor(x·100)`
    * (tie-free, bit-identical on every engine — the multiply is one IEEE
    * op and floor of a double is exact), carried as an exact integer
    * decimal and scaled by the exact literal 0.01 — integer-only decimal
    * arithmetic end-to-end, so no rounding mode is ever exercised. Same
    * pattern as [[volatility]]'s `floor(ret·10⁶)`, which is the one
    * formulation that has passed the driver gate across engine versions.
    * Oracle-SQL twin: [[graft.queries.Sql.qdec2]].
    */
  def qdec2(c: Column): Column =
    (floor(c * 100).cast(DecimalType(16, 0)) * lit(new java.math.BigDecimal("0.01")))
      .cast(DecimalType(18, 2))

  /** [[qdec2]] for small rates (discount/tax ∈ [0,1]) → DECIMAL(3,2).
    * Oracle-SQL twin: [[graft.queries.Sql.qdec32]]. */
  def qdec32(c: Column): Column =
    (floor(c * 100).cast(DecimalType(3, 0)) * lit(new java.math.BigDecimal("0.01")))
      .cast(DecimalType(3, 2))

  /** Per-row half-up cent quantization that STAYS IN DOUBLE:
    * `floor(x·100 + 0.5) / 100.0` — three IEEE ops, identical on every
    * engine. This (not [[qdec2]]) is the form for ORACLE-VISIBLE columns:
    * the driver's compare stringifies pandas values, and a Spark parquet
    * DECIMAL arrives as `Decimal('912.10')` while DuckDB's fetchdf gives
    * float `912.1` — equal values, unequal strings (the actual root cause
    * of the r1–r3 hash-fail cluster; rounding modes were never the
    * discriminator, q19/q20 passed with the same quantizer by luck of
    * their 10 values having no trailing-zero cents). DECIMAL remains the
    * right type for order-independent ACCUMULATION ([[cents2]]); only the
    * final, oracle-visible value must be double.
    * Oracle-SQL twin: [[graft.queries.Sql.qdbl2]]. */
  def qdbl2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Exact integer cents (half-up) as DECIMAL(18,0) — the accumulation
    * form: decimal sums are exact and order-independent under any
    * partitioning/AQE re-plan. Convert the SUM (not the addends) to
    * double once at the end. Oracle-SQL twin: [[graft.queries.Sql.cents2]]. */
  def cents2(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(DecimalType(18, 0))

  /** A rate in [0,1] as an exact integer percent 0..100 (DECIMAL(3,0)) —
    * lets discount/tax products stay in exact integer arithmetic.
    * Oracle-SQL twin: [[graft.queries.Sql.pct]]. */
  def pct(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast(DecimalType(3, 0))

  /** W3: trailing N-row rolling sum/count/avg of `valueCol` per key.
    * Accumulates exact integer cents in decimal (order-independent),
    * emits DOUBLE (`Σcents → double / 100.0`, exact below 2⁵³ cents —
    * the conversion both engines agree on; see [[qdbl2]] for why no
    * decimal may leave the query). */
  def rollingRows(df: DataFrame, key: String, order: Seq[Column],
                  valueCol: String, n: Int, prefix: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    df.withColumn(s"sum_$prefix",
        sum(cents2(col(valueCol))).over(w).cast(DecimalType(38, 0)).cast("double") / lit(100.0))
      .withColumn(s"n_$prefix", count(lit(1)).over(w))
      .withColumn(s"avg_$prefix",
        col(s"sum_$prefix") / col(s"n_$prefix"))
  }

  /** W3 (calendar flavor): trailing `days`-day RANGE frame keyed on an
    * integer day number — calendar-day semantics independent of row
    * density, deterministic under ties (peers share the frame). Same
    * exact-cents-then-double policy as [[rollingRows]]. */
  def rollingDays(df: DataFrame, key: String, dayNumCol: String,
                  valueCol: String, days: Int, prefix: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(dayNumCol))
      .rangeBetween(-days, 0)
    df.withColumn(s"sum_$prefix",
        sum(cents2(col(valueCol))).over(w).cast(DecimalType(38, 0)).cast("double") / lit(100.0))
      .withColumn(s"n_$prefix", count(lit(1)).over(w))
  }

  /** W5: lag-based simple return `v / lag(v) - 1` per key (per-row double
    * arithmetic — IEEE-deterministic). A zero previous value yields a
    * NULL return, matching DuckDB's `x / 0 → NULL` (under Spark's default
    * ANSI mode a bare division would instead raise DIVIDE_BY_ZERO — the
    * data has zero values at sf0.1). Null returns are then excluded by
    * downstream volatility. */
  def lagReturn(df: DataFrame, key: String, order: Seq[Column],
                valueCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("ret",
        col(valueCol) / when(col("prev_value") === 0, lit(null)).otherwise(col("prev_value")) - 1)
  }

  /** A10: sample stddev of `ret` per key, bit-reproducible on any
    * engine/partitioning. The naive `(Σx² − (Σx)²/n)` formula suffers
    * catastrophic cancellation that amplifies even a 1-ulp difference in
    * a decimal→double cast into ~1e-9 relative error, so instead:
    * quantize returns to integers `m = round(ret,6)·10⁶`, accumulate
    * `Σm` / `Σm²` as exact integer decimals, and form the variance
    * numerator `n·Σm² − (Σm)²` EXACTLY in decimal(38,0). Only that exact
    * integer is cast to double (correctly rounded in both Spark's
    * BigDecimal and DuckDB's int128 paths → identical bits), then
    * `vol = sqrt(num / (n(n−1))) / 10⁶` with an identical IEEE operation
    * sequence on both sides. Rows with null ret are excluded; groups with
    * n<2 are dropped. */
  def volatility(returns: DataFrame, key: String, retCol: String): DataFrame = {
    // floor(ret·10⁶), not a decimal cast: floor of a double is tie-free
    // and identical on every engine, while double→decimal casts differ in
    // rounding mode (Spark HALF_UP vs DuckDB HALF_EVEN) on exact .5
    // boundaries. |ret| is bounded by the data: m fits (13,0), m² fits
    // (27,0), Σm² fits (33,0), n·Σm² and (Σm)² fit (38,0) exact.
    val m = floor(col(retCol) * lit(1000000.0)).cast(DecimalType(13, 0))
    returns.filter(col(retCol).isNotNull)
      .select(col(key), m.as("__m"))
      .groupBy(key)
      .agg(count(lit(1)).as("n_rets"),
        sum(col("__m")).cast(DecimalType(18, 0)).as("__sx"),
        sum((col("__m") * col("__m")).cast(DecimalType(33, 0))).cast(DecimalType(33, 0)).as("__sx2"))
      .filter(col("n_rets") >= 2)
      // n as DECIMAL(10,0): groups up to 1e10 returns (DECIMAL(4,0) would
      // overflow under ANSI at 10k rows/group — a 100 TB-scale cliff).
      // The product's declared type caps at decimal(38,0); the VALUES stay
      // exact (n·Σm² ≤ ~1e33 for |ret|·10⁶ ≤ 2e10 and n ≤ 1e6).
      .select(col(key), col("n_rets"),
        (sqrt((col("n_rets").cast(DecimalType(10, 0)) * col("__sx2")
            - col("__sx").cast(DecimalType(19, 0)) * col("__sx")).cast("double")
          / (col("n_rets") * (col("n_rets") - 1))) / lit(1000000.0)).as("vol"))
  }

  /** A7 scale path: approximate distinct counts via HLL++ sketches —
    * the 100 TB replacement for exact countDistinct (which must shuffle
    * every distinct value; the sketch is a few KB per group, merged
    * map-side). Deterministic for fixed data (no randomness in HLL++),
    * but sketch-dependent, so checked by error-bound tests rather than a
    * cross-engine oracle. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"approx_${cols.head}"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"approx_$c")): _*)

  /** W6 scale path: per-group top-N via a salted two-phase window.
    *
    * A single `row_number() OVER (PARTITION BY group)` puts each group's
    * ENTIRE data through one partition's sort — with few groups (q20's 3
    * return flags) that is a 3-task sort of the whole table at any scale.
    * Instead: phase 1 takes the top-N within (group, salt) — `salts`×
    * smaller sorts spread across the cluster — and phase 2 re-ranks only
    * the ≤ `salts`·n survivors per group. The global top-N of a group is
    * always contained in the union of its per-salt top-Ns, so the result
    * is IDENTICAL to the one-phase window for any total `ordering`
    * (TopNPerGroupSpec pins the equivalence on skewed data). The salt is
    * a content hash (deterministic, no rand()).
    */
  def topNPerGroup(df: DataFrame, group: Seq[String], ordering: Seq[Column],
                   n: Int, rankCol: String = "rnk", salts: Int = 32): DataFrame = {
    require(n > 0 && salts > 0)
    val saltCol = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))
    val w1 = Window.partitionBy((group.map(col) :+ saltCol): _*).orderBy(ordering: _*)
    val survivors = df.withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= n).drop("__rn1")
    val w2 = Window.partitionBy(group.map(col): _*).orderBy(ordering: _*)
    survivors.withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= n)
  }

  /** W4 scale path: global rank over a value column without the
    * single-partition sort of `rank() OVER (ORDER BY v)`.
    *
    * rank(row) = 1 + Σ counts of STRICTLY better values, so it only needs
    * per-VALUE counts: groupBy(value) → range-partition the (far smaller)
    * distinct-value table in rank order → two-pass prefix sum (partition
    * totals to the driver, then a running offset per partition — the
    * zipWithIndex shape of [[graft.dim.DimSecurity.assignDenseIds]]) →
    * join the rank back on the value. Ties share a rank and gaps follow,
    * exactly `rank()`'s semantics (RankSpec pins the equivalence).
    * Values must be non-null (rank a null-filtered frame). */
  def scalableRank(df: DataFrame, valueCol: String, ascending: Boolean = true,
                   rankCol: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    val ordered = orderedCounts(df, valueCol, ascending)
    val rdd = ordered.rdd
    val partSums = rdd.mapPartitions(it =>
      Iterator.single(it.map(_.getLong(1)).sum)).collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var before = offsets(pid)
      it.map { r =>
        val rank = before + 1L
        before += r.getLong(1)
        org.apache.spark.sql.Row(r.get(0), rank)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      ordered.schema.head,
      org.apache.spark.sql.types.StructField(rankCol,
        org.apache.spark.sql.types.LongType, nullable = false)))
    df.join(spark.createDataFrame(ranked, schema), Seq(valueCol))
  }

  /** The distributed-sort stage of [[scalableRank]] (distinct values +
    * counts, range-partitioned in rank order), exposed so PlanSpec can
    * pin its physical shape: the Exchanges must be hash (the groupBy)
    * and RANGE (the rank order) — never a SinglePartition collapse. */
  private[graft] def orderedCounts(df: DataFrame, valueCol: String,
                                   ascending: Boolean): DataFrame = {
    val order = if (ascending) col(valueCol).asc else col(valueCol).desc
    df.groupBy(valueCol).agg(count(lit(1)).as("__cnt"))
      .repartitionByRange(order).sortWithinPartitions(order)
      .select(col(valueCol), col("__cnt"))
  }

  /** A9: per-group share of total. `scaledRevenue` must be an exact
    * INTEGER-decimal expression (e.g. `cents2(price) · (100 − pct(disc))`,
    * scale 10⁴): group sums and the grand total accumulate exactly in
    * decimal (order-independent), and only the final values convert to
    * double — `rev = Σ/scale`, `share = rev / tot` with the identical op
    * sequence on both engines. The grand total is an unpartitioned window
    * sum over the GROUPED rows (group-cardinality input, not a scan). */
  /** Sessionization (gaps-and-islands): group each key's events into
    * sessions separated by quiet gaps longer than `gap` — the classic
    * warehouse form of what Structured Streaming's `session_window`
    * computes online. A new session starts where the previous event (in
    * (ts, tie-break) order — callers must pass a TOTAL order) is more
    * than `gap` behind; the session id is the running count of such
    * breaks. Shape at 100 TB: both windows partition by the key —
    * millions of small partitions, no global window anywhere.
    *
    * @return input rows plus `session_id` (1-based per key). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 order: Seq[Column], gap: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    df.withColumn("__pts", lag(col(tsCol), 1).over(w))
      .withColumn("__brk",
        when(col("__pts").isNull ||
          col(tsCol) > col("__pts") + expr(s"INTERVAL $gap"), 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__pts", "__brk")
  }

  def shareOfTotal(df: DataFrame, groupCol: String, scaledRevenue: Column,
                   scale: Double): DataFrame = {
    val grouped = df.groupBy(groupCol)
      .agg(sum(scaledRevenue).cast(DecimalType(38, 0)).as("__revs"))
    grouped
      .withColumn("__tots",
        sum(col("__revs")).over(Window.partitionBy()).cast(DecimalType(38, 0)))
      .select(col(groupCol),
        (col("__revs").cast("double") / lit(scale)).as("rev"),
        ((col("__revs").cast("double") / lit(scale)) /
          (col("__tots").cast("double") / lit(scale))).as("share"))
  }
}
