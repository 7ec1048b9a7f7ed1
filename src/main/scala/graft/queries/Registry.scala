package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One checked query: a Spark DataFrame program over a testdata
  * scale-factor directory, plus (when SQL-expressible) an equivalent ANSI
  * SQL text the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism contract (so the driver's hash compare is exact):
  *   - every query ends in a TOTAL ORDER BY (unique tie-break key);
  *   - no floating-point reduction whose result depends on summation
  *     order: sums/averages go through exact DECIMAL arithmetic and only
  *     then cast to DOUBLE; per-row double arithmetic (IEEE-deterministic)
  *     is fine;
  *   - NO DECIMAL (and no nano-precision) column is oracle-visible: the
  *     driver compares pandas string representations, where a Spark
  *     parquet decimal (`Decimal('912.10')`) and a DuckDB decimal
  *     (float64 `912.1`) stringify differently despite equal values, and
  *     DuckDB truncates nano timestamps to µs at read. Final outputs are
  *     DOUBLE / BIGINT / STRING / DATE / BOOLEAN, temporal arithmetic at
  *     µs granularity on both sides (see [[Sql.qdbl2]]/[[Sql.dbl]]);
  *   - aggregate/computed columns carry identical aliases and explicit
  *     CASTs on both sides (the driver compares by column name + value
  *     hash);
  *   - no wall-clock or random values.
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

/** DuckDB-SQL twins of the engine-proof quantizers in
  * [[graft.sa.Analytics]] — interpolated into oracle texts so the Spark
  * and oracle sides can never drift. See [[graft.sa.Analytics.qdec2]]
  * for why checked queries must not cast fractional doubles to decimal.
  */
object Sql {
  /** floor(x·100)·0.01 as DECIMAL(18,2) — twin of `Analytics.qdec2`.
    * `floor` of a double is an integer-valued double, so the inner
    * decimal cast is exact (no rounding mode exercised). */
  def qdec2(x: String): String =
    s"CAST(CAST(floor(($x) * 100) AS DECIMAL(16,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2))"

  /** Twin of `Analytics.qdec32` (rates in [0,1] → DECIMAL(3,2)). */
  def qdec32(x: String): String =
    s"CAST(CAST(floor(($x) * 100) AS DECIMAL(3,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(3,2))"

  /** Twin of `Analytics.qdbl2` — per-row half-up cent quantization that
    * STAYS IN DOUBLE (`floor(x·100 + 0.5) / 100.0`, identical IEEE op
    * sequence in both engines). Oracle-VISIBLE numeric columns must be
    * DOUBLE, never DECIMAL: the driver's compare stringifies pandas
    * values, and a Spark parquet DECIMAL arrives in pandas as
    * `Decimal('912.10')` while DuckDB's fetchdf gives float `912.1` —
    * numerically equal, string-unequal. That representation gap (not a
    * rounding mode) is the root cause of the r1–r3 hash-fail cluster:
    * verified by replaying the driver's own round-3 verify_out parquet
    * against the oracles — a cell-level str() compare reproduces the
    * driver's pass/fail verdict on all 46 oracled queries exactly. */
  def qdbl2(x: String): String = s"(floor(($x) * 100.0 + 0.5) / 100.0)"

  /** Twin of `Analytics.cents2` — exact integer cents for
    * order-independent decimal accumulation inside a query. */
  def cents2(x: String): String =
    s"CAST(floor(($x) * 100.0 + 0.5) AS DECIMAL(18,0))"

  /** Twin of `Analytics.pct` — a rate in [0,1] as an exact integer
    * percent 0..100. */
  def pct(x: String): String =
    s"CAST(floor(($x) * 100.0 + 0.5) AS DECIMAL(3,0))"

  /** Exact non-negative integer expression (any width < 2⁹³) →
    * correctly-rounded DOUBLE via the hi/lo split proven by q25's
    * oracle: DuckDB's native int128→double cast is NOT correctly
    * rounded, while Spark's BigDecimal `.cast("double")` is. `hi·2⁴⁰` is
    * exact (hi < 2⁵³ scaled by a power of two), `lo < 2⁴⁰` is exact, and
    * the single add is the one rounded op → correctly rounded, so it
    * lands on the identical double. NULL propagates. */
  def dbl(x: String): String =
    s"(CAST(CAST(($x) AS HUGEINT) // 1099511627776 AS DOUBLE) * 1099511627776.0" +
      s" + CAST(CAST(($x) AS HUGEINT) % 1099511627776 AS DOUBLE))"
}

object Registry {
  lazy val all: Seq[Q] =
    ParityQueries.qs ++ AnalyticsQueries.qs ++ TemporalQueries.qs ++
      PipelineQueries.qs ++ ExtQueries.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
