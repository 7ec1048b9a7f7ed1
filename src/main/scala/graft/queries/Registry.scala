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
