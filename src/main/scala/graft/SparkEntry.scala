package graft
import graft.queries.Registry
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in [[graft.queries.Registry]]; each entry is a
  * SURVEY.md §2 operator (or a north-star extension) embodied on the
  * driver testdata, with its DuckDB oracle SQL alongside.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star join (J3) — the reference's fact build shape. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q13_star_join")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
