package graft.dim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar dimension derivation (SURVEY.md §2.8, reference
  * `dags/sql/6. dm_dim_date.sql:17-37`).
  *
  * Dialect traps handled (SURVEY.md §7.4):
  *   - `DAYOFWEEK`: Snowflake/reference convention is 0=Sunday..6=Saturday
  *     (the reference's own comment `6. dm_dim_date.sql:28`); Spark's
  *     `dayofweek` is 1=Sunday..7=Saturday → subtract 1.
  *   - `MONTHNAME`/`DAYNAME`: Snowflake returns 3-letter abbreviations
  *     ("Jan"/"Mon") → `date_format(d, "MMM"/"EEE")`.
  *   - `WEEK`: Snowflake's default policy is ISO-like = Spark's
  *     `weekofyear` (ISO 8601).
  *   - `IS_WEEKEND`: reference tests `IN (0,6)` on the 0-based DOW.
  */
object DimDate {

  /** `TO_NUMBER(TO_CHAR(d,'YYYYMMDD'))` surrogate (reference
    * `6. dm_dim_date.sql:20`): arithmetic form keeps it codegen'd and
    * avoids a string round-trip. */
  def dateSk(d: Column): Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("int")

  /** Derive the full calendar row set from a column of dates.
    * Input may contain duplicates; output is distinct by date_sk. */
  def derive(dates: DataFrame, dateCol: String): DataFrame = {
    val d = col(dateCol).cast("date")
    dates.select(d.as("cal_date")).distinct().select(
      dateSk(col("cal_date")).as("date_sk"),
      col("cal_date"),
      year(col("cal_date")).cast("int").as("year_num"),
      quarter(col("cal_date")).cast("int").as("quarter_num"),
      month(col("cal_date")).cast("int").as("month_num"),
      date_format(col("cal_date"), "MMM").as("month_name"),
      dayofmonth(col("cal_date")).cast("int").as("day_num"),
      date_format(col("cal_date"), "EEE").as("day_name"),
      (dayofweek(col("cal_date")) - 1).cast("int").as("day_of_week"),
      weekofyear(col("cal_date")).cast("int").as("week_of_year"),
      (dayofweek(col("cal_date")) - 1).isin(0, 6).as("is_weekend")
    )
  }
}
