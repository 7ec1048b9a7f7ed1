package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extract-side CSV sink (SURVEY.md §2.1 S3/S8): write one trading day's
  * rows as a single headered CSV under the reference's date-partitioned
  * staging layout `…/eod/yyyy/MM/dd/eod_prices_<date>.csv`
  * (`dags/get_securities_data.py:103-106`,
  * `dags/lib/eod_data_downloader.py:52-61`).
  *
  * One file per day is the reference's contract (a day is ~12k rows), so
  * the coalesce(1) here is semantics, not a scale bug — the DOWNSTREAM
  * tables are the 100 TB surface, not the per-day extract staging.
  */
object EodCsvSink {

  val Columns = Seq("trade_date", "symbol", "open", "high", "low", "close", "volume")

  /** Write `rows` (any superset of [[Columns]]) for one date; returns the
    * final file path. Implemented as a temp-dir write + rename of the
    * single part file via the Hadoop FileSystem API. */
  def writeDay(spark: SparkSession, rows: DataFrame, baseDir: String,
               date: java.sql.Date): String = {
    val d = date.toLocalDate
    val dir = f"$baseDir/eod/${d.getYear}%04d/${d.getMonthValue}%02d/${d.getDayOfMonth}%02d"
    val finalPath = s"$dir/eod_prices_$d.csv"
    val tmp = s"$dir/_tmp_eod_prices_$d"
    rows.filter(col("trade_date") === lit(date))
      .select(Columns.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.globStatus(new Path(s"$tmp/part-*.csv"))
    if (parts == null || parts.isEmpty)
      throw new java.io.IOException(
        s"no part file written under $tmp (no rows for $date?)")
    val target = new Path(finalPath)
    if (fs.exists(target)) fs.delete(target, false)
    // rename failure must surface BEFORE the tmp cleanup deletes the only copy
    if (!fs.rename(parts(0).getPath, target))
      throw new java.io.IOException(
        s"rename ${parts(0).getPath} -> $target failed; file preserved in $tmp")
    fs.delete(new Path(tmp), true)
    finalPath
  }
}
