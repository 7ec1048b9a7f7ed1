package graft.ingest

import java.time.LocalDate

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REST extract seam (SURVEY.md §2.1 S1) — the reference's actual entry
  * point (`dags/lib/eod_data_downloader.py:11-88`): walk back from today
  * in the exchange timezone, request the grouped-daily endpoint per
  * candidate date, stop at the first date whose response carries rows,
  * and land the `T,o,h,l,c,v` records as one bronze CSV for that date.
  *
  * The HTTP call itself is injected (`fetch: LocalDate => Option[String]`
  * returning the raw JSON body, None for no-data/non-200) because the
  * engine does no network IO — a live deployment wraps its HTTP client
  * here; tests and the demo inject canned bodies. Everything downstream
  * of the fetch — trading-day resolution, JSON → typed rows, CSV staging
  * — is the real code path.
  *
  * Scale note: one response is one trading day (~12k rows in the
  * reference's envelope) — driver-side string handling is correct here;
  * the 100 TB surface is the downstream tables, not the extract. Parsing
  * still runs THROUGH Spark's JSON reader with the explicit schema, so
  * decimals are parsed exactly from the JSON text (no double detour).
  */
object RestEodSource {

  /** Endpoint path per date (`eod_data_downloader.py:33-35`; base URL and
    * query params are deployment config, not engine behavior). */
  def groupedDailyPath(date: LocalDate): String =
    s"/v2/aggs/grouped/locale/us/market/stocks/$date"

  /** One resolved trading day and its raw response body. */
  final case class Fetched(tradingDate: LocalDate, body: String)

  /** The response's `resultsCount` field, 0 when absent — the reference's
    * has-data probe (`r.json().get("resultsCount", 0) > 0`). A driver-side
    * regex probe (the full parse happens in Spark once, on the one
    * accepted body). */
  def resultsCount(body: String): Long =
    "\"resultsCount\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(body)
      .map(_.group(1).toLong).getOrElse(0L)

  /** Resolve the latest trading day with data and return its body:
    * [[TradingDay.resolve]] over a memoized fetch (each date is fetched
    * at most once; a fetch that throws counts as no-data-continue,
    * mirroring the reference's request-failure handling at
    * `eod_data_downloader.py:39-42`). None when the whole lookback window
    * is dry (the reference fails the run). */
  def resolveAndFetch(today: LocalDate,
                      lookbackDays: Int = TradingDay.DefaultLookbackDays)
                     (fetch: LocalDate => Option[String]): Option[Fetched] = {
    val memo = scala.collection.mutable.Map.empty[LocalDate, Option[String]]
    def body(d: LocalDate): Option[String] =
      memo.getOrElseUpdate(d, try fetch(d) catch { case _: Exception => None })
    TradingDay.resolve(today, lookbackDays)(d => body(d).exists(resultsCount(_) > 0))
      .flatMap(d => body(d).map(Fetched(d, _)))
  }

  /** Polygon grouped-daily response schema — only the fields the
    * reference maps (`eod_data_downloader.py:52-53`: `T,o,h,l,c,v` →
    * symbol/open/high/low/close/volume). Prices are parsed directly as
    * DECIMAL(18,6) from the JSON text (exact, same as the typed CSV
    * scan); volume as NUMBER(38,0). */
  val responseSchema: StructType = StructType(Seq(
    StructField("resultsCount", LongType),
    StructField("results", ArrayType(StructType(Seq(
      StructField("T", StringType),
      StructField("o", DecimalType(18, 6)),
      StructField("h", DecimalType(18, 6)),
      StructField("l", DecimalType(18, 6)),
      StructField("c", DecimalType(18, 6)),
      StructField("v", DecimalType(38, 0))))))))

  /** Parse one response body into bronze-shaped rows
    * (`trade_date,symbol,open,high,low,close,volume`, the
    * [[Schemas.bronzeCsv]] layout). Rows without a symbol are dropped
    * (required field, same rule as the typed CSV scan). */
  def parse(spark: SparkSession, tradingDate: LocalDate, body: String): DataFrame = {
    import spark.implicits._
    spark.read.schema(responseSchema).json(Seq(body).toDS)
      .select(explode(col("results")).as("r"))
      .select(
        lit(java.sql.Date.valueOf(tradingDate)).as("trade_date"),
        col("r.T").as("symbol"),
        col("r.o").as("open"),
        col("r.h").as("high"),
        col("r.l").as("low"),
        col("r.c").as("close"),
        col("r.v").as("volume"))
      .filter(col("symbol").isNotNull)
  }

  /** End-to-end extract: resolve + fetch + parse + stage as the one
    * bronze CSV the pipeline reads (`…/eod/yyyy/MM/dd/eod_prices_<d>.csv`
    * via [[EodCsvSink.writeDay]], the reference's staging contract).
    * Returns (tradingDate, csvPath), or None when the window is dry. */
  def extract(spark: SparkSession, baseDir: String, today: LocalDate,
              lookbackDays: Int = TradingDay.DefaultLookbackDays)
             (fetch: LocalDate => Option[String]): Option[(LocalDate, String)] =
    resolveAndFetch(today, lookbackDays)(fetch).map { f =>
      val rows = parse(spark, f.tradingDate, f.body)
      val date = java.sql.Date.valueOf(f.tradingDate)
      f.tradingDate -> EodCsvSink.writeDay(spark, rows, baseDir, date)
    }
}
