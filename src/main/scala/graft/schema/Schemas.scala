package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructType constants for every warehouse layer of the EOD
  * pricing pipeline (SURVEY.md §1.2). Schemas are fixed and declarative —
  * the reference assigns CSV types positionally
  * (reference `dags/sql/1. copy_to_raw.sql:19-27`); we declare the same
  * shapes up front and never infer.
  */
object Schemas {

  /** Bronze CSV layout as written by the extract side
    * (reference `dags/lib/eod_data_downloader.py:52-61`): header row
    * `trade_date,symbol,open,high,low,close,volume`. Everything is read
    * as the target type directly; malformed cells become null
    * (PERMISSIVE), reproducing `ON_ERROR='CONTINUE'` row-skip semantics
    * once we drop rows with null required fields.
    */
  val bronzeCsv: StructType = StructType(Seq(
    StructField("trade_date", DateType),
    StructField("symbol", StringType),
    StructField("open", DecimalType(18, 6)),
    StructField("high", DecimalType(18, 6)),
    StructField("low", DecimalType(18, 6)),
    StructField("close", DecimalType(18, 6)),
    StructField("volume", DecimalType(38, 0))
  ))

  /** RAW layer = bronze columns + lineage
    * (reference `dags/sql/1. copy_to_raw.sql:15-27`). */
  val raw: StructType = StructType(bronzeCsv.fields ++ Seq(
    StructField("_src_file", StringType),
    StructField("_ingest_ts", TimestampType)
  ))

  /** CORE layer: normalized symbol, lineage dropped, load_ts added
    * (reference `dags/sql/4. merge_core.sql:92-95`).
    * Logical PK (symbol, trade_date). */
  val core: StructType = StructType(Seq(
    StructField("trade_date", DateType),
    StructField("symbol", StringType),
    StructField("open", DecimalType(18, 6)),
    StructField("high", DecimalType(18, 6)),
    StructField("low", DecimalType(18, 6)),
    StructField("close", DecimalType(18, 6)),
    StructField("volume", DecimalType(38, 0)),
    StructField("load_ts", TimestampType)
  ))

  /** Reject quarantine: RAW columns + constant reject_reason
    * (reference `dags/sql/4. merge_core.sql:39-45`). */
  val reject: StructType = StructType(raw.fields :+
    StructField("reject_reason", StringType))

  /** Surrogate-keyed security dimension
    * (reference `dags/sql/5. merge_dim_security.sql:36-37`). */
  val dimSecurity: StructType = StructType(Seq(
    StructField("security_id", LongType),
    StructField("symbol", StringType)
  ))

  /** The RICHER security dimension the reference's dashboards join on
    * (name, sector, industry, security type, watchlist flag — visible in
    * `dashboard/securities_market_report1.jpg` table headers/legends but
    * maintained outside the repo's SQL; SURVEY.md §1.2 note). The engine
    * models it so serving-layer queries have the columns; the MERGE
    * maintains only (security_id, symbol) exactly as the reference does,
    * and [[graft.dim.DimSecurity.enrich]] derives the rest. */
  val dimSecurityRich: StructType = StructType(dimSecurity.fields ++ Seq(
    StructField("security_name", StringType),
    StructField("sector", StringType),
    StructField("industry", StringType),
    StructField("security_type", StringType),
    StructField("is_watchlist", BooleanType)
  ))

  /** Calendar dimension (reference `dags/sql/6. dm_dim_date.sql:19-30`).
    * day_of_week keeps the Snowflake convention 0=Sunday..6=Saturday
    * (the reference's own comment at `6. dm_dim_date.sql:28`). */
  val dimDate: StructType = StructType(Seq(
    StructField("date_sk", IntegerType),
    StructField("cal_date", DateType),
    StructField("year_num", IntegerType),
    StructField("quarter_num", IntegerType),
    StructField("month_num", IntegerType),
    StructField("month_name", StringType),
    StructField("day_num", IntegerType),
    StructField("day_name", StringType),
    StructField("day_of_week", IntegerType),
    StructField("week_of_year", IntegerType),
    StructField("is_weekend", BooleanType)
  ))

  /** Star-schema daily price fact, upsert key (security_id, date_sk)
    * (reference `dags/sql/7. merge_fact_daily_price.sql:38-51`). */
  val fact: StructType = StructType(Seq(
    StructField("security_id", LongType),
    StructField("date_sk", IntegerType),
    StructField("trade_date", DateType),
    StructField("open", DecimalType(18, 6)),
    StructField("high", DecimalType(18, 6)),
    StructField("low", DecimalType(18, 6)),
    StructField("close", DecimalType(18, 6)),
    StructField("volume", DecimalType(38, 0)),
    StructField("load_ts", TimestampType)
  ))
}
