package graft

import graft.core.{Dedup, Upsert}
import graft.dim.{DimDate, DimSecurity}
import graft.fact.FactDailyPrice
import graft.ingest.EodCsvSource
import graft.metrics.{Audit, PostMergeMetrics, PreMergeMetrics}
import graft.quality.Gates
import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The end-to-end EOD cascade (SURVEY.md §3.1) — the whole reference DAG
  * (`dags/get_securities_data.py:170-171`:
  * `copy → check → premerge → merge_core → [dim_security, dim_date] →
  * fact → postmerge`) collapsed into one driver call per trading date.
  *
  * Layer tables are parquet directories under `warehouseDir`, partitioned
  * by `trade_date` where date-scoped (RAW/CORE/REJECT/FACT) so every
  * incremental run prunes to one partition and rewrites only it
  * (dynamic partition overwrite = the MERGE of SURVEY.md §2.5).
  */
final case class RunResult(tradeDate: java.sql.Date,
                           pre: PreMergeMetrics, post: PostMergeMetrics)

class EodPipeline(spark: SparkSession, warehouseDir: String) {
  import EodPipeline._

  private def path(t: String) = s"$warehouseDir/$t"

  private def readOrEmpty(t: String, schema: StructType): DataFrame = {
    val p = path(t)
    if (new java.io.File(p).exists())
      spark.read.schema(schema).parquet(p)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Run the full cascade for one trading date over a bronze CSV path. */
  def run(bronzeCsvPath: String, runDate: java.sql.Date,
          ingestTs: Option[java.sql.Timestamp] = None): RunResult = {
    // t04.1 copy_to_raw (S5/S6) + t04.2 check (A2)
    val batch = EodCsvSource.forDate(
      EodCsvSource.read(spark, bronzeCsvPath, ingestTs), runDate)
    Gates.requireNonEmpty(batch, s"raw batch $runDate")
    appendPartition(batch, path(RawTable))

    // t04.3 premerge metrics (Q1) — against CORE as it stands
    val core0 = readOrEmpty(CoreTable, Schemas.core)
    val pre = Audit.preMerge(batch, Gates.negativeVolume, core0)

    // t04.4 merge_core: reject quarantine (M1) + dedup (W1) + upsert (M2)
    val (valid, rejects) = Gates.split(batch, Gates.negativeVolume)
    val reject0 = readOrEmpty(RejectTable, Schemas.reject)
    val rejectNew = Upsert.insertOnly(
      reject0, Gates.annotateReject(rejects, "NEGATIVE_VOLUME"),
      Seq("symbol", "trade_date"))
    overwriteDate(rejectNew, path(RejectTable), runDate)

    val loadTs = ingestTs.map(t => lit(t)).getOrElse(current_timestamp())
    val deduped = Dedup.latestIngestWins(valid)
      .select(col("trade_date"), upper(trim(col("symbol"))).as("symbol"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .withColumn("load_ts", loadTs)
    val coreNew = Upsert.merge(
      core0.filter(col("trade_date") === lit(runDate)), deduped,
      Seq("symbol", "trade_date"))
    overwriteDate(coreNew, path(CoreTable), runDate)

    // t04.5 dims (M3/M4) — insert-only, not date-partitioned
    val dim0 = readOrEmpty(DimSecurityTable, Schemas.dimSecurity)
    val dimSec = DimSecurity.merge(dim0, deduped.select("symbol"))
    replace(dimSec, path(DimSecurityTable))

    val dimDate0 = readOrEmpty(DimDateTable, Schemas.dimDate)
    val dimDate = Upsert.insertOnly(dimDate0,
      DimDate.derive(deduped.select("trade_date"), "trade_date"), Seq("date_sk"))
    replace(dimDate, path(DimDateTable))

    // t04.6 fact (J3/M5)
    val core1 = readOrEmpty(CoreTable, Schemas.core)
      .filter(col("trade_date") === lit(runDate))
    val factNew = FactDailyPrice.build(core1,
      spark.read.parquet(path(DimSecurityTable)),
      spark.read.parquet(path(DimDateTable)))
    overwriteDate(factNew, path(FactTable), runDate)

    // t04.7 postmerge metrics (Q2)
    val post = Audit.postMerge(
      readOrEmpty(CoreTable, Schemas.core),
      readOrEmpty(FactTable, Schemas.fact), runDate)
    RunResult(runDate, pre, post)
  }

  /** RAW is append-only (FORCE=TRUE semantics, SURVEY.md §2.1 S7): but for
    * rerun-idempotency of the round-trip we still scope appends to the run
    * date partition via dynamic overwrite of that partition *plus* the
    * already-present rows for it. Matching the reference exactly (blind
    * append) would duplicate RAW on rerun — kept as overwrite for
    * idempotency, which downstream MERGE makes observably identical. */
  private def appendPartition(df: DataFrame, tablePath: String): Unit =
    Upsert.overwriteDatePartition(spark, df, tablePath)

  private def overwriteDate(df: DataFrame, tablePath: String, d: java.sql.Date): Unit =
    Upsert.overwriteDatePartition(spark, df.filter(col("trade_date") === lit(d)), tablePath)

  /** Small non-partitioned tables (dims): full atomic rewrite via temp dir
    * rename is overkill locally; plain overwrite-in-place suffices here
    * because dims are tiny and rebuilt from (old ∪ new) each run. */
  private def replace(df: DataFrame, tablePath: String): Unit = {
    val tmp = tablePath + "__tmp"
    df.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(tablePath)
    if (target.exists()) {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(target)
    }
    new java.io.File(tmp).renameTo(target)
    ()
  }
}

object EodPipeline {
  val RawTable = "raw_eod_prices"
  val CoreTable = "core_eod_prices"
  val RejectTable = "core_eod_prices_reject"
  val DimSecurityTable = "dim_security"
  val DimDateTable = "dim_date"
  val FactTable = "fact_daily_price"
}
