package graft

import graft.core.{Dedup, Upsert}
import graft.dim.{DimDate, DimSecurity}
import graft.fact.FactDailyPrice
import graft.ingest.EodCsvSource
import graft.metrics.{Audit, PostMergeMetrics, PreMergeMetrics}
import graft.quality.Gates
import graft.schema.Schemas
import org.apache.hadoop.fs.{FileSystem, Path}
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
  *
  * Storage goes through the Hadoop `FileSystem` API, so the warehouse can
  * live on any supported filesystem (file:/, hdfs:/, s3a:/ ...). One
  * caveat is documented on [[EodPipeline.replace]]: the dim swap uses
  * rename, which is atomic on HDFS/local but copy-based on object stores.
  */
final case class RunResult(tradeDate: java.sql.Date,
                           pre: PreMergeMetrics, post: PostMergeMetrics)

class EodPipeline(spark: SparkSession, warehouseDir: String) {
  import EodPipeline._

  private def path(t: String) = s"$warehouseDir/$t"
  private val fs: FileSystem =
    new Path(warehouseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(p: String): Boolean = fs.exists(new Path(p))

  private def readOrEmpty(t: String, schema: StructType): DataFrame = {
    val p = path(t)
    if (exists(p)) spark.read.schema(schema).parquet(p)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Run the full cascade for one trading date over a bronze CSV path.
    *
    * `forceReload = false` (default) gives COPY's load-history semantics
    * (SURVEY.md §2.1 S7): bronze files whose name is already present in
    * the RAW partition are skipped, so reruns are no-ops at the RAW layer
    * too. `forceReload = true` reproduces the reference's literal
    * `FORCE=TRUE` (`dags/sql/1. copy_to_raw.sql:39`): blind re-append —
    * RAW then duplicates on rerun exactly as the reference's would, and
    * downstream stays correct through the latest-wins dedup. */
  def run(bronzeCsvPath: String, runDate: java.sql.Date,
          ingestTs: Option[java.sql.Timestamp] = None,
          forceReload: Boolean = false): RunResult = {
    // t04.1 copy_to_raw (S5/S6). The skip count is measured at READ
    // grain (before date scoping — a skipped row has no parseable
    // trade_date to scope by): rows_parsed − rows_loaded, the COPY
    // load-history number (`1. copy_to_raw.sql:38` ON_ERROR=CONTINUE).
    val parsed = EodCsvSource.readParsed(spark, bronzeCsvPath, ingestTs)
    val skipped = parsed.filter(EodCsvSource.keyFieldsMissing).count()
    val batch = EodCsvSource.forDate(
      parsed.filter(!EodCsvSource.keyFieldsMissing), runDate)
    runBatch(batch, runDate, ingestTs, forceReload, skippedCnt = skipped)
  }

  /** [[run]] under the reference's task-retry policy
    * (`dags/get_securities_data.py:30-33`: retries 3×, 5 min apart —
    * [[graft.util.Retry]]): transient failures (a source outage, an
    * object-store blip) retry whole-stage like the reference's Airflow
    * tasks; deterministic failures exhaust the budget and rethrow.
    * Safe to re-enter mid-cascade: RAW appends are load-history-guarded
    * by `_src_file` and every merge is rerun-idempotent
    * (EodPipelineSpec pins both). */
  def runWithRetry(bronzeCsvPath: String, runDate: java.sql.Date,
                   ingestTs: Option[java.sql.Timestamp] = None,
                   forceReload: Boolean = false,
                   retries: Int = graft.util.Retry.DefaultRetries,
                   delayMs: Long = graft.util.Retry.DefaultDelayMs,
                   sleep: Long => Unit = Thread.sleep): RunResult =
    graft.util.Retry.retry(retries, delayMs, sleep)(() =>
      run(bronzeCsvPath, runDate, ingestTs, forceReload))

  /** The cascade from an already-read RAW-shaped batch (one run date).
    * This is the entry point the streaming variant reuses per micro-batch
    * (SURVEY.md §2.9) — stages t04.2..t04.7 are identical in batch and
    * streaming. */
  def runBatch(batch: DataFrame, runDate: java.sql.Date,
               ingestTs: Option[java.sql.Timestamp] = None,
               forceReload: Boolean = false,
               skippedCnt: Long = 0L): RunResult = {
    // t04.2 check (A2)
    Gates.requireNonEmpty(batch, s"raw batch $runDate")

    // RAW is append-only per date: existing partition rows survive new
    // files for the same date (the reference's RAW never drops rows).
    val raw0 = readOrEmpty(RawTable, Schemas.raw)
      .filter(col("trade_date") === lit(runDate))
    val rawIncoming =
      if (forceReload) batch
      else batch.join(raw0.select("_src_file").distinct(), Seq("_src_file"), "left_anti")
    writeDatePartition(raw0.unionByName(rawIncoming), RawTable, runDate)

    // t04.3 premerge metrics (Q1) — against CORE as it stands
    val core0 = readOrEmpty(CoreTable, Schemas.core)
    val pre = Audit.preMerge(batch, core0, skippedCnt)

    // t04.4 merge_core: reject quarantine (M1) + dedup (W1) + upsert (M2).
    // Symbols are normalized BEFORE the dedup window (the reference's
    // src_raw CTE, `4. merge_core.sql:58`) so case/whitespace variants of
    // one ticker collapse into one dedup group; same for the reject rows
    // (`4. merge_core.sql:28`). Null-volume rows land in neither branch
    // (reference three-valued `>= 0` / `< 0` — see Gates.referenceSplit).
    val normalized = batch.withColumn("symbol", upper(trim(col("symbol"))))
    val (valid, rejects) = Gates.referenceSplit(normalized)
    val reject0 = readOrEmpty(RejectTable, Schemas.reject)
      .filter(col("trade_date") === lit(runDate))
    val rejectNew = Upsert.insertOnly(
      reject0, Gates.annotateReject(rejects, "NEGATIVE_VOLUME"),
      Seq("symbol", "trade_date"))
    writeDatePartition(rejectNew, RejectTable, runDate)

    val loadTs = ingestTs.map(t => lit(t)).getOrElse(current_timestamp())
    val deduped = Dedup.latestIngestWins(valid)
      .select(col("trade_date"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .withColumn("load_ts", loadTs)
    val coreNew = Upsert.merge(
      core0.filter(col("trade_date") === lit(runDate)), deduped,
      Seq("symbol", "trade_date"))
    writeDatePartition(coreNew, CoreTable, runDate)

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
    writeDatePartition(factNew, FactTable, runDate)

    // t04.7 postmerge metrics (Q2)
    val post = Audit.postMerge(
      readOrEmpty(CoreTable, Schemas.core),
      readOrEmpty(FactTable, Schemas.fact), runDate)
    RunResult(runDate, pre, post)
  }

  /** Overwrite one date partition with a result that was (lazily) derived
    * from the SAME table. Writing a path that the plan also reads is a
    * correctness hazard ("Cannot overwrite a path that is also being read
    * from" at best, partial-read data loss at worst), so the result is
    * first materialized to a scratch dir, re-read, and only then swapped
    * into the target partition. Two writes of ONE date's slice — bounded,
    * partition-pruned IO, safe on any filesystem. */
  private def writeDatePartition(df: DataFrame, table: String, d: java.sql.Date): Unit = {
    val scratch = s"$warehouseDir/_tmp/$table"
    df.filter(col("trade_date") === lit(d))
      .write.mode("overwrite").parquet(scratch)
    Upsert.overwriteDatePartition(spark, spark.read.parquet(scratch), path(table))
    fs.delete(new Path(scratch), true)
    ()
  }

  /** Small non-partitioned tables (dims): write to a scratch dir, then
    * delete-and-rename into place via the Hadoop FileSystem API. Rename
    * is atomic on HDFS/local but copy-based (non-atomic) on object
    * stores; for the tiny dims the exposure window is milliseconds, and a
    * production object-store deployment would point a catalog entry at
    * the new dir instead (documented scope). */
  private def replace(df: DataFrame, tablePath: String): Unit = {
    val tmp = new Path(tablePath + "__tmp")
    val target = new Path(tablePath)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    // rename signals failure via its return value, not an exception — an
    // ignored false here would silently destroy the table we just deleted
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"rename $tmp -> $target failed; new table preserved at $tmp")
  }
}

object EodPipeline {
  val RawTable = "raw_eod_prices"
  val CoreTable = "core_eod_prices"
  val RejectTable = "core_eod_prices_reject"
  val DimSecurityTable = "dim_security"
  val DimDateTable = "dim_date"
  val FactTable = "fact_daily_price"
  val AllTables: Seq[String] =
    Seq(RawTable, CoreTable, RejectTable, DimSecurityTable, DimDateTable, FactTable)
}
