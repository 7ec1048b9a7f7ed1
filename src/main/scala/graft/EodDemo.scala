package graft

import graft.ingest.{EodCsvSink, TradingDay}
import graft.metrics.Audit
import java.nio.file.Files
import java.sql.{Date, Timestamp}
import java.time.LocalDate

/** Runnable end-to-end demo of the EOD cascade: stages a synthetic bronze
  * day (including the reference's negative-volume fault rows), resolves
  * the trading day, runs the cascade twice (showing rerun idempotency),
  * and prints the reference-shaped run summaries.
  *
  *   sbt "runMain graft.EodDemo [workDir]"
  */
object EodDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString)
    val spark = graft.util.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val day = LocalDate.of(2026, 8, 10)
    val date = Date.valueOf(day)
    val ts = Timestamp.valueOf(day.atTime(21, 5))

    // extract side: rows + the reference's 10 injected fault rows
    val good = Seq(
      ("AAPL", "231.15", "233.90", "230.40", "233.10", "51234567"),
      ("MSFT", "410.00", "412.50", "408.20", "411.80", "23456789"),
      ("GOOG", "138.50", "139.90", "137.80", "139.20", "18765432"),
      ("NVDA", "1140.00", "1152.00", "1133.00", "1149.50", "34567890"))
    val bad = Seq(
      ("AAPL_X", "192.3", "195.6", "191.8", "194.1", "-1500000"),
      ("MSFT_X", "410.5", "415.2", "409.1", "412.4", "-760000"))
    val rows = (good ++ bad).map { case (s, o, h, l, c, v) =>
      (date, s, BigDecimal(o), BigDecimal(h), BigDecimal(l), BigDecimal(c), BigDecimal(v))
    }.toDF(EodCsvSink.Columns: _*)

    val bronze = s"$work/bronze"
    val csv = EodCsvSink.writeDay(spark, rows, bronze, date)
    println(s"[demo] staged bronze file: $csv")

    val resolved = TradingDay.resolve(day, 10)(d =>
      d == day) // probe: only our staged day has data
    println(s"[demo] resolved trading day: $resolved")

    val pipe = new EodPipeline(spark, s"$work/warehouse")
    val r1 = pipe.run(csv, date, Some(ts))
    println("[demo] run 1:\n" + Audit.formatSummary(date, Some(r1.pre), Some(r1.post)))
    val r2 = pipe.run(csv, date, Some(ts))
    println("[demo] rerun (idempotent):\n" + Audit.formatSummary(date, Some(r2.pre), Some(r2.post)))

    println(s"[demo] warehouse at $work/warehouse:")
    EodPipeline.AllTables.foreach { t =>
      println(f"[demo]   $t%-24s ${spark.read.parquet(s"$work/warehouse/$t").count()}%6d rows")
    }
    spark.stop()
  }
}
