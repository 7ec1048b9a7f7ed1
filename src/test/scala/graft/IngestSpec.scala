package graft

import graft.ingest.{EodCsvSink, EodCsvSource, TradingDay}
import graft.metrics.{Audit, PostMergeMetrics, PreMergeMetrics}
import graft.quality.{GateFailed, Gates}
import org.apache.spark.sql.functions._
import java.sql.Date
import java.time.LocalDate

/** S2 trading-day resolver semantics (walk-back window, failure modes). */
class TradingDaySpec extends SparkSpec {
  private val today = LocalDate.of(2026, 8, 10) // a Monday

  test("today wins when it has data") {
    assert(TradingDay.resolve(today, 10)(_ => true).contains(today))
  }

  test("walks back to the most recent day with data (weekend skip shape)") {
    val trading = Set(LocalDate.of(2026, 8, 7)) // previous Friday
    assert(TradingDay.resolve(today, 10)(trading.contains)
      .contains(LocalDate.of(2026, 8, 7)))
  }

  test("dry window resolves to None; probe exceptions count as no-data") {
    assert(TradingDay.resolve(today, 3)(_ => false).isEmpty)
    assert(TradingDay.resolve(today, 2)(_ => throw new RuntimeException("timeout")).isEmpty)
    val trading = Set(today.minusDays(1))
    assert(TradingDay.resolve(today, 3)(d =>
      if (d == today) throw new RuntimeException("timeout") else trading.contains(d))
      .contains(today.minusDays(1)))
  }

  test("lookback window is exclusive: a day just outside is not found") {
    val trading = Set(today.minusDays(10))
    assert(TradingDay.resolve(today, 10)(trading.contains).isEmpty)
    assert(TradingDay.resolve(today, 11)(trading.contains).contains(today.minusDays(10)))
  }
}

/** S3/S8 CSV sink ↔ S5 source round-trip + S9 file gate + Q3 formatter. */
class SinkGateSummarySpec extends SparkSpec {
  private val d1 = Date.valueOf("2026-08-10")

  test("sink writes one headered CSV under the date layout; source round-trips it") {
    val base = Fixtures.tempDir("stage").toString
    val rows = df(Seq(
      (d1, "AAPL", BigDecimal("231.15"), BigDecimal("233.90"),
        BigDecimal("230.40"), BigDecimal("233.10"), BigDecimal(51234567)),
      (d1, "MSFT", BigDecimal("410.00"), BigDecimal("412.50"),
        BigDecimal("408.20"), BigDecimal("411.80"), BigDecimal(23456789))))
      .toDF(EodCsvSink.Columns: _*)
    val path = EodCsvSink.writeDay(spark, rows, base, d1)
    assert(path.endsWith("/eod/2026/08/10/eod_prices_2026-08-10.csv"))
    assert(Gates.requireFileExists(spark, path) > 0)

    val back = EodCsvSource.read(spark, path,
      Some(java.sql.Timestamp.valueOf("2026-08-10 21:05:00")))
    assert(back.count() == 2)
    assert(back.select("symbol").orderBy("symbol").collect()
      .map(_.getString(0)).toSeq == Seq("AAPL", "MSFT"))
    assert(back.select("close").orderBy("symbol").collect()
      .head.getDecimal(0).compareTo(new java.math.BigDecimal("233.10")) == 0)
  }

  test("file gate fails typed on a missing path") {
    intercept[GateFailed] {
      Gates.requireFileExists(spark, "/tmp/definitely/not/here.csv")
    }
  }

  test("summary formatter renders the reference's message shape, bug-free on empties") {
    val s = Audit.formatSummary(d1,
      Some(PreMergeMetrics(12345, 10, 6000, 227)),
      Some(PostMergeMetrics(1234567, 1234500)))
    assert(s.contains("*EOD Summary*"))
    assert(s.contains("• Trading Date: `2026-08-10`"))
    assert(s.contains("• RAW rows: `12,345`"))
    assert(s.contains("• Reject rows: `10`"))
    assert(s.contains("• Estimated CORE inserts: `6,000`"))
    assert(s.contains("• CORE rows after merge: `1,234,567`"))
    // the reference NameErrors when premerge is empty — we format zeros
    val empty = Audit.formatSummary(d1, None, None)
    assert(empty.contains("• Reject rows: `0`") && empty.contains("• FACT rows after merge: `0`"))
  }
}
