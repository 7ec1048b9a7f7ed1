package graft

import graft.streaming.StreamAnalytics
import graft.streaming.StreamAnalytics.{Ohlc, Tick}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Watermark + windowed-agg + mapGroupsWithState semantics over
  * MemoryStream micro-batches. */
class StreamAnalyticsSpec extends SparkSpec {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling window emits closed windows and drops too-late rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Long)]
    val agg = StreamAnalytics.windowedTradedValue(
      in.toDF().toDF("symbol", "ts", "volume"), "symbol", "ts", "volume",
      windowDuration = "1 day", watermarkDelay = "1 day")
    val q = agg.writeStream.format("memory").queryName("win").outputMode("append").start()

    // day 1 rows, then a day-4 row that advances the watermark past day 1+2
    in.addData(("AAPL", ts("2026-08-10 10:00:00"), 100L),
               ("AAPL", ts("2026-08-10 15:00:00"), 50L),
               ("MSFT", ts("2026-08-10 11:00:00"), 30L))
    q.processAllAvailable()
    in.addData(("AAPL", ts("2026-08-13 09:00:00"), 7L))
    q.processAllAvailable()
    // a row for day 1 now arrives LATER than the watermark → dropped
    in.addData(("AAPL", ts("2026-08-10 16:00:00"), 999L))
    q.processAllAvailable()
    in.addData(("AAPL", ts("2026-08-20 09:00:00"), 1L)) // close day-4 window
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win")
      .select("symbol", "window_start", "total_value", "n_events")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows.contains(("AAPL", "2026-08-10 00:00:00.0", 150L, 2L))) // 999 excluded
    assert(rows.contains(("MSFT", "2026-08-10 00:00:00.0", 30L, 1L)))
    assert(rows.contains(("AAPL", "2026-08-13 00:00:00.0", 7L, 1L)))
  }

  test("mapGroupsWithState maintains running OHLC across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = StreamAnalytics.runningOhlc(in.toDS())
      .writeStream.format("memory").queryName("ohlc").outputMode("update").start()

    in.addData(Tick("AAPL", ts("2026-08-10 09:30:00"), 100.0),
               Tick("AAPL", ts("2026-08-10 09:31:00"), 105.0),
               Tick("AAPL", ts("2026-08-10 09:32:00"), 98.0))
    q.processAllAvailable()
    // second batch: new high, and an EARLIER tick that must become open
    in.addData(Tick("AAPL", ts("2026-08-10 09:33:00"), 110.0),
               Tick("AAPL", ts("2026-08-10 09:29:00"), 99.5))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("ohlc").as[Ohlc].collect()
      .filter(_.symbol == "AAPL").maxBy(_.n)
    assert(last.n == 5)
    assert(last.open == 99.5)   // earliest event time wins open
    assert(last.high == 110.0 && last.low == 98.0)
    assert(last.close == 110.0) // latest event time wins close
  }
}
