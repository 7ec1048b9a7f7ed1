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

/** Streaming exact dedup: first occurrence wins across micro-batches;
  * the watermarked variant expires fingerprint state past the horizon. */
class StreamDedupSpec extends SparkSpec {
  import graft.streaming.StreamDedup
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dropDuplicates keeps the first occurrence across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = StreamDedup.exactDedupStream(in.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    in.addData((1L, "the quick brown fox"), (2L, "unique document one"))
    q.processAllAvailable()
    // batch 2: an exact dup (normalizes equal: case + whitespace noise) + a new doc
    in.addData((3L, "  The   QUICK brown fox "), (4L, "unique document two"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedup").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"dup doc 3 must be dropped, got $ids")
  }

  test("watermarked dedup: dups within the horizon dropped; state expires beyond it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamDedup.exactDedupStreamWatermarked(
      in.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("sdedupw").outputMode("append").start()
    in.addData((1L, ts("2026-08-10 10:00:00"), "alpha doc"))
    q.processAllAvailable()
    // within the horizon: dropped
    in.addData((2L, ts("2026-08-10 10:30:00"), "alpha doc"))
    q.processAllAvailable()
    // advance the watermark far past the fingerprint's expiry…
    in.addData((3L, ts("2026-08-12 10:00:00"), "beta doc"))
    q.processAllAvailable()
    // …then the same content again: state expired → re-emitted
    in.addData((4L, ts("2026-08-12 10:05:00"), "alpha doc"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedupw").select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L, 4L), s"expected 2 dropped, 4 re-admitted after expiry, got $ids")
  }
}
