package graft

import graft.ingest.{EodCsvSink, EodCsvSource, RestEodSource, TradingDay}
import graft.metrics.{Audit, PostMergeMetrics, PreMergeMetrics, SlackSink}
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

/** S1 REST extract seam: resolve-and-fetch walk-back, JSON→typed rows,
  * end-to-end staging through the CSV sink. No network IO — the fetch is
  * a canned-body function, as the seam is designed for. */
class RestEodSourceSpec extends SparkSpec {
  private val today = LocalDate.of(2026, 8, 10)
  private val body =
    """{"queryCount": 3, "resultsCount": 2, "adjusted": true, "results": [
      |  {"T": "AAPL", "v": 51234567, "vw": 232.12, "o": 231.15, "c": 233.1,
      |   "h": 233.9, "l": 230.4, "t": 1754856000000, "n": 100},
      |  {"T": "MSFT", "v": 23456789, "o": 410.0, "c": 411.8, "h": 412.5, "l": 408.2}
      |], "status": "OK"}""".stripMargin
  private val dry = """{"queryCount": 0, "resultsCount": 0, "results": [], "status": "OK"}"""

  test("walks back past dry days and fetches each date at most once") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[LocalDate]
    val got = RestEodSource.resolveAndFetch(today, 10) { d =>
      calls += d
      if (d == today.minusDays(2)) Some(body)
      else if (d == today) Some(dry)
      else throw new RuntimeException("HTTP 500") // request failure → continue
    }
    assert(got.map(_.tradingDate).contains(today.minusDays(2)))
    assert(got.exists(_.body == body))
    assert(calls.toSeq == calls.distinct.toSeq, "each date fetched at most once")
    assert(RestEodSource.resolveAndFetch(today, 2)(_ => Some(dry)).isEmpty)
  }

  test("parses T,o,h,l,c,v to the bronze layout with exact decimals") {
    val rows = RestEodSource.parse(spark, today, body)
    assert(rows.columns.toSeq == EodCsvSink.Columns)
    val aapl = rows.filter(col("symbol") === "AAPL").collect().head
    assert(aapl.getDate(0) == Date.valueOf("2026-08-10"))
    assert(aapl.getDecimal(2).compareTo(new java.math.BigDecimal("231.15")) == 0) // o→open
    assert(aapl.getDecimal(3).compareTo(new java.math.BigDecimal("233.9")) == 0)  // h→high
    assert(aapl.getDecimal(4).compareTo(new java.math.BigDecimal("230.4")) == 0)  // l→low
    assert(aapl.getDecimal(5).compareTo(new java.math.BigDecimal("233.1")) == 0)  // c→close
    assert(aapl.getDecimal(6).longValueExact() == 51234567L)                      // v→volume
  }

  test("extract stages the resolved day as the pipeline's bronze CSV") {
    val base = Fixtures.tempDir("rest").toString
    val got = RestEodSource.extract(spark, base, today, 10)(d =>
      if (d == today.minusDays(3)) Some(body) else Some(dry))
    val (d, path) = got.get
    assert(d == today.minusDays(3))
    assert(path.endsWith("/eod/2026/08/07/eod_prices_2026-08-07.csv"))
    val back = EodCsvSource.read(spark, path,
      Some(java.sql.Timestamp.valueOf("2026-08-07 21:05:00")))
    assert(back.count() == 2)
    assert(back.select("trade_date").distinct().collect()
      .head.getDate(0) == Date.valueOf("2026-08-07"))
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

  test("readParsed keeps unparseable-key rows; read drops them — the difference is the skip count") {
    val dir = Fixtures.tempDir("skiprows")
    val csv = dir.resolve("bad.csv")
    java.nio.file.Files.writeString(csv,
      """trade_date,symbol,open,high,low,close,volume
        |2026-08-10,AAPL,231.15,233.90,230.40,233.10,51234567
        |not-a-date,MSFT,410.00,412.50,408.20,411.80,23456789
        |2026-08-10,,1.00,1.00,1.00,1.00,100
        |2026-08-10,GOOG,xx,2.00,1.50,1.75,200
        |""".stripMargin)
    val ts = Some(java.sql.Timestamp.valueOf("2026-08-10 21:05:00"))
    val parsed = EodCsvSource.readParsed(spark, csv.toString, ts)
    assert(parsed.count() == 4) // rows_parsed
    val skipped = parsed.filter(EodCsvSource.keyFieldsMissing).count()
    assert(skipped == 2) // bad date + empty symbol; bad OHLC is data, not key
    val loaded = EodCsvSource.read(spark, csv.toString, ts)
    assert(loaded.count() == 2) // rows_loaded: AAPL + GOOG (null open survives)
    assert(loaded.filter(col("symbol") === "GOOG").collect().head
      .isNullAt(loaded.columns.indexOf("open")))
  }

  test("retry runs transient failures to success and exhausts the budget on persistent ones") {
    import graft.util.Retry
    // transient: two failures, then success; one sleep per retry
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val got = Retry.retry(retries = 3, delayMs = 7L, sleep = slept += _) { () =>
      calls += 1
      if (calls < 3) sys.error(s"transient $calls") else 42
    }
    assert(got == 42 && calls == 3 && slept.toSeq == Seq(7L, 7L))
    // persistent: retries+1 attempts, the LAST exception rethrows
    var calls2 = 0
    val ex = intercept[RuntimeException] {
      Retry.retry(retries = 2, delayMs = 1L, sleep = _ => ()) { () =>
        calls2 += 1; sys.error(s"always $calls2")
      }
    }
    assert(calls2 == 3 && ex.getMessage == "always 3")
    // zero retries: one attempt, no sleep
    var calls3 = 0
    intercept[RuntimeException] {
      Retry.retry(retries = 0, delayMs = 1L,
        sleep = _ => fail("must not sleep")) { () => calls3 += 1; sys.error("x") }
    }
    assert(calls3 == 1)
  }

  test("runWithRetry recovers when the bronze file lands between attempts") {
    val bronze = Fixtures.tempDir("retry-bronze")
    val wh = Fixtures.tempDir("retry-wh").toString
    val csv = bronze.resolve("eod.csv")
    val pipe = new graft.EodPipeline(spark, wh)
    // first attempt: file missing → read throws; the sleep hook "lands"
    // the file (the late-vendor-feed shape the reference retries over)
    val r = pipe.runWithRetry(csv.toString, d1,
      Some(java.sql.Timestamp.valueOf("2026-08-10 21:05:00")),
      retries = 2, delayMs = 0L,
      sleep = _ => java.nio.file.Files.writeString(csv,
        """trade_date,symbol,open,high,low,close,volume
          |2026-08-10,AAPL,1.00,2.00,0.50,1.50,100
          |""".stripMargin))
    assert(r.pre.rawCnt == 1 && r.post.coreRows == 1)
  }

  test("file gate fails typed on a missing path") {
    intercept[GateFailed] {
      Gates.requireFileExists(spark, "/tmp/definitely/not/here.csv")
    }
  }

  test("connectivity probe: listable root passes, missing or non-dir roots fail typed") {
    val base = Fixtures.tempDir("conn").toString
    assert(Gates.warehouseReachable(spark, base) == 0) // empty but listable
    val f = Fixtures.writeBronze(base, "2026-08-10",
      Seq("2026-08-10,AAPL,1,1,1,1,1"))
    assert(Gates.warehouseReachable(spark, base) == 1) // the eod/ subtree
    intercept[GateFailed](Gates.warehouseReachable(spark, s"$base/nope"))
    intercept[GateFailed](Gates.warehouseReachable(spark, f)) // file, not dir
  }

  test("slack sink: payload shape, missing-url and transport-failure semantics") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val url = SlackSink.webhookUrl("https", "hooks.slack.com/services", "T00/B00/secret")
    assert(url == "https://hooks.slack.com/services/T00/B00/secret")

    val sink = SlackSink.viaTransport(Some(url), (u, b) => sent += (u -> b))
    assert(sink.post("line1\nwith \"quotes\""))
    assert(sent.size == 1 && sent.head._1 == url)
    assert(sent.head._2 == """{"text": "line1\nwith \"quotes\""}""")

    // missing URL → false without a send (slack_utils.py:39-42)
    assert(!SlackSink.viaTransport(None, (_, _) => fail("must not send")).post("x"))
    // transport exception → false (slack_utils.py:46-48)
    assert(!SlackSink.viaTransport(Some(url),
      (_, _) => throw new RuntimeException("timeout")).post("x"))
  }

  test("failure-callback message matches the reference shape; error truncated to 300") {
    val m = SlackSink.failureMessage("get_securities_data", "merge_core",
      "manual__2026-08-10", "x" * 400, "https://airflow/logs/1")
    assert(m.startsWith(":x: *Airflow task failed*\n"))
    assert(m.contains("• DAG: `get_securities_data`  • Task: `merge_core`\n"))
    assert(m.contains("• Run: `manual__2026-08-10`\n"))
    assert(m.contains("• Error: `" + "x" * 300 + "`\n"))
    assert(m.endsWith("• <https://airflow/logs/1|Logs>"))
    // no log URL → no Logs line (the reference's conditional suffix)
    assert(!SlackSink.failureMessage("d", "t", "r", "e").contains("|Logs>"))
  }

  test("postSummary posts the Q3 summary through the sink") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    val sink = SlackSink.viaTransport(Some("u"), (_, b) => sent += b)
    assert(SlackSink.postSummary(sink, d1,
      Some(PreMergeMetrics(12345, 10, 6000, 227)), None))
    assert(sent.head.contains("*EOD Summary*") && sent.head.contains("12,345"))
  }

  test("summary formatter renders the reference's message shape, bug-free on empties") {
    val s = Audit.formatSummary(d1,
      Some(PreMergeMetrics(12345, 10, 6000, 227, skippedCnt = 3)),
      Some(PostMergeMetrics(1234567, 1234500)))
    assert(s.contains("*EOD Summary*"))
    assert(s.contains("• Trading Date: `2026-08-10`"))
    assert(s.contains("• RAW rows: `12,345`"))
    assert(s.contains("• Skipped (unparseable) rows: `3`"))
    assert(s.contains("• Reject rows: `10`"))
    assert(s.contains("• Estimated CORE inserts: `6,000`"))
    assert(s.contains("• CORE rows after merge: `1,234,567`"))
    // the reference NameErrors when premerge is empty — we format zeros
    val empty = Audit.formatSummary(d1, None, None)
    assert(empty.contains("• Reject rows: `0`") && empty.contains("• FACT rows after merge: `0`"))
  }
}
