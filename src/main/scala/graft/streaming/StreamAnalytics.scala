package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-time streaming analytics (SURVEY.md §2.9 — the watermark /
  * windowed-agg / custom-state surface of Structured Streaming, beyond
  * the cascade's `foreachBatch`):
  *
  *   - [[windowedTradedValue]]: tumbling event-time windows with a
  *     watermark — late rows inside the watermark still update their
  *     window; rows later than the watermark are dropped, which bounds
  *     state (the 100 TB requirement: without a watermark, window state
  *     grows forever).
  *   - [[runningOhlc]]: per-key running OHLC maintained with
  *     `mapGroupsWithState` — the "live quote" capability: open = first
  *     price seen, high/low = running extremes, close = latest by event
  *     time. State is one small case class per key.
  *
  * Both operate on any (key, event-time, value) stream; the EOD domain
  * instantiates key = symbol, value = price/volume.
  */
object StreamAnalytics {

  /** Watermarked tumbling-window sum/count of `valueCol` per key.
    * In append output mode a window emits once its end passes the
    * watermark — exactly-once, bounded-state aggregation. */
  def windowedTradedValue(stream: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, windowDuration: String,
                          watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(sum(col(valueCol)).as("total_value"), count(lit(1)).as("n_events"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("total_value"), col("n_events"))

  /** Stream-static enrichment join: each micro-batch hash-joins against
    * the static dimension, broadcast because dims are small relative to
    * the stream (the 100 TB shape: the stream never shuffles for the
    * join; Spark re-plans the static side per micro-batch, so a
    * refreshed dim snapshot is picked up without restarting the query). */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol))

  /** Stream-stream interval join: right-side events matching a left
    * event's key within `[l.ts, l.ts + within]`. Watermarks on BOTH
    * sides plus the time-range join condition are what let Spark expire
    * join state (without them a stream-stream join buffers forever —
    * the 100 TB continuous-ingest requirement). Inner-join matches are
    * emitted as soon as both rows have arrived; the watermark governs
    * state cleanup and late-data eviction only. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, within: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val r = right.withWatermark(tsCol, watermarkDelay).alias("r")
    l.join(r, col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$tsCol") >= col(s"l.$tsCol") &&
      col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $within"))
  }

  final case class Tick(symbol: String, ts: java.sql.Timestamp, price: Double)
  final case class Ohlc(symbol: String, open: Double, high: Double,
                        low: Double, close: Double, n: Long,
                        firstTs: java.sql.Timestamp, lastTs: java.sql.Timestamp)

  /** One updated OHLC row per key per micro-batch (update output mode).
    * Within a batch, rows are ordered by event time before folding so the
    * open/close semantics do not depend on arrival order. */
  def runningOhlc(ticks: Dataset[Tick]): Dataset[Ohlc] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.symbol)
      .mapGroupsWithState[Ohlc, Ohlc](GroupStateTimeout.NoTimeout) {
        (symbol: String, rows: Iterator[Tick], state: GroupState[Ohlc]) =>
          val sorted = rows.toSeq.sortBy(t => (t.ts.getTime, t.price))
          val init = state.getOption
          val updated = sorted.foldLeft(init) { (acc, t) =>
            Some(acc match {
              case None => Ohlc(symbol, t.price, t.price, t.price, t.price, 1L, t.ts, t.ts)
              case Some(o) =>
                val open = if (t.ts.before(o.firstTs)) t.price else o.open
                val first = if (t.ts.before(o.firstTs)) t.ts else o.firstTs
                val close = if (t.ts.before(o.lastTs)) o.close else t.price
                val last = if (t.ts.before(o.lastTs)) o.lastTs else t.ts
                Ohlc(symbol, open, math.max(o.high, t.price), math.min(o.low, t.price),
                  close, o.n + 1, first, last)
            })
          }
          updated.foreach(state.update)
          updated.getOrElse(Ohlc(symbol, 0, 0, 0, 0, 0L, null, null))
      }
  }
}
