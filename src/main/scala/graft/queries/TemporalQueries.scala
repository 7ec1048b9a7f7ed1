package graft.queries

import graft.core.{AsOfJoin, RangeJoin}
import graft.sa.Analytics
import graft.util.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators over the event stream: as-of (point-in-time)
  * quote lookup and interval (range) join — the two join shapes a
  * securities warehouse needs beyond equi-joins, both implemented as
  * shuffle-bounded plans (see [[graft.core.AsOfJoin]] /
  * [[graft.core.RangeJoin]] for the scale rationale).
  *
  * The oracles deliberately use a DIFFERENT algorithm (per-probe argmax
  * via `row_number` over a theta-join; a direct `BETWEEN` join) so the
  * check validates semantics, not a shared implementation.
  */
object TemporalQueries {

  private def cents2(c: Column): Column = Analytics.cents2(c)

  /** As-of join: each purchase event looks up the latest view event of
    * the same user at-or-before its time ("price as of the trade"). The
    * quote's event_id breaks same-instant ties (greatest wins);
    * purchases with no preceding view keep null quote columns.
    *
    * All oracle-visible times are MICROSECONDS (`ts_ns div 1000`, the
    * same truncation DuckDB applies reading a nano parquet — see
    * [[graft.util.Tables.events]]' dual-layout contract): under the
    * legacy TIMESTAMP(NANOS) layout the raw nanos are not µs-aligned,
    * so any ns-derived value or ordering diverges from what the oracle
    * can see (under the current timestamp[us] layout `ts_ns` is exactly
    * µs-aligned and the `div 1000` is the identity on the µs grain).
    * µs + event_id is a total order on this data; the as-of pick,
    * the probe time, and the age are all µs-exact on both engines. */
  private val q30 = Q("q30_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts_ns div 1000").as("ts_us"))
      val quotes = ev.filter(col("event_type") === "view")
        .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
          col("event_id"), col("value"))
      AsOfJoin.asOf(probes, quotes, Seq("user_id"),
          probeTime = "ts_us", quoteTime = "ts_us", tieBreak = "event_id",
          carry = Seq("event_id", "value", "ts_us"))
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("p_ts_us"),
          col("quote_event_id"),
          col("quote_value"),
          (col("ts_us") - col("quote_ts_us")).as("age_us"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus
                       FROM events WHERE event_type = 'purchase'),
                 q AS (SELECT event_id, user_id, epoch_us(ts) AS tus, value
                       FROM events WHERE event_type = 'view'),
                 j AS (SELECT p.event_id, p.user_id, p.tus,
                              q.event_id AS qid, q.value AS qv, q.tus AS qtus,
                              row_number() OVER (PARTITION BY p.event_id
                                ORDER BY q.tus DESC, q.event_id DESC) AS rn
                       FROM p LEFT JOIN q
                         ON q.user_id = p.user_id AND q.tus <= p.tus)
            SELECT event_id, user_id, tus AS p_ts_us,
                   qid AS quote_event_id, qv AS quote_value,
                   tus - qtus AS age_us
            FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Range join: each signup opens a 1-hour attribution window; count
    * and sum the same user's clicks inside it (inclusive bounds, µs
    * granularity on both sides — see q30's note). Signups with no
    * clicks keep count 0 / null sum (NaN in both engines' pandas view).
    * Bucket width = the window span, so each interval explodes to ≤ 2
    * buckets. Click values accumulate as exact cents, emitted DOUBLE. */
  private val q31 = Q("q31_range_join",
    (s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = events(s, d)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          expr("ts_ns div 1000").as("lo"))
        .withColumn("hi", col("lo") + lit(hourUs))
      val pts = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts_ns div 1000").as("pt"),
          col("event_id").as("click_id"), cents2(col("value")).as("qc"))
      val hits = RangeJoin.joinRange(iv, pts, Seq("user_id"),
          "lo", "hi", "pt", bucketWidth = hourUs)
        .groupBy("signup_id")
        .agg(count(lit(1)).as("n_clicks"),
          (sum(col("qc")).cast(DecimalType(38, 0)).cast("double") / lit(100.0)).as("sum_value"))
      iv.join(hits, Seq("signup_id"), "left")
        .select(col("signup_id"), col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          col("sum_value"))
        .orderBy("signup_id")
    },
    Some(s"""WITH s AS (SELECT event_id AS signup_id, user_id,
                          epoch_us(ts) AS lo, epoch_us(ts) + 3600000000 AS hi
                        FROM events WHERE event_type = 'signup'),
                 c AS (SELECT user_id, epoch_us(ts) AS pt,
                          ${Sql.cents2("value")} AS qc
                       FROM events WHERE event_type = 'click'),
                 g AS (SELECT s.signup_id, count(*) AS cnt,
                              (${Sql.dbl("SUM(c.qc)")} / 100.0) AS sv
                       FROM s JOIN c
                         ON c.user_id = s.user_id AND c.pt BETWEEN s.lo AND s.hi
                       GROUP BY s.signup_id)
            SELECT s.signup_id, s.user_id,
                   CAST(coalesce(g.cnt, 0) AS BIGINT) AS n_clicks,
                   g.sv AS sum_value
            FROM s LEFT JOIN g USING (signup_id)
            ORDER BY signup_id"""))

  val qs: Seq[Q] = Seq(q30, q31)
}
