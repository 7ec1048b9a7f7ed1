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

  private def qdec2(c: Column): Column = Analytics.qdec2(c)

  /** As-of join: each purchase event looks up the latest view event of
    * the same user at-or-before its time ("price as of the trade"). The
    * quote's event_id breaks same-instant ties (greatest wins);
    * purchases with no preceding view keep null quote columns. */
  private val q30 = Q("q30_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      val quotes = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_ns"), col("event_id"), col("value"))
      AsOfJoin.asOf(probes, quotes, Seq("user_id"),
          probeTime = "ts_ns", quoteTime = "ts_ns", tieBreak = "event_id",
          carry = Seq("event_id", "value", "ts_ns"))
        .select(col("event_id"), col("user_id"),
          col("ts_ns").as("p_ts_ns"),
          col("quote_event_id"),
          col("quote_value"),
          // age in µs; integer div (ns values exceed double's mantissa)
          expr("(ts_ns - quote_ts_ns) div 1000").as("age_us"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns
                       FROM events WHERE event_type = 'purchase'),
                 q AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, value
                       FROM events WHERE event_type = 'view'),
                 j AS (SELECT p.event_id, p.user_id, p.tns,
                              q.event_id AS qid, q.value AS qv, q.tns AS qtns,
                              row_number() OVER (PARTITION BY p.event_id
                                ORDER BY q.tns DESC, q.event_id DESC) AS rn
                       FROM p LEFT JOIN q
                         ON q.user_id = p.user_id AND q.tns <= p.tns)
            SELECT event_id, user_id, tns AS p_ts_ns,
                   qid AS quote_event_id, qv AS quote_value,
                   CASE WHEN qtns IS NULL THEN NULL
                        ELSE (tns - qtns) // 1000 END AS age_us
            FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Range join: each signup opens a 1-hour attribution window; count
    * and sum the same user's clicks inside it (inclusive bounds).
    * Signups with no clicks keep count 0 / null sum. Bucket width =
    * the window span, so each interval explodes to ≤ 2 buckets. */
  private val q31 = Q("q31_range_join",
    (s, d) => {
      val hourNs = 3600L * 1000000000L
      val ev = events(s, d)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts_ns").as("lo"))
        .withColumn("hi", col("lo") + lit(hourNs))
      val pts = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ns").as("pt"),
          col("event_id").as("click_id"), qdec2(col("value")).as("qv"))
      val hits = RangeJoin.joinRange(iv, pts, Seq("user_id"),
          "lo", "hi", "pt", bucketWidth = hourNs)
        .groupBy("signup_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("qv")).cast(DecimalType(38, 2)).as("sum_value"))
      iv.join(hits, Seq("signup_id"), "left")
        .select(col("signup_id"), col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          col("sum_value"))
        .orderBy("signup_id")
    },
    Some(s"""WITH s AS (SELECT event_id AS signup_id, user_id,
                          epoch_ns(ts) AS lo, epoch_ns(ts) + 3600000000000 AS hi
                        FROM events WHERE event_type = 'signup'),
                 c AS (SELECT user_id, epoch_ns(ts) AS pt,
                          ${Sql.qdec2("value")} AS qv
                       FROM events WHERE event_type = 'click'),
                 g AS (SELECT s.signup_id, count(*) AS cnt,
                              CAST(SUM(c.qv) AS DECIMAL(38,2)) AS sv
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
