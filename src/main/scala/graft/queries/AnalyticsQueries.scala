package graft.queries

import graft.sa.Analytics
import graft.util.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serving-layer / dashboard analytics (SURVEY.md §2.3 A6-A10,
  * §2.6 W3-W6) on the testdata embodiments: `lineitem`/`orders` stand in
  * for the fact table, `events(ts, value)` for the per-security daily
  * series (FIXTURES.md §B).
  */
object AnalyticsQueries {

  // Oracle-visible numbers stay in DOUBLE; accumulation runs in exact
  // integer decimals (cents / percent) — see Analytics.qdbl2 for the
  // driver-compare representation contract that forbids decimal outputs.
  private def qdbl2(c: Column): Column = Analytics.qdbl2(c)
  private def cents2(c: Column): Column = Analytics.cents2(c)
  private def pct(c: Column): Column = Analytics.pct(c)
  private val hundred = lit(100).cast(DecimalType(3, 0))
  /** Σ(exact integer decimal) → double, mirrored by `Sql.dbl` + `/scale`. */
  private def sumDbl(c: Column, scale: Double): Column =
    sum(c).cast(DecimalType(38, 0)).cast("double") / lit(scale)

  /** A1/A6/A8: pricing summary — grouped sums/averages/counts over exact
    * integer accumulation (TPC-H Q1 shape; the dashboard's traded-value
    * and average cards). Cents × integer percents keep every addend
    * exact; the one double conversion per measure happens on the final
    * sum (`Sql.dbl` hi/lo split on the oracle side — sum_charge exceeds
    * 2⁵³ at sf0.1, where DuckDB's native int128→double cast is not
    * correctly rounded). */
  private val q16 = Q("q16_pricing_summary",
    (s, d) => {
      val qc = cents2(col("l_quantity"))
      val pc = cents2(col("l_extendedprice"))
      val dp = pct(col("l_discount"))
      val tp = pct(col("l_tax"))
      lineitem(s, d)
        .filter(col("l_shipdate").cast("date") <= lit(java.sql.Date.valueOf("2001-03-31")))
        .groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
        .agg(
          sumDbl(qc, 100.0).as("sum_qty"),
          sumDbl(pc, 100.0).as("sum_base_price"),
          sumDbl(pc * (hundred - dp), 10000.0).as("sum_disc_price"),
          sumDbl(pc * (hundred - dp) * (hundred + tp), 1000000.0).as("sum_charge"),
          sumDbl(dp, 100.0).as("__sum_disc"),
          count(lit(1)).as("count_order"))
        // averages derive from the aggregated sums (same `sum/count` IEEE
        // division as aggregating twice, without duplicate aggregates)
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .withColumn("avg_disc", col("__sum_disc") / col("count_order"))
        .select(col("returnflag"), col("linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
          col("avg_qty"), col("avg_price"), col("avg_disc"), col("count_order"))
        .orderBy("returnflag", "linestatus")
    },
    Some({
      val qc = Sql.cents2("l_quantity")
      val pc = s"CAST(${Sql.cents2("l_extendedprice")} AS HUGEINT)"
      val dp = s"CAST(${Sql.pct("l_discount")} AS HUGEINT)"
      val tp = s"CAST(${Sql.pct("l_tax")} AS HUGEINT)"
      s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
              (${Sql.dbl(s"SUM($qc)")} / 100.0) AS sum_qty,
              (${Sql.dbl(s"SUM($pc)")} / 100.0) AS sum_base_price,
              (${Sql.dbl(s"SUM($pc * (100 - $dp))")} / 10000.0) AS sum_disc_price,
              (${Sql.dbl(s"SUM($pc * (100 - $dp) * (100 + $tp))")} / 1000000.0) AS sum_charge,
              (${Sql.dbl(s"SUM($qc)")} / 100.0 / count(*)) AS avg_qty,
              (${Sql.dbl(s"SUM($pc)")} / 100.0 / count(*)) AS avg_price,
              (${Sql.dbl(s"SUM(${Sql.pct("l_discount")})")} / 100.0 / count(*)) AS avg_disc,
              CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) <= DATE '2001-03-31'
            GROUP BY 1, 2 ORDER BY returnflag, linestatus"""
    }))

  /** A9/A6: revenue contribution share per nation — group-by revenue over
    * the star join with an unpartitioned window sum as denominator. */
  private val q17 = Q("q17_share_of_total",
    (s, d) => {
      val joined = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      Analytics.shareOfTotal(joined, "n_name",
        cents2(col("l_extendedprice")) * (hundred - pct(col("l_discount"))),
        scale = 10000.0)
        .orderBy("n_name")
    },
    Some({
      val pc = s"CAST(${Sql.cents2("l_extendedprice")} AS HUGEINT)"
      val dp = s"CAST(${Sql.pct("l_discount")} AS HUGEINT)"
      s"""WITH r AS (
              SELECT n_name, SUM($pc * (100 - $dp)) AS revs
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name)
            SELECT n_name,
                   (${Sql.dbl("revs")} / 10000.0) AS rev,
                   ((${Sql.dbl("revs")} / 10000.0)
                     / (${Sql.dbl("SUM(revs) OVER ()")} / 10000.0)) AS share
            FROM r ORDER BY n_name"""
    }))

  /** A7: exact distinct counts (the "Total Symbol" card; at 100 TB the
    * approx_count_distinct variant is the scale path — see x-queries). */
  private val q18 = Q("q18_distinct_counts",
    (s, d) => lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
                   CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM lineitem"""))

  /** W6 (global top-N): top 10 orders by value, total order via key
    * tie-break. */
  private val q19 = Q("q19_top_n_global",
    (s, d) => orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), qdbl2(col("o_totalprice")).as("totalprice"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(10),
    Some(s"""SELECT o_orderkey, o_custkey, ${Sql.qdbl2("o_totalprice")} AS totalprice
            FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 10"""))

  /** W6 (per-group top-N): top 3 line items per return flag. Runs
    * through [[Analytics.topNPerGroup]] — the salted two-phase window
    * that avoids the 3-partition global sort a naive
    * `PARTITION BY l_returnflag` would be at 100 TB (the ordering is
    * total, so the result is bit-identical to the one-phase oracle). */
  private val q20 = Q("q20_top_n_per_group",
    (s, d) => {
      val ordering = Seq(qdbl2(col("l_extendedprice")).desc,
        col("l_orderkey"), col("l_linenumber"))
      Analytics.topNPerGroup(lineitem(s, d), Seq("l_returnflag"), ordering, 3)
        .select(col("l_returnflag").as("returnflag"), col("rnk"),
          col("l_orderkey"), col("l_linenumber"), qdbl2(col("l_extendedprice")).as("price"))
        .orderBy("returnflag", "rnk")
    },
    Some(s"""SELECT l_returnflag AS returnflag, rnk, l_orderkey, l_linenumber,
                   ${Sql.qdbl2("l_extendedprice")} AS price
            FROM (SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY ${Sql.qdbl2("l_extendedprice")} DESC, l_orderkey, l_linenumber) AS INT) AS rnk
                  FROM lineitem)
            WHERE rnk <= 3 ORDER BY returnflag, rnk"""))

  /** W3: 30-row trailing liquidity window per user over the event series
    * (the dashboard's "30-day rolling avg volume / traded value"). */
  private val q21 = Q("q21_rolling_30",
    (s, d) => Analytics.rollingRows(events(s, d), "user_id",
        Seq(col("ts"), col("event_id")), "value", 30, "30")
      .select(col("event_id"), col("user_id"), col("sum_30"), col("n_30"), col("avg_30"))
      .orderBy("event_id"),
    Some(s"""SELECT event_id, user_id,
                   (${Sql.dbl(s"SUM(${Sql.cents2("value")}) OVER w")} / 100.0) AS sum_30,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_30,
                   ((${Sql.dbl(s"SUM(${Sql.cents2("value")}) OVER w")} / 100.0) / (COUNT(*) OVER w)) AS avg_30
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  /** W3 (calendar-day flavor): 30-day RANGE frame on an integer day
    * number — peers on the same day share the frame. */
  private val q22 = Q("q22_rolling_days_range",
    (s, d) => {
      val withDay = events(s, d).withColumn("day_num",
        datediff(col("ts").cast("date"), lit(java.sql.Date.valueOf("1970-01-01"))))
      Analytics.rollingDays(withDay, "user_id", "day_num", "value", 30, "31d")
        .select(col("event_id"), col("user_id"), col("day_num"),
          col("sum_31d"), col("n_31d"))
        .orderBy("event_id")
    },
    Some(s"""SELECT event_id, user_id,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS day_num,
                   (${Sql.dbl(s"SUM(${Sql.cents2("value")}) OVER w")} / 100.0) AS sum_31d,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_31d
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT)
                         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  /** W5: lag-based simple returns per user (the dashboard's daily return
    * trend). Per-row double arithmetic; first row per user is null. */
  private val q23 = Q("q23_lag_return",
    (s, d) => Analytics.lagReturn(events(s, d), "user_id",
        Seq(col("ts"), col("event_id")), "value")
      .select(col("event_id"), col("user_id"), col("value"),
        col("prev_value"), col("ret"))
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id, value,
                   lag(value) OVER w AS prev_value,
                   value / (lag(value) OVER w) - 1 AS ret
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""))

  /** W3+W4 composed — the dashboard's actual "liquidity rank 30 days"
    * column (reference `dashboard/securities_market_report1.jpg` footer):
    * per entity, the trailing-30-day rolling average of traded value at
    * its LATEST event, ranked descending. Exact decimal rolling sums; the
    * avg's single decimal→double division is engine-identical (values
    * stay far below 2^53). */
  private val q27 = Q("q27_liquidity_rank_30d",
    (s, d) => {
      val withDay = events(s, d).withColumn("day_num",
        datediff(col("ts").cast("date"), lit(java.sql.Date.valueOf("1970-01-01"))))
      // 29 PRECEDING + current day = a true trailing 30-CALENDAR-DAY
      // window (q21/q22 use 30 PRECEDING and honestly label it 31d)
      val rolled = Analytics.rollingDays(withDay, "user_id", "day_num", "value", 29, "30d")
      // order by the µs ts (what the oracle sees), NOT ts_ns: DuckDB
      // truncates the nano timestamps to µs at read time, so a ns-refined
      // ordering could pick a different "latest" row than the oracle if
      // a user ever logged two events in one µs (event_id disambiguates)
      val latest = rolled.withColumn("__rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("sum_30d"), col("n_30d"),
          (col("sum_30d") / col("n_30d")).as("avg_30d"))
      latest.withColumn("liq_rank",
          rank().over(Window.orderBy(col("avg_30d").desc)).cast("int"))
        .orderBy("user_id")
    },
    Some(s"""WITH r AS (SELECT user_id, event_id, ts,
                   (${Sql.dbl(s"SUM(${Sql.cents2("value")}) OVER w")} / 100.0) AS sum_30d,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_30d
                 FROM events
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT)
                              RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)),
                 l AS (SELECT user_id, sum_30d, n_30d,
                         sum_30d / n_30d AS avg_30d,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
                       FROM r)
            SELECT user_id, sum_30d, n_30d, avg_30d,
                   CAST(rank() OVER (ORDER BY avg_30d DESC) AS INT) AS liq_rank
            FROM l WHERE rn = 1 ORDER BY user_id"""))

  /** W4: rank with ties on a discrete measure (liquidity rank). Runs
    * through [[Analytics.scalableRank]] — the distinct-value prefix-sum
    * path that avoids the single-partition sort of an unpartitioned
    * `rank()` window when the ranked population outgrows dim cardinality
    * (the window formulation stays as the semantic reference in q27). */
  private val q24 = Q("q24_rank",
    (s, d) => {
      val grouped = events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      Analytics.scalableRank(grouped, "n_events", ascending = false)
        .select(col("user_id"), col("n_events"), col("rnk").cast("int").as("rnk"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(rank() OVER (ORDER BY count(*) DESC) AS INT) AS rnk
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** A10: volatility — sample stddev of lag returns per user, made
    * bit-reproducible across engines via integer-quantized returns and an
    * exact decimal variance numerator (see
    * [[graft.sa.Analytics.volatility]] for the numeric contract). The
    * oracle converts the >2⁵³ numerator to double via an exact hi/lo
    * split (hi·2⁴⁰ + lo, one rounded add = correctly rounded) because
    * DuckDB's native int128→double cast is NOT correctly rounded, while
    * Spark's BigDecimal cast is. The split is exact only while the hi
    * limb itself is exactly representable: hi = num // 2⁴⁰ < 2⁵³, i.e.
    * num < 2⁹³ — far above the testdata's actual envelope, which
    * VolatilityBoundSpec asserts at sf0.1 (and any deployment at a data
    * scale approaching 2⁹³ must re-derive the split width). */
  private val q25 = Q("q25_volatility",
    (s, d) => {
      val rets = Analytics.lagReturn(events(s, d), "user_id",
        Seq(col("ts"), col("event_id")), "value")
      Analytics.volatility(rets, "user_id", "ret").orderBy("user_id")
    },
    Some("""WITH r AS (
              SELECT user_id,
                CAST(floor((value / (lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - 1) * 1000000)
                     AS DECIMAL(13,0)) AS m
              FROM events),
            g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rets,
                         CAST(SUM(m) AS DECIMAL(18,0)) AS sx,
                         CAST(SUM(CAST(CAST(m AS DECIMAL(19,0)) * m AS DECIMAL(33,0))) AS DECIMAL(33,0)) AS sx2
                  FROM r WHERE m IS NOT NULL GROUP BY user_id),
            v AS (SELECT user_id, n_rets,
                         CAST(n_rets AS HUGEINT) * CAST(sx2 AS HUGEINT)
                           - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS num
                  FROM g WHERE n_rets >= 2)
            SELECT user_id, n_rets,
                   sqrt((CAST(num // 1099511627776 AS DOUBLE) * 1099511627776.0 + CAST(num % 1099511627776 AS DOUBLE))
                        / (n_rets * (n_rets - 1))) / 1000000.0 AS vol
            FROM v ORDER BY user_id"""))

  /** §2.8 scalar-function round-trip: regex field extraction from the
    * JSON-ish props string (get_json_object-equivalent surface, done with
    * the cross-engine-identical regex primitive). */
  private val q26 = Q("q26_json_field_extract",
    (s, d) => events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": *(-?[0-9]+)", 1).cast("int").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
                   CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS INT) AS k
            FROM events ORDER BY event_id"""))

  /** A-family extension: exact discrete percentiles (p50/p90/p99 of the
    * quantized price per return flag) via the rank formula — value at
    * row ceil(p·n) in sort order, integer arithmetic on both engines
    * (Spark's `percentile`/DuckDB's `quantile_cont` interpolate in
    * double and are not bit-portable; the discrete pick is). The picked
    * VALUE is tie-insensitive, so no tie-break is needed in the sort.
    * Scale path: `approx_percentile` (KLL-sketch, map-side merged) —
    * error-bound-tested in PercentileSpec; the exact window form here is
    * per-group single-partition like any exact percentile. */
  private val q29 = Q("q29_percentiles",
    (s, d) => {
      val b = lineitem(s, d).select(col("l_returnflag").as("returnflag"),
        qdbl2(col("l_extendedprice")).as("price"))
      val wOrd = Window.partitionBy("returnflag").orderBy("price")
      val wAll = Window.partitionBy("returnflag")
      b.withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("returnflag")
        .agg(
          max(when(col("rn") === expr("(n + 1) div 2"), col("price"))).as("p50"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("price"))).as("p90"),
          max(when(col("rn") === expr("(99 * n + 99) div 100"), col("price"))).as("p99"),
          max(col("n")).as("n"))
        .orderBy("returnflag")
    },
    Some(s"""WITH b AS (SELECT l_returnflag AS returnflag,
                    ${Sql.qdbl2("l_extendedprice")} AS price FROM lineitem),
             r AS (SELECT returnflag, price,
                     row_number() OVER (PARTITION BY returnflag ORDER BY price) AS rn,
                     count(*) OVER (PARTITION BY returnflag) AS n
                   FROM b)
            SELECT returnflag,
                   max(CASE WHEN rn = (n + 1) // 2 THEN price END) AS p50,
                   max(CASE WHEN rn = (9 * n + 9) // 10 THEN price END) AS p90,
                   max(CASE WHEN rn = (99 * n + 99) // 100 THEN price END) AS p99,
                   CAST(max(n) AS BIGINT) AS n
            FROM r GROUP BY returnflag ORDER BY returnflag"""))

  /** Sessionization (gaps-and-islands over the events stream table —
    * see [[graft.sa.Analytics.sessionize]]): per-user sessions split on
    * 30-minute quiet gaps, with per-session span, event count, and
    * exact-cents value totals. The batch form of Structured Streaming's
    * `session_window`. */
  private val q37 = Q("q37_sessionize",
    (s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_id"), col("ts"),
        graft.sa.Analytics.cents2(col("value")).as("vc"))
      graft.sa.Analytics.sessionize(e, "user_id", "ts",
          Seq(col("ts").asc, col("event_id").asc), gap = "30 MINUTE")
        .groupBy("user_id", "session_id")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"),
          (sum(col("vc")).cast(DecimalType(38, 0)).cast("double") / lit(100.0))
            .as("total_value"))
        .orderBy("user_id", "session_id")
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                    ${Sql.cents2("value")} AS vc FROM events),
             l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
                   FROM e),
             m AS (SELECT *, CASE WHEN pts IS NULL OR ts > pts + INTERVAL 30 MINUTE
                                  THEN 1 ELSE 0 END AS brk FROM l),
             s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                   FROM m)
             SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                    min(ts) AS session_start, max(ts) AS session_end,
                    CAST(count(*) AS BIGINT) AS n_events,
                    (${Sql.dbl("sum(vc)")} / 100.0) AS total_value
             FROM s GROUP BY 1, 2 ORDER BY user_id, session_id"""))

  /** A9 through the ENRICHED security dimension — the dashboard's
    * sector-contribution visual (reference
    * `dashboard/securities_market_report1.jpg` slices measures by the
    * dim's sector/industry/type attributes): distinct symbols (nation
    * names, the q12 dim embodiment) run through
    * [[graft.dim.DimSecurity.enrich]]'s deterministic md5-pick
    * attributes, the q17 star-join revenue rolls up per SECTOR, and
    * share-of-total divides by the unpartitioned window sum. The
    * oracle replays the md5-prefix vocabulary pick (the engine's
    * shared oracle-portable hash primitive) and the exact-decimal
    * revenue accumulation — the first checked query through the
    * enriched dim rather than a testdata stand-in column. The enriched
    * dim is tiny at any scale (one row per security) and broadcasts. */
  private val q38 = Q("q38_sector_share",
    (s, d) => {
      val rich = graft.dim.DimSecurity.enrich(
        nation(s, d).select(upper(trim(col("n_name"))).as("symbol")).distinct())
      val joined = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rich), upper(trim(col("n_name"))) === col("symbol"))
      Analytics.shareOfTotal(joined, "sector",
        cents2(col("l_extendedprice")) * (hundred - pct(col("l_discount"))),
        scale = 10000.0)
        .orderBy("sector")
    },
    Some({
      val pc = s"CAST(${Sql.cents2("l_extendedprice")} AS HUGEINT)"
      val dp = s"CAST(${Sql.pct("l_discount")} AS HUGEINT)"
      s"""WITH syms AS (SELECT DISTINCT upper(trim(n_name)) AS symbol FROM nation),
              rich AS (SELECT symbol,
                  (['Technology','Financials','Health Care','Energy','Industrials','Consumer','Utilities','Materials'])[
                    CAST(CAST('0x'||substr(md5(symbol || '|sector'),1,15) AS UBIGINT) AS BIGINT) % 8 + 1] AS sector
                FROM syms),
              r AS (
                SELECT rich.sector, SUM($pc * (100 - $dp)) AS revs
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                JOIN rich ON rich.symbol = upper(trim(n_name))
                GROUP BY rich.sector)
            SELECT sector,
                   (${Sql.dbl("revs")} / 10000.0) AS rev,
                   ((${Sql.dbl("revs")} / 10000.0)
                     / (${Sql.dbl("SUM(revs) OVER ()")} / 10000.0)) AS share
            FROM r ORDER BY sector"""
    }))

  /** The full enriched-dimension surface as a checked query: every
    * attribute [[graft.dim.DimSecurity.enrich]] derives — name casing,
    * all three md5-pick vocabularies, and the watchlist flag — replayed
    * by the oracle (q38 checks only the sector leg through the rollup;
    * this is the dim-grain row set the dashboard's slicers read).
    * DuckDB has no `initcap`, so the oracle emulates Spark's
    * word-grain semantics with a split/capitalize/join fold. */
  private val q39 = Q("q39_dim_enriched",
    (s, d) => {
      val dim = nation(s, d)
        .select(upper(trim(col("n_name"))).as("symbol")).distinct()
      graft.dim.DimSecurity.enrich(dim.select(
          row_number().over(Window.orderBy("symbol")).cast("long")
            .as("security_id"),
          col("symbol")))
        .orderBy("symbol")
    },
    Some("""WITH syms AS (SELECT DISTINCT upper(trim(n_name)) AS symbol FROM nation),
             ids AS (SELECT CAST(row_number() OVER (ORDER BY symbol) AS BIGINT) AS security_id,
                            symbol
                     FROM syms),
             h AS (SELECT security_id, symbol,
                     CAST(CAST('0x'||substr(md5(symbol||'|sector'),1,15) AS UBIGINT) AS BIGINT) % 8 AS hs,
                     CAST(CAST('0x'||substr(md5(symbol||'|industry'),1,15) AS UBIGINT) AS BIGINT) % 12 AS hi,
                     CAST(CAST('0x'||substr(md5(symbol||'|type'),1,15) AS UBIGINT) AS BIGINT) % 3 AS ht,
                     CAST(CAST('0x'||substr(md5(symbol||'|wl'),1,15) AS UBIGINT) AS BIGINT) % 5 AS hw
                   FROM ids)
            SELECT security_id, symbol,
                   array_to_string(list_transform(string_split(lower(trim(symbol)), ' '),
                     w -> CASE WHEN len(w)=0 THEN w ELSE upper(w[1])||substr(w,2) END), ' ') AS security_name,
                   (['Technology','Financials','Health Care','Energy','Industrials','Consumer','Utilities','Materials'])[hs+1] AS sector,
                   (['Software','Banks','Pharma','Oil & Gas','Machinery','Retail','Electric','Chemicals','Semiconductors','Insurance','Biotech','Mining'])[hi+1] AS industry,
                   (['Equity','ETF','Unit'])[ht+1] AS security_type,
                   (hw = 0) AS is_watchlist
            FROM h ORDER BY symbol"""))

  val qs: Seq[Q] = Seq(q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q29, q37, q38, q39)
}
