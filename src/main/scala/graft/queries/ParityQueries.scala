package graft.queries

import graft.core.{Dedup, Upsert}
import graft.dim.{DimDate, DimSecurity}
import graft.util.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity operators (SURVEY.md §2.1-§2.7) embodied on the
  * driver testdata tables (`/root/repo/FIXTURES.md` §B maps each
  * reference operator to its testdata stand-in). Operator ids in each
  * scaladoc refer to SURVEY.md §2 rows.
  */
object ParityQueries {

  // Oracle-visible money stays in DOUBLE (half-up cent quantization) —
  // decimals never leave a checked query (see Analytics.qdbl2).
  private def qdbl2(c: Column): Column = graft.sa.Analytics.qdbl2(c)
  private val cutoff = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")

  /** S5/P4: typed scan with casts + required-field null filter
    * (ON_ERROR=CONTINUE parity). */
  private val q01 = Q("q01_typed_scan",
    (s, d) => lineitem(s, d)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"),
        qdbl2(col("l_quantity")).as("quantity"),
        qdbl2(col("l_extendedprice")).as("price"),
        col("l_returnflag").as("returnflag"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
      // (11,785 dup pairs at sf0.01) — order by every output column so
      // the ordering is total up to fully-identical rows.
      .orderBy("l_orderkey", "l_linenumber", "quantity", "price", "returnflag"),
    Some(s"""SELECT l_orderkey, l_linenumber,
            ${Sql.qdbl2("l_quantity")} AS quantity,
            ${Sql.qdbl2("l_extendedprice")} AS price,
            l_returnflag AS returnflag
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            ORDER BY l_orderkey, l_linenumber, quantity, price, returnflag"""))

  /** P2/P7: quality split — the reject-rule predicate with the constant
    * reason column (reference `4. merge_core.sql:24-45`). */
  private val q02 = Q("q02_quality_split",
    (s, d) => events(s, d).select(
        col("event_id"), col("value"),
        when(col("value") < 1.0, lit("REJECT")).otherwise(lit("VALID")).as("status"),
        when(col("value") < 1.0, lit("LOW_VALUE")).otherwise(lit(null).cast("string")).as("reject_reason"))
      .orderBy("event_id"),
    Some("""SELECT event_id, value,
            CASE WHEN value < 1.0 THEN 'REJECT' ELSE 'VALID' END AS status,
            CASE WHEN value < 1.0 THEN 'LOW_VALUE' ELSE NULL END AS reject_reason
            FROM events ORDER BY event_id"""))

  /** A1/A2: filtered per-date counts with the >0 load-gate shape
    * (reference `2. check_loaded.sql:6-8`). */
  private val q03 = Q("q03_count_gate",
    (s, d) => lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("ship_date"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 0)
      .orderBy("ship_date"),
    Some("""SELECT CAST(l_shipdate AS DATE) AS ship_date, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1 HAVING count(*) > 0 ORDER BY ship_date"""))

  /** A3/P3: DISTINCT on a normalized expression
    * (reference `3. premerge_metrics.sql:28-31`). */
  private val q04 = Q("q04_distinct_keys",
    (s, d) => customer(s, d)
      .select(upper(trim(col("c_mktsegment"))).as("segment"), col("c_nationkey"))
      .distinct()
      .orderBy("segment", "c_nationkey"),
    Some("""SELECT DISTINCT upper(trim(c_mktsegment)) AS segment, c_nationkey
            FROM customer ORDER BY segment, c_nationkey"""))

  /** A4: COALESCE(MAX(id),0)+1 next-surrogate scalar
    * (reference `5. merge_dim_security.sql:16`). */
  private val q05 = Q("q05_next_surrogate",
    (s, d) => customer(s, d)
      .agg((coalesce(max(col("c_custkey")), lit(0L)) + 1L).cast("long").as("next_id")),
    Some("SELECT CAST(coalesce(max(c_custkey),0)+1 AS BIGINT) AS next_id FROM customer"))

  /** Q1/A5/J1/J2: pre-merge metrics row — raw count, reject count,
    * insert/update estimates via semi join of distinct normalized keys,
    * stitched by cross joins of 1-row aggregates
    * (reference `3. premerge_metrics.sql:9-53`), plus the loader's
    * ON_ERROR=CONTINUE skip count (rows_parsed − rows_loaded, the COPY
    * load-history number `1. copy_to_raw.sql:38` — here the rows of
    * the batch window whose key field failed to parse, modeled as a
    * null `o_custkey`; raw_cnt counts only the LOADED rows, matching
    * what lands in RAW). */
  private val q06 = Q("q06_premerge_metrics",
    (s, d) => {
      val o = orders(s, d)
      // TPC-H o_custkey is never null, so an un-seeded skip leg would be
      // identically 0 at every scale factor and the oracle could never
      // catch a divergence in the skip-count path. Seed unparseable key
      // rows deterministically (a fixed orderkey residue class, the x40
      // convention — both engines apply the identical seeding): 8 rows
      // at sf0.001, 82 at sf0.01, 806 at sf0.1.
      val window0 = o.filter(col("o_orderdate") >= lit(cutoff))
        .withColumn("o_custkey",
          when(col("o_orderkey") % 97 === 0, lit(null))
            .otherwise(col("o_custkey")))
      val raw = window0.filter(col("o_custkey").isNotNull)
      val rejectPred = col("o_orderpriority") === "1-URGENT"
      val vk = raw.filter(!rejectPred).select("o_custkey").distinct()
      val existing = o.filter(col("o_orderdate") < lit(cutoff))
        .select("o_custkey").distinct()
      val updates = vk.join(existing, Seq("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("est_updates"))
      raw.agg(count(lit(1)).as("raw_cnt"))
        .crossJoin(window0.filter(col("o_custkey").isNull)
          .agg(count(lit(1)).as("skipped_cnt")))
        .crossJoin(raw.filter(rejectPred).agg(count(lit(1)).as("reject_cnt")))
        .crossJoin(vk.agg(count(lit(1)).as("vk_cnt")))
        .crossJoin(updates)
        .select(col("raw_cnt"), col("skipped_cnt"), col("reject_cnt"),
          (col("vk_cnt") - col("est_updates")).as("est_inserts"), col("est_updates"))
    },
    Some("""WITH w AS (SELECT * REPLACE (CASE WHEN o_orderkey % 97 = 0 THEN NULL
                                              ELSE o_custkey END AS o_custkey)
                       FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
            raw AS (SELECT * FROM w WHERE o_custkey IS NOT NULL),
            vk AS (SELECT DISTINCT o_custkey FROM raw WHERE NOT (o_orderpriority = '1-URGENT')),
            ex AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
            m AS (SELECT CAST(count(*) AS BIGINT) AS est_updates FROM vk
                  WHERE o_custkey IN (SELECT o_custkey FROM ex))
            SELECT CAST((SELECT count(*) FROM raw) AS BIGINT) AS raw_cnt,
                   CAST((SELECT count(*) FROM w WHERE o_custkey IS NULL) AS BIGINT) AS skipped_cnt,
                   CAST((SELECT count(*) FROM raw WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS reject_cnt,
                   CAST((SELECT count(*) FROM vk) AS BIGINT) - m.est_updates AS est_inserts,
                   m.est_updates
            FROM m"""))

  /** W1: latest-wins dedup — ROW_NUMBER partitioned by key, ordered by
    * recency with a deterministic tie-break, keep rn=1
    * (reference `4. merge_core.sql:72-81`). */
  private val q07 = Q("q07_dedup_latest_wins",
    (s, d) => Dedup.latestWins(lineitem(s, d), Seq("l_orderkey"),
        // (l_shipdate, l_linenumber) has exact-tie groups in the synthetic
        // data; l_partkey makes the ordering total (verified unique on
        // (l_orderkey, l_shipdate, l_linenumber, l_partkey) at sf0.01/0.1).
        Seq(col("l_shipdate").desc, col("l_linenumber").desc, col("l_partkey").desc))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"))
      .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey, l_partkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
            FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC) AS rn FROM lineitem)
            WHERE rn = 1 ORDER BY l_orderkey"""))

  /** W2: dense ordered surrogate ids over a distinct key set
    * (reference `5. merge_dim_security.sql:16,27`). */
  private val q08 = Q("q08_surrogate_ids",
    (s, d) => {
      val brands = part(s, d).select("p_brand").distinct()
      brands.select(
        (row_number().over(Window.orderBy("p_brand")) + lit(100)).cast("long").as("brand_id"),
        col("p_brand"))
        .orderBy("brand_id")
    },
    Some("""SELECT CAST(row_number() OVER (ORDER BY p_brand) + 100 AS BIGINT) AS brand_id, p_brand
            FROM (SELECT DISTINCT p_brand FROM part) ORDER BY brand_id"""))

  /** J5/M1: insert-only merge = source LEFT ANTI target
    * (reference `4. merge_core.sql:24-45`): customers first seen in the
    * incoming slice. */
  private val q09 = Q("q09_merge_insert_only",
    (s, d) => {
      val o = orders(s, d)
      val incoming = o.filter(col("o_orderdate") >= lit(cutoff))
        .select("o_custkey").distinct()
      val existing = o.filter(col("o_orderdate") < lit(cutoff))
        .select("o_custkey").distinct()
      incoming.join(existing, Seq("o_custkey"), "left_anti").orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1998-01-01') i
            WHERE o_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate < TIMESTAMP '1998-01-01')
            ORDER BY o_custkey"""))

  /** M2/M5/J4: full upsert — source wins on the key, unmatched target
    * rows survive (reference `4. merge_core.sql:83-96`). Target/source =
    * latest order per customer before/after the cutoff (each deduped with
    * W1 first, as the reference's merge source is). */
  private val q10 = Q("q10_merge_upsert",
    (s, d) => {
      val o = orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        qdbl2(col("o_totalprice")).as("totalprice"),
        col("o_orderdate").cast("date").as("order_date"))
      def latest(df: DataFrame) = Dedup.latestWins(df, Seq("o_custkey"),
        Seq(col("order_date").desc, col("o_orderkey").desc))
      val target = latest(o.filter(col("order_date") < lit(java.sql.Date.valueOf("1998-01-01"))))
      val source = latest(o.filter(col("order_date") >= lit(java.sql.Date.valueOf("1998-01-01"))))
      Upsert.merge(target, source, Seq("o_custkey")).orderBy("o_custkey")
    },
    Some(s"""WITH o AS (SELECT o_custkey, o_orderkey,
                  ${Sql.qdbl2("o_totalprice")} AS totalprice,
                  CAST(o_orderdate AS DATE) AS order_date FROM orders),
            t AS (SELECT o_custkey, o_orderkey, totalprice, order_date FROM
                   (SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY order_date DESC, o_orderkey DESC) AS rn
                    FROM o WHERE order_date < DATE '1998-01-01') WHERE rn = 1),
            s AS (SELECT o_custkey, o_orderkey, totalprice, order_date FROM
                   (SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY order_date DESC, o_orderkey DESC) AS rn
                    FROM o WHERE order_date >= DATE '1998-01-01') WHERE rn = 1)
            SELECT * FROM (
              SELECT * FROM t WHERE o_custkey NOT IN (SELECT o_custkey FROM s)
              UNION ALL SELECT * FROM s)
            ORDER BY o_custkey"""))

  /** M4/§2.8: calendar dimension derivation with every dialect trap
    * pinned (DOW 0=Sunday, 3-letter names, ISO week)
    * (reference `6. dm_dim_date.sql:17-37`). */
  private val q11 = Q("q11_dim_date",
    (s, d) => DimDate.derive(orders(s, d), "o_orderdate").orderBy("date_sk"),
    Some("""WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS cal_date FROM orders)
            SELECT CAST(year(cal_date)*10000 + month(cal_date)*100 + day(cal_date) AS INT) AS date_sk,
                   cal_date,
                   CAST(year(cal_date) AS INT) AS year_num,
                   CAST(quarter(cal_date) AS INT) AS quarter_num,
                   CAST(month(cal_date) AS INT) AS month_num,
                   strftime(cal_date, '%b') AS month_name,
                   CAST(day(cal_date) AS INT) AS day_num,
                   strftime(cal_date, '%a') AS day_name,
                   CAST(dayofweek(cal_date) AS INT) AS day_of_week,
                   CAST(weekofyear(cal_date) AS INT) AS week_of_year,
                   dayofweek(cal_date) IN (0, 6) AS is_weekend
            FROM dd ORDER BY date_sk"""))

  /** A4+W2+M3 composed: dim maintenance — existing dim keeps its ids, new
    * normalized symbols get dense ids continuing from MAX
    * (reference `5. merge_dim_security.sql:22-37`). */
  private val q12 = Q("q12_dim_security_merge",
    (s, d) => {
      val n = nation(s, d)
      val existing = n.filter(col("n_regionkey") <= 1).select("n_name").distinct()
        .select(row_number().over(Window.orderBy("n_name")).cast("long").as("security_id"),
          col("n_name").as("symbol"))
      DimSecurity.merge(existing, n.select(col("n_name")), "n_name")
        .orderBy("security_id")
    },
    Some("""WITH ex AS (SELECT CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS security_id,
                               n_name AS symbol
                        FROM (SELECT DISTINCT n_name FROM nation WHERE n_regionkey <= 1)),
            inc AS (SELECT DISTINCT upper(trim(n_name)) AS symbol FROM nation
                    WHERE n_name IS NOT NULL AND trim(n_name) <> ''),
            nw AS (SELECT symbol FROM inc WHERE symbol NOT IN (SELECT symbol FROM ex)),
            mx AS (SELECT CAST(coalesce(max(security_id), 0) AS BIGINT) AS m FROM ex)
            SELECT security_id, symbol FROM ex
            UNION ALL
            SELECT CAST(row_number() OVER (ORDER BY symbol) + (SELECT m FROM mx) AS BIGINT), symbol FROM nw
            ORDER BY security_id"""))

  /** J3: star join with broadcast dims and a computed date_sk join key
    * (reference `7. merge_fact_daily_price.sql:33-36`). */
  private val q13 = Q("q13_star_join",
    (s, d) => {
      val li = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val n = nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("c_custkey"),
          col("n_name"),
          DimDate.dateSk(col("o_orderdate").cast("date")).as("date_sk"),
          qdbl2(col("l_extendedprice")).as("price"))
        // total order up to identical rows — see q01 note
        .orderBy("l_orderkey", "l_linenumber", "c_custkey", "n_name", "date_sk", "price")
    },
    Some(s"""SELECT l_orderkey, l_linenumber, c_custkey, n_name,
                   CAST(year(CAST(o_orderdate AS DATE))*10000 + month(CAST(o_orderdate AS DATE))*100
                        + day(CAST(o_orderdate AS DATE)) AS INT) AS date_sk,
                   ${Sql.qdbl2("l_extendedprice")} AS price
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY l_orderkey, l_linenumber, c_custkey, n_name, date_sk, price"""))

  /** J3 (dim-date leg)/J5: semi join — EXISTS-shaped referential check. */
  private val q14 = Q("q14_semi_join",
    (s, d) => {
      val o = orders(s, d)
      val li = lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity > 45)
            ORDER BY o_orderkey"""))

  /** Q2/J6: post-merge reconciliation — two scalar subqueries in one row
    * (reference `8. postmerge_metrics.sql:16-25`). */
  private val q15 = Q("q15_postmerge_metrics",
    (s, d) => {
      val coreRows = lineitem(s, d)
        .filter(col("l_shipdate") >= lit(cutoff))
        .agg(count(lit(1)).as("core_rows"))
      val factRows = orders(s, d)
        .filter(col("o_orderdate") >= lit(cutoff))
        .agg(count(lit(1)).as("fact_rows"))
      coreRows.crossJoin(factRows)
    },
    Some("""SELECT CAST((SELECT count(*) FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01') AS BIGINT) AS core_rows,
                   CAST((SELECT count(*) FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS BIGINT) AS fact_rows"""))

  /** J1 under skew (SURVEY.md §4 scale utility, checked): the salted
    * equi-join — the hot-key mitigation for the cases AQE's runtime
    * skew splitting cannot reach (see [[graft.core.SkewJoin]]). The
    * large side gets a deterministic content-hash salt, the small side
    * explodes to every salt value, and the join runs on (key, salt) so
    * a hot supplier spreads over 8 tasks instead of one. The oracle is
    * the PLAIN inner join — salting must never change the answer
    * (PlanSpec pins that the salt actually reaches the join keys). */
  private val q34 = Q("q34_skew_join",
    (s, d) => {
      val large = lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey").as("suppkey"), qdbl2(col("l_extendedprice")).as("price"))
      val small = supplier(s, d).select(col("s_suppkey").as("suppkey"), col("s_name"))
      graft.core.SkewJoin.saltedInnerJoin(large, small, Seq("suppkey"), 8)
        // total order up to identical rows — see q01 note
        .orderBy("l_orderkey", "l_linenumber", "suppkey", "price", "s_name")
    },
    Some(s"""SELECT l_orderkey, l_linenumber, l_suppkey AS suppkey,
                   ${Sql.qdbl2("l_extendedprice")} AS price, s_name
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            ORDER BY l_orderkey, l_linenumber, suppkey, price, s_name"""))

  val qs: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q34)
}
