package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Functions => F, Tables}

/** Core relational surface: scans, filters, joins, aggregations, windows —
  * the reference's gold analytics queries (SURVEY.md §2.9) re-expressed over
  * the test star schema, plus the classic pricing summary.
  *
  * Scale notes (100 TB): every query is pure DataFrame lineage — filters and
  * projections push into the parquet scans; small dims (nation/region/tier)
  * broadcast; the only wide operations are the groupBy/join shuffles on the
  * fact tables, which partition by their keys and pre-aggregate map-side.
  */
object Core {

  /** Pinned "now" for epoch arithmetic — the reference derives ages from
    * CURRENT_TIMESTAMP (silver_etl.py:156-160); a pinned literal keeps every
    * run and the oracle deterministic (SURVEY.md §7.5.1). */
  val PinnedNow = "2002-01-01 00:00:00"

  /** Money/value columns are 2-decimal values stored as doubles. Summing
    * doubles is order-dependent (Spark's partial-agg merge order is
    * nondeterministic), and a 2-decimal sum over a count lands EXACTLY on
    * half-cent boundaries (e.g. 68128011/18 cents = 3784889.5) where
    * Spark's and DuckDB's double rounding legitimately disagree. All money
    * SUM/AVG therefore goes through the exact DECIMAL / integer-floor
    * helpers — associative, bit-stable at any partition count. */
  import graft.engine.Functions.{dec2, decPct, sumMoney, avgMoney, avgIntExact}
  import OracleSql.{avgMoneySql, avgIntExactSql}

  // ── q01: pricing summary — scan + filter + groupBy w/ sum/avg/count (A2/A6)
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - decPct(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - decPct(col("l_discount")))
          * (lit(1) + decPct(col("l_tax")))), 2).cast("double").as("sum_charge"),
        avgIntExact(sum("l_quantity"), count(lit(1))).as("avg_qty"),
        avgMoney(col("l_extendedprice"), count(lit(1))).as("avg_price"),
        avgMoney(col("l_discount"), count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      |  ${avgIntExactSql("l_quantity", "COUNT(*)")} AS avg_qty,
      |  ${avgMoneySql("l_extendedprice", "COUNT(*)")} AS avg_price,
      |  ${avgMoneySql("l_discount", "COUNT(*)", 4)} AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ── q02: daily engagement summary — gold MV #1 (A6/A7/F7/F10) ──
  // Group by the date only (cheapest shuffle key), derive calendar attributes
  // after aggregation — at 100 TB the narrow post-agg projection is free.
  private def q02(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val agg = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(
        countDistinct("o_orderkey").as("n_orders"),
        countDistinct("o_custkey").as("n_customers"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - decPct(col("l_discount")))), 2)
          .cast("double").as("revenue"),
        sum("l_quantity").as("total_qty"),
        avgMoney(col("l_extendedprice"), count(lit(1))).as("avg_price"),
        countDistinct(when(col("o_orderstatus") === "F", col("o_orderkey")))
          .as("n_fulfilled"))
    agg.select(
      col("order_date"),
      year(col("order_date")).as("year"),
      quarter(col("order_date")).as("quarter"),
      month(col("order_date")).as("month"),
      weekofyear(col("order_date")).as("week"),
      F.dow0(col("order_date")).as("dow"),
      F.dayName(col("order_date")).as("day_name"),
      F.monthName(col("order_date")).as("month_name"),
      F.isWeekend(col("order_date")).as("is_weekend"),
      col("n_orders"), col("n_customers"), col("revenue"), col("total_qty"),
      col("avg_price"), col("n_fulfilled"),
      round(lit(100.0) * col("n_fulfilled") / col("n_orders"), 2).as("fulfilled_pct"))
  }

  private val q02Sql =
    s"""WITH agg AS (
      |  SELECT CAST(o.o_orderdate AS DATE) AS order_date,
      |    COUNT(DISTINCT o.o_orderkey) AS n_orders,
      |    COUNT(DISTINCT o.o_custkey) AS n_customers,
      |    CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
      |    SUM(l.l_quantity) AS total_qty,
      |    ${avgMoneySql("l.l_extendedprice", "COUNT(*)")} AS avg_price,
      |    COUNT(DISTINCT CASE WHEN o.o_orderstatus = 'F' THEN o.o_orderkey END) AS n_fulfilled
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1)
      |SELECT order_date,
      |  CAST(year(order_date) AS INT) AS year,
      |  CAST(quarter(order_date) AS INT) AS quarter,
      |  CAST(month(order_date) AS INT) AS month,
      |  CAST(weekofyear(order_date) AS INT) AS week,
      |  CAST(dayofweek(order_date) AS INT) AS dow,
      |  dayname(order_date) AS day_name,
      |  monthname(order_date) AS month_name,
      |  dayofweek(order_date) IN (0, 6) AS is_weekend,
      |  n_orders, n_customers, revenue, total_qty, avg_price, n_fulfilled,
      |  ROUND(CAST(100.0 AS DOUBLE) * n_fulfilled / n_orders, 2) AS fulfilled_pct
      |FROM agg""".stripMargin

  // ── q03: top performing content — gold MV #2: star join + global rank +
  // LIMIT w/ tie-break (J5/W1/O3). TakeOrderedAndProject keeps the global
  // sort bounded at any scale. ──
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // top-k FIRST (TakeOrderedAndProject — bounded at any scale), then the
    // global row_number window runs over just k rows, not the whole fact.
    o.join(c, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .select(
        col("o_orderkey"), col("c_name"), col("n_name").as("nation"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("order_date"),
        F.preview(col("o_orderpriority"), 200).as("priority_preview"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
  }

  private val q03Sql =
    """SELECT * FROM (
      |  SELECT o.o_orderkey, c.c_name, n.n_name AS nation, o.o_totalprice,
      |    CAST(o.o_orderdate AS DATE) AS order_date,
      |    o.o_orderpriority AS priority_preview,
      |    CAST(ROW_NUMBER() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rank
      |  FROM orders o
      |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey)
      |WHERE rank <= 100""".stripMargin

  // ── q04: account influence — gold MV #3: dim⟕fact agg + CASE tiering +
  // guarded ratio (A6/F9/F10) ──
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val totalSpend = coalesce(round(sum(dec2(col("o_totalprice"))), 2).cast("double"), lit(0.0))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation"), col("r_name").as("region"),
        F.influenceTier(col("c_acctbal")).as("tier"), col("c_acctbal"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        totalSpend.as("total_spend"),
        when(count(col("o_orderkey")) > 0,
          avgMoney(col("o_totalprice"), count(col("o_orderkey"))))
          .otherwise(lit(0.0)).as("avg_spend"),
        round(coalesce(max(col("o_totalprice")), lit(0.0)), 2).as("max_spend"),
        min(to_date(col("o_orderdate"))).as("first_order"),
        max(to_date(col("o_orderdate"))).as("last_order"),
        count(when(col("o_orderstatus") === "F", lit(1))).as("n_fulfilled"),
        when(col("c_acctbal") > 0, round(totalSpend / col("c_acctbal"), 4))
          .otherwise(lit(0.0)).as("spend_balance_ratio"))
      .drop("c_acctbal")
  }

  private val q04Sql =
    s"""SELECT c.c_custkey, c.c_name, c.c_mktsegment,
      |  n.n_name AS nation, r.r_name AS region,
      |  CASE WHEN c.c_acctbal >= 9000 THEN 'Mega'
      |       WHEN c.c_acctbal >= 5000 THEN 'Macro'
      |       WHEN c.c_acctbal >= 1000 THEN 'Mid'
      |       ELSE 'Micro' END AS tier,
      |  COUNT(o.o_orderkey) AS n_orders,
      |  COALESCE(CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE), 0) AS total_spend,
      |  CASE WHEN COUNT(o.o_orderkey) > 0
      |       THEN ${avgMoneySql("o.o_totalprice", "COUNT(o.o_orderkey)")}
      |       ELSE 0.0 END AS avg_spend,
      |  ROUND(COALESCE(MAX(o.o_totalprice), 0), 2) AS max_spend,
      |  MIN(CAST(o.o_orderdate AS DATE)) AS first_order,
      |  MAX(CAST(o.o_orderdate AS DATE)) AS last_order,
      |  COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
      |  CASE WHEN c.c_acctbal > 0
      |       THEN ROUND(COALESCE(CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE), 0) / c.c_acctbal, 4)
      |       ELSE 0.0 END AS spend_balance_ratio
      |FROM customer c
      |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY c.c_custkey, c.c_name, c.c_mktsegment, n.n_name, r.r_name, c.c_acctbal""".stripMargin

  // ── q05: token performance — gold MV #4: explode + HAVING + top-k
  // (F13/A9/O3) over documents ──
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), col("lang"), col("n_chars"),
        explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("uses"),
        countDistinct("lang").as("n_langs"),
        avgIntExact(sum("n_chars"), count(lit(1))).as("avg_doc_len"))
      .filter(col("uses") >= 2)
      .orderBy(col("uses").desc, col("token"))
      .limit(200)
  }

  private val q05Sql =
    s"""SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS uses,
      |  COUNT(DISTINCT lang) AS n_langs, ${avgIntExactSql("n_chars", "COUNT(*)")} AS avg_doc_len
      |FROM (SELECT doc_id, lang, n_chars, unnest(string_split(lower(text), ' ')) AS token
      |      FROM documents)
      |WHERE token <> ''
      |GROUP BY token HAVING COUNT(*) >= 2
      |ORDER BY uses DESC, token LIMIT 200""".stripMargin

  // ── q06: deterministic per-group mode — gold MV #1's MODE() WITHIN GROUP
  // (A8), pinned tie-break (count desc, then value) per SURVEY §7.4 ──
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderstatus").orderBy(col("cnt").desc, col("o_orderpriority"))
    counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("top_priority"), col("cnt"))
  }

  private val q06Sql =
    """SELECT o_orderstatus, o_orderpriority AS top_priority, cnt FROM (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
      |WHERE rn = 1""".stripMargin

  // ── q07: hourly posting patterns — gold MV #5: agg + window-over-aggregate
  // (W2) on events ──
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val agg = e.groupBy(
        hour(col("ts")).as("hour"),
        F.dayName(col("ts")).as("day_name"),
        F.isWeekend(col("ts")).as("is_weekend"))
      .agg(
        count(lit(1)).as("n_events"),
        sumMoney(col("value")).as("sum_value"),
        avgMoney(col("value"), count(lit(1))).as("avg_value"))
    agg.withColumn("activity_rank",
      row_number().over(Window.orderBy(col("n_events").desc, col("hour"), col("day_name"))))
  }

  private val q07Sql =
    s"""SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, hour, day_name) AS INT)
      |         AS activity_rank FROM (
      |  SELECT CAST(hour(ts) AS INT) AS hour, dayname(ts) AS day_name,
      |    dayofweek(ts) IN (0, 6) AS is_weekend,
      |    COUNT(*) AS n_events,
      |    CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value,
      |    ${avgMoneySql("value", "COUNT(*)")} AS avg_value
      |  FROM events GROUP BY 1, 2, 3)""".stripMargin

  // ── q08: sentiment trends — gold MV #6: agg then LAG day-over-day % change
  // w/ NULLIF guard (W3) ──
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val daily = e.groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        avgMoney(col("value"), count(lit(1))).as("avg_value"))
    val w = Window.partitionBy("event_type").orderBy("event_date")
    daily.withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .withColumn("pct_change",
        round(lit(100.0) * (col("n_events") - col("prev_n")) / nullif(col("prev_n").cast("double"), lit(0.0)), 2))
  }

  private val q08Sql =
    s"""SELECT *, ROUND(CAST(100.0 AS DOUBLE) * (n_events - prev_n) /
      |               NULLIF(CAST(prev_n AS DOUBLE), 0), 2) AS pct_change FROM (
      |  SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n_events,
      |    ${avgMoneySql("value", "COUNT(*)")} AS avg_value,
      |    LAG(COUNT(*), 1) OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS prev_n
      |  FROM events GROUP BY 1, 2)""".stripMargin

  // ── q09: viral content indicators — gold MV #7: per-key agg + epoch math
  // vs pinned now + weighted score + threshold + top-k (F8/F14/P5/O3) ──
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    // 150k groups: decimal agg buffers >18 digits are variable-width and
    // slow in the hash map — sum exact integer 10^-4-dollar units as LONG
    // instead (fixed-width, codegen'd), then round half-up in integer space.
    // Identical value to round(sum(decimal product), 2).
    val cents = (dec2(col("l_extendedprice")) * 100).cast("long")
    val disc100 = (decPct(col("l_discount")) * 100).cast("long")
    val perOrder = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(
        sum(cents * (lit(100L) - disc100)).as("eng4"),
        sum("l_quantity").as("total_qty"),
        count(lit(1)).as("n_items"))
      .withColumn("total_engagement",
        floor((col("eng4") * 2 + 100) / 200) / 100.0)
      .drop("eng4")
    val hours = F.hoursSince(lit(PinnedNow).cast("timestamp"), col("o_orderdate"))
    perOrder
      .withColumn("hours_since", hours)
      .withColumn("engagement_per_hour", round(col("total_engagement") / nullif(col("hours_since"), lit(0.0)), 4))
      .withColumn("virality_score",
        round((col("total_engagement") * 0.4 + col("total_qty") * 0.4 + col("n_items") * 0.2)
          / nullif(col("hours_since"), lit(0.0)), 6))
      .filter(col("total_engagement") > 100000)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("total_engagement"), col("total_qty"), col("n_items"),
        col("engagement_per_hour"), col("virality_score"))
      .orderBy(col("virality_score").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q09Sql =
    s"""WITH per_order AS (
      |  SELECT o.o_orderkey, o.o_orderdate,
      |    FLOOR((SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT)
      |               * (100 - CAST(CAST(l.l_discount AS DECIMAL(4,2))*100 AS BIGINT))) * 2 + 100)
      |          / 200) / 100.0 AS total_engagement,
      |    SUM(l.l_quantity) AS total_qty, COUNT(*) AS n_items
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT *,
      |    (epoch(TIMESTAMP '$PinnedNow') - epoch(o_orderdate)) / CAST(3600.0 AS DOUBLE) AS hours_since
      |  FROM per_order)
      |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  total_engagement, total_qty, n_items,
  |  ROUND(total_engagement / NULLIF(hours_since, 0), 4) AS engagement_per_hour,
      |  ROUND((total_engagement * CAST(0.4 AS DOUBLE) + total_qty * CAST(0.4 AS DOUBLE)
      |         + n_items * CAST(0.2 AS DOUBLE))
      |        / NULLIF(hours_since, 0), 6) AS virality_score
      |FROM scored WHERE total_engagement > 100000
      |ORDER BY virality_score DESC, o_orderkey LIMIT 100""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_daily_summary", q02, Some(q02Sql)),
    QueryDef("q03_top_orders", q03, Some(q03Sql)),
    QueryDef("q04_account_influence", q04, Some(q04Sql)),
    QueryDef("q05_token_stats", q05, Some(q05Sql)),
    QueryDef("q06_mode_priority", q06, Some(q06Sql)),
    QueryDef("q07_hourly_patterns", q07, Some(q07Sql)),
    QueryDef("q08_event_trends", q08, Some(q08Sql)),
    QueryDef("q09_viral_orders", q09, Some(q09Sql)))
}
