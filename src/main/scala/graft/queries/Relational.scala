package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.engine.Functions.{dec2, decPct}
import OracleSql.sumMoneySql

/** Relational-classic breadth — the multi-table join, window-function
  * and grouping-set shapes a user migrating any Postgres-backed
  * analytics stack (the reference included) expects to keep running:
  *
  *   - q102: the TPC-H Q5 SHAPE — a six-table star join (region →
  *     nation → supplier ⋈ lineitem ⋈ orders ⋈ customer) with the
  *     local-supplier correlation (c_nationkey = s_nationkey) and a
  *     one-year window, grouped to per-nation revenue. All four dims
  *     broadcast; only fact⋈fact shuffles. Money math runs through the
  *     exact DECIMAL helpers so the oracle hash never flakes on
  *     partial-agg order.
  *   - q103: window-function breadth in one gated result — ntile,
  *     percent_rank, cume_dist, nth_value and first/last_value over an
  *     explicit ROWS frame, all on a unique total order (ties broken by
  *     key) so every function is deterministic on both engines.
  *   - q104: CUBE grouping sets with grouping flags — the full 2×2
  *     lattice over (status, year) in ONE pass (Spark expands grouping
  *     sets inside a single partial-aggregated shuffle; four separate
  *     GROUP BYs would scan the fact four times).
  *
  * Reference framing: the reference's gold layer runs exactly this
  * class of SQL inside Postgres (models/gold/02_create_materialized_
  * views.sql); these queries prove the migration path for its heavier
  * relational idioms, not just the seven shipped MVs.
  */
object Relational {

  // ── q102: TPC-H Q5 shape — local-supplier revenue by nation. ──
  private def q102(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supplier = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val customer = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey")) // local supplier
      .groupBy("n_name")
      .agg(round(sum(dec2(col("l_extendedprice")) *
          (lit(1) - decPct(col("l_discount")))), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q102Sql =
    """SELECT n.n_name,
      |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lineitems
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_nationkey = s.s_nationkey
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ── q103: window-function breadth on a unique total order. ──
  private def q103(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val framed = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        nth_value(col("o_orderkey"), 2).over(framed).as("second_seen"),
        first(col("o_orderkey")).over(framed).as("cheapest_so_far"),
        last(col("o_orderkey")).over(framed).as("current_key"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
  }

  private val q103Sql =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume,
      |  NTH_VALUE(o_orderkey, 2) OVER wf AS second_seen,
      |  FIRST_VALUE(o_orderkey) OVER wf AS cheapest_so_far,
      |  LAST_VALUE(o_orderkey) OVER wf AS current_key
      |FROM orders
      |WHERE o_orderkey % 20 = 0
      |WINDOW
      |  w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
      |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin

  // ── q104: CUBE over (status, year) with grouping flags — the full
  // lattice in one shuffle. ──
  private def q104(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice"))
    o.cube("o_orderstatus", "o_year")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec2(col("o_totalprice"))), 2).cast("double").as("total_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_year")).cast("long").as("g_year"))
      .orderBy(col("g_status"), col("g_year"), col("o_orderstatus"), col("o_year"))
  }

  private val q104Sql =
    s"""SELECT o_orderstatus,
      |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |  COUNT(*) AS n_orders,
      |  ${sumMoneySql("o_totalprice")} AS total_price,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)) AS BIGINT) AS g_year
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT))
      |ORDER BY g_status, g_year, o_orderstatus, o_year""".stripMargin

  // ── q105: RANGE-interval trailing window — the frame type ROWS can't
  // express over gappy time series: trailing 60-MINUTE event counts
  // computed only at minutes that have events (the point-query shape
  // next to q90's gap-free spine: the spine materializes every slot for
  // dense verdicts; the RANGE frame reads a value-bounded window off
  // the sparse series directly — no spine rows, gaps handled by the
  // frame bound, not by data). Runs at the aggregated (type, minute)
  // grain — the window never sees raw events (q90's scale rule). ──
  private def q105(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_timestamp(ts) div 60").as("minute_idx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("minute_idx")
      .rangeBetween(-59, 0)
    m.withColumn("trailing_60m", sum("n").over(w))
      .orderBy("event_type", "minute_idx")
  }

  private val q105Sql =
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 60) AS BIGINT) AS minute_idx,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, minute_idx, n,
      |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY minute_idx
      |    RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_60m
      |FROM m ORDER BY event_type, minute_idx""".stripMargin

  // ── q106: gap-filled resampling with forward fill — the time-series
  // normalization every sensor/metrics pipeline runs before modeling:
  // per (type, hour) take the LAST observed reading (unique total order
  // (ts, event_id) — never "max ts" alone, which ties nondeterministic-
  // ally), join onto the gap-free hour spine (q90's pattern), and
  // forward-fill gaps with last-known-value via last(ignoreNulls) over
  // a running frame. The filled value is COPIED, never recomputed, so
  // doubles hash identically on both engines. Scale: one (type, hour)
  // partial-agg shuffle; spine join and fill window run at the
  // aggregated grain (hours × types), never over raw events. ──
  private def q106(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"), col("value"))
    val lastPerHour = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type", "h")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("h"), col("value").as("obs_value"))
    val nObs = ev.groupBy("event_type", "h").agg(count(lit(1)).as("n_obs"))
    val spine = ev.groupBy("event_type").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val fill = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(lastPerHour, Seq("event_type", "h"), "left")
      .join(nObs, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("hour"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("obs_value"), ignoreNulls = true).over(fill).as("filled_value"),
        col("obs_value").isNull.as("is_gap"))
      .orderBy("event_type", "hour")
  }

  private val q106Sql =
    """WITH ev AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
      |    ts, event_id, value
      |  FROM events),
      |last_per_hour AS (
      |  SELECT event_type, h, value AS obs_value
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, h
      |          ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
      |  WHERE rn = 1),
      |n_obs AS (
      |  SELECT event_type, h, COUNT(*) AS n_obs FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY 1))
      |SELECT s.event_type, s.h AS hour,
      |  CAST(COALESCE(n.n_obs, 0) AS BIGINT) AS n_obs,
      |  LAST_VALUE(l.obs_value IGNORE NULLS) OVER (
      |    PARTITION BY s.event_type ORDER BY s.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |  l.obs_value IS NULL AS is_gap
      |FROM spine s
      |LEFT JOIN last_per_hour l ON s.event_type = l.event_type AND s.h = l.h
      |LEFT JOIN n_obs n ON s.event_type = n.event_type AND s.h = n.h
      |ORDER BY s.event_type, hour""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q102_regional_volume", q102, Some(q102Sql)),
    QueryDef("q103_window_suite", q103, Some(q103Sql)),
    QueryDef("q104_cube_stats", q104, Some(q104Sql)),
    QueryDef("q105_range_trailing", q105, Some(q105Sql)),
    QueryDef("q106_gap_fill", q106, Some(q106Sql)))
}
