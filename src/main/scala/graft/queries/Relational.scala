package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ── q108: scalar correlated subquery, window-decorrelated — the
  // TPC-H Q17 SHAPE ("small-quantity-order revenue": lineitems whose
  // quantity sits below 20% of their part's average quantity, for one
  // brand). A naive engine re-runs the AVG subquery per outer row; the
  // declarative plan computes the per-part aggregate ONCE as a window
  // over the SAME hash partitioning the brand slice already has — one
  // shuffle on l_partkey, the fact scanned once, no self-join. The
  // brand dim slice broadcasts (1/25th of part). The 20% boundary is
  // integer cross-multiplied (qty·5·cnt < Σqty — quantities are
  // integral), so no float-average boundary can disagree across
  // engines/partition orders. ──
  private def q108(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#12").select("p_partkey")
    val lp = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy("l_partkey")
    lp.withColumn("sum_qty", sum("qty").over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(dec2(col("l_extendedprice"))), 2).cast("double")
          .as("small_revenue"))
      .orderBy("partkey")
  }

  private val q108Sql =
    """WITH lp AS (
      |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty, l.l_extendedprice
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#12'),
      |agg AS (
      |  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty, COUNT(*) AS cnt
      |  FROM lp GROUP BY 1)
      |SELECT lp.l_partkey AS partkey, COUNT(*) AS n_small,
      |  CAST(ROUND(SUM(CAST(lp.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
      |    AS small_revenue
      |FROM lp JOIN agg ON lp.l_partkey = agg.l_partkey
      |WHERE lp.qty * 5 * agg.cnt < agg.sum_qty
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ── q109: EXISTS + NOT EXISTS on the same fact — the TPC-H Q21 SHAPE
  // (suppliers who were the ONLY late shipper on a multi-supplier
  // finished order). The oracle states it with two correlated
  // subqueries; the engine decorrelates BOTH into one pass: aggregate
  // lineitem⋈orders to (order, supplier, any_late) grain, then a
  // window over l_orderkey counts suppliers and late suppliers —
  // EXISTS ⟺ n_supp > 1, NOT-EXISTS-other-late ⟺ n_late = 1 on a late
  // row. One shuffle on l_orderkey serves the groupBy AND the window
  // (same key); the fact is never self-joined. Lateness (> order date
  // + 60 days) is a timestamp comparison — exact on both engines. ──
  private def q109(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perSupp = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1).otherwise(0))
        .as("is_late"))
    val w = Window.partitionBy("l_orderkey")
    val waiters = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum("is_late").over(w))
      .filter(col("is_late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(broadcast(waiters), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_name"), col("s_suppkey").as("suppkey"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"), col("suppkey"))
      .limit(20)
  }

  private val q109Sql =
    """WITH l1 AS (
      |  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F')
      |SELECT s.s_name, s.s_suppkey AS suppkey, COUNT(*) AS numwait
      |FROM (
      |  SELECT DISTINCT a.l_orderkey, a.l_suppkey
      |  FROM l1 a
      |  WHERE a.l_shipdate > a.o_orderdate + INTERVAL 60 DAY
      |    AND EXISTS (SELECT 1 FROM l1 b
      |      WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM l1 c
      |      WHERE c.l_orderkey = a.l_orderkey AND c.l_suppkey <> a.l_suppkey
      |        AND c.l_shipdate > c.o_orderdate + INTERVAL 60 DAY)) w
      |JOIN supplier s ON w.l_suppkey = s.s_suppkey
      |GROUP BY 1, 2
      |ORDER BY numwait DESC, s_name, suppkey
      |LIMIT 20""".stripMargin

  // ── q110: left-join-preserving-zeros + double aggregation — the
  // TPC-H Q13 SHAPE (customer order-count distribution, excluding one
  // priority class). The exclusion predicate belongs to the JOIN
  // condition, not a WHERE (a WHERE would silently drop zero-order
  // customers — the classic Q13 trap); count(o_orderkey) over the left
  // join counts only matches, keeping the zero bucket. Scale: one
  // c_custkey shuffle for the fact-side join+agg; the second GROUP BY
  // runs on customer-count-sized data (≤ distinct order counts). ──
  private def q110(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q110Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |    AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ── q111: global-aggregate comparison + anti join — the TPC-H Q22
  // SHAPE (idle rich customers: above-average positive balance within
  // chosen segments, and no orders in the trailing year — an
  // unbounded NOT EXISTS is vacuous at this order density, so the
  // dormancy window keeps the gate non-trivial). The scalar subquery's
  // 1-row global aggregate joins via the non-foldable pmod(hash) key
  // (IvfFlat's trick) so the planner keeps a BroadcastHashJoin — a
  // literal key would constant-fold into the BNLJ every PlanSpec in
  // this repo build-fails on. The above-average boundary is integer
  // cross-multiplied over exact cents (cents·n_pos > Σcents), so no
  // float-average can disagree; NOT EXISTS(orders) is a left-anti
  // join on o_custkey. ──
  private def q111(spark: SparkSession, dir: String): DataFrame = {
    def one(c: Column): Column = pmod(hash(c), lit(1))
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val pos = cust.filter(col("cents") > 0)
      .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n_pos"))
      .withColumn("__one", one(col("sum_cents")))
    cust.withColumn("__one", one(col("c_custkey")))
      .join(broadcast(pos), Seq("__one"))
      .filter(col("cents") * col("n_pos") > col("sum_cents"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        (sum("cents").cast("long") / 100.0).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  private val q111Sql =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer
      |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')),
      |pos AS (
      |  SELECT CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_pos
      |  FROM cust WHERE cents > 0)
      |SELECT c.c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(c.cents) AS BIGINT) / 100.0 AS total_acctbal
      |FROM cust c, pos
      |WHERE c.cents * pos.n_pos > pos.sum_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ── q115: explicit GROUPING SETS — the non-lattice shape neither
  // ROLLUP (q34) nor CUBE (q104) can produce: a hierarchy slice
  // (status, year), its parent margin (status), and an UNRELATED
  // cross-dimension margin (priority) in ONE Expand+aggregate pass —
  // three separate GROUP BYs would scan the fact three times.
  // grouping() flags disambiguate real NULLs from margin NULLs, and
  // the ordering keys off the flags first so the output is stable. ──
  private def q115(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderpriority"), col("o_totalprice"))
    o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_year")),
          Seq(col("o_orderstatus")),
          Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec2(col("o_totalprice"))), 2).cast("double").as("total_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_year")).cast("long").as("g_year"),
        grouping(col("o_orderpriority")).cast("long").as("g_prio"))
      .orderBy(col("g_status"), col("g_year"), col("g_prio"),
        col("o_orderstatus"), col("o_year"), col("o_orderpriority"))
  }

  private val q115Sql =
    s"""SELECT o_orderstatus,
      |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |  o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  ${sumMoneySql("o_totalprice")} AS total_price,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)) AS BIGINT)
      |    AS g_year,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS (
      |  (o_orderstatus, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)),
      |  (o_orderstatus),
      |  (o_orderpriority))
      |ORDER BY g_status, g_year, g_prio, o_orderstatus, o_year, o_orderpriority""".stripMargin

  // ── q116: NULL-safe equality join (<=> / IS NOT DISTINCT FROM) — the
  // join semantics a plain `=` silently breaks: rows with NULL keys
  // drop out of an equi-join, so a dim carrying an explicit
  // NULL/'unknown' member never receives them. Spark's `eqNullSafe`
  // is a first-class equi-join key (plans as a hash join, asserted in
  // RelationalSpec — not a nested loop), so the NULL bucket costs
  // nothing extra. Keys are synthesized (user_id%10, residue 7
  // nulled — user ids span only 0-14 at the smallest fixture, so the
  // residue must exist there) because the test data has no natural
  // NULL keys; the
  // 'unknown' row in the output is the proof the NULL bucket
  // survived. Scale: dim is ≤10 rows → broadcast; the fact never
  // shuffles. ──
  private def q116(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        nullif(col("user_id") % 10, lit(7)).as("k"))
    val dim = ev.select(col("k").as("dk")).distinct()
      .select(col("dk"),
        when(col("dk").isNull, "unknown")
          .when(col("dk") % 2 === 0, "even").otherwise("odd").as("tier"))
    ev.join(broadcast(dim), col("k") <=> col("dk"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_key"))
      .orderBy("tier")
  }

  private val q116Sql =
    """WITH ev AS (
      |  SELECT event_id, user_id, nullif(user_id % 10, 7) AS k FROM events),
      |dim AS (
      |  SELECT k, CASE WHEN k IS NULL THEN 'unknown'
      |            WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END AS tier
      |  FROM (SELECT DISTINCT k FROM ev))
      |SELECT d.tier, COUNT(*) AS n_events,
      |  COUNT(DISTINCT e.user_id) AS n_users,
      |  CAST(SUM(CASE WHEN e.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key
      |FROM ev e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
      |GROUP BY 1 ORDER BY tier""".stripMargin

  // ── q126: max-over-aggregate view — the TPC-H Q15 SHAPE (top
  // supplier by quarterly revenue). The classic form creates a revenue
  // VIEW and selects its MAX via a scalar subquery; here the view is a
  // per-supplier aggregate and the 1-row MAX joins back via the
  // non-foldable key (q111's pattern) → BroadcastHashJoin, never BNLJ.
  // Revenue is exact integer ¹⁄₁₀₀₀₀-dollar units (cents × discount
  // points), so the max comparison can't flake on float partial-agg
  // order; ties (none in this data, possible in general) would ALL be
  // returned, exactly like the SQL original. ──
  private def q126(spark: SparkSession, dir: String): DataFrame = {
    def one(c: Column): Column = pmod(hash(c), lit(1))
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " * CAST(100 - round(l_discount * 100) AS BIGINT)")).as("rev_c4"),
        count(lit(1)).as("n_items"))
      .localCheckpoint(false) // supplier-count rows; read by the MAX and the probe
    val mx = rev.agg(max("rev_c4").as("max_c4"))
      .withColumn("__one", one(col("max_c4")))
    rev.withColumn("__one", one(col("l_suppkey")))
      .join(broadcast(mx), Seq("__one"))
      .filter(col("rev_c4") === col("max_c4"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_c4") / 10000.0).as("total_revenue"), col("n_items"))
      .orderBy("s_suppkey")
  }

  private val q126Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(100 - round(l_discount * 100) AS BIGINT)) AS rev_c4,
      |    CAST(COUNT(*) AS BIGINT) AS n_items
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name,
      |  CAST(rev_c4 AS BIGINT) / 10000.0 AS total_revenue, n_items
      |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
      |WHERE rev_c4 = (SELECT MAX(rev_c4) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ── q127: HAVING-gated semi-enrichment — the TPC-H Q18 SHAPE (large-
  // quantity orders): orders whose line quantities sum past a threshold,
  // enriched with the customer. The aggregate runs FIRST (per-orderkey,
  // partial-agg'd map-side) and its tiny survivor set drives the joins —
  // the fact is never joined before it shrinks. l_quantity holds whole
  // numbers, so the double SUM is order-independent and exact. ──
  private def q127(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 250.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  private val q127Sql =
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
      |  o.o_totalprice, b.total_qty
      |FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250) b
      |JOIN orders o ON o.o_orderkey = b.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  // ── q128: share-of-global-total — the TPC-H Q11 SHAPE (important
  // stock): per-part value vs a fraction of the global total. The
  // global 1-row total joins via the non-foldable key; the keep rule is
  // RELATIVE (value > 1.2× the mean part share, integer
  // cross-multiplied cents·n_parts·10 > total·12) so the semantics are
  // scale-free — the absolute threshold of the SQL original would pin
  // the result to one corpus size. ──
  private def q128(spark: SparkSession, dir: String): DataFrame = {
    def one(c: Column): Column = pmod(hash(c), lit(1))
    val pv = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"),
        count(lit(1)).as("n_items"))
      .localCheckpoint(false) // part-count rows; read by the total and the probe
    val tot = pv.agg(sum("cents").as("total_cents"), count(lit(1)).as("n_parts"))
      .withColumn("__one", one(col("total_cents")))
    pv.withColumn("__one", one(col("l_partkey")))
      .join(broadcast(tot), Seq("__one"))
      .filter(col("cents") * col("n_parts") * 10 > col("total_cents") * 12)
      .select(col("l_partkey"), (col("cents") / 100.0).as("part_value"),
        col("n_items"), expr("(cents * 10000) div total_cents").as("share_bp"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  private val q128Sql =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_items
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
      |        COUNT(*) AS n_parts FROM pv)
      |SELECT l_partkey, cents / 100.0 AS part_value, n_items,
      |  (cents * 10000) // total_cents AS share_bp
      |FROM pv, tot
      |WHERE cents * n_parts * 10 > total_cents * 12
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q102_regional_volume", q102, Some(q102Sql)),
    QueryDef("q103_window_suite", q103, Some(q103Sql)),
    QueryDef("q104_cube_stats", q104, Some(q104Sql)),
    QueryDef("q105_range_trailing", q105, Some(q105Sql)),
    QueryDef("q106_gap_fill", q106, Some(q106Sql)),
    QueryDef("q108_small_qty_revenue", q108, Some(q108Sql)),
    QueryDef("q109_only_late_supplier", q109, Some(q109Sql)),
    QueryDef("q110_custdist", q110, Some(q110Sql)),
    QueryDef("q111_idle_rich", q111, Some(q111Sql)),
    QueryDef("q115_grouping_sets", q115, Some(q115Sql)),
    QueryDef("q116_nullsafe_join", q116, Some(q116Sql)),
    QueryDef("q126_top_supplier", q126, Some(q126Sql)),
    QueryDef("q127_big_orders", q127, Some(q127Sql)),
    QueryDef("q128_part_share", q128, Some(q128Sql)))
}
