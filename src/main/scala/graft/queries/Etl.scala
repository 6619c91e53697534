package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Functions => F, Silver, Tables}

/** ETL-layer operator surface (SURVEY.md §2.1/§2.3/§2.8): latest-per-key
  * dedup, SCD Type 2, the band/theta join, anti/semi joins, validation
  * probes, union+dedup, JSON shredding, and the HTML-clean transform chain —
  * each over the driver test tables with a DuckDB oracle.
  */
object Etl {

  /** Snapshot split for the SCD2 scenario — orders before this date form the
    * "current" dimension state; orders after it form the incoming batch. */
  private val Scd2Split = "1998-01-01"

  // ── q10: latest-version-per-key (A11 / DISTINCT ON): one newest event per
  // user. Single shuffle on user_id; at 100 TB this is the canonical
  // pre-dedup before any SCD2/upsert. ──
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    Silver.dedupLatest(e, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id", "event_type", "value")
  }

  private val q10Sql =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1""".stripMargin

  // ── q11: SCD Type 2 apply (J1/J7/U2). Current state = latest order per
  // customer before the split; batch = latest order after it. Changed
  // customers get their old row expired and a new current row; the
  // null-rejecting != change predicate is the reference's letter. ──
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val latestBefore = Silver.dedupLatest(
      o.filter(col("o_orderdate") < lit(Scd2Split).cast("timestamp")),
      Seq("o_custkey"), Seq(col("o_orderdate").desc, col("o_orderkey").desc))
    val current = latestBefore.select(
      col("o_custkey").as("custkey"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"),
      to_date(col("o_orderdate")).as("valid_from"),
      lit(null).cast("date").as("valid_to"),
      lit(true).as("is_current"))
    val batch = Silver.dedupLatest(
      o.filter(col("o_orderdate") >= lit(Scd2Split).cast("timestamp")),
      Seq("o_custkey"), Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey").as("custkey"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
    Silver.scd2Apply(current, batch, "custkey", Seq("status", "price"),
      to_date(lit(Scd2Split)))
  }

  private val q11Sql =
    s"""WITH cur AS (
      |  SELECT o_custkey AS custkey, o_orderstatus AS status,
      |         o_totalprice AS price, CAST(o_orderdate AS DATE) AS valid_from
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders WHERE o_orderdate < TIMESTAMP '$Scd2Split 00:00:00')
      |  WHERE rn = 1),
      |bat AS (
      |  SELECT o_custkey AS custkey, o_orderstatus AS status, o_totalprice AS price
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |        FROM orders WHERE o_orderdate >= TIMESTAMP '$Scd2Split 00:00:00')
      |  WHERE rn = 1),
      |changed AS (
      |  SELECT b.* FROM bat b LEFT JOIN cur c ON b.custkey = c.custkey
      |  WHERE c.custkey IS NULL OR c.status != b.status OR c.price != b.price)
      |SELECT c.custkey, c.status, c.price, c.valid_from,
      |       DATE '$Scd2Split' AS valid_to, FALSE AS is_current
      |FROM cur c WHERE EXISTS (SELECT 1 FROM changed g WHERE g.custkey = c.custkey)
      |UNION ALL
      |SELECT c.custkey, c.status, c.price, c.valid_from,
      |       CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
      |FROM cur c WHERE NOT EXISTS (SELECT 1 FROM changed g WHERE g.custkey = c.custkey)
      |UNION ALL
      |SELECT g.custkey, g.status, g.price, DATE '$Scd2Split' AS valid_from,
      |       CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
      |FROM changed g""".stripMargin

  // ── q12: band/theta join (J4) — equi on linestatus + range on discount
  // against a literal bucket dim; 5 rows → broadcast, range as post-filter,
  // exactly how Catalyst plans the reference's sentiment-score bucketing. ──
  private val buckets = Seq(
    ("O", "low", 0.00, 0.05), ("O", "high", 0.05, 1.01),
    ("F", "low", 0.00, 0.03), ("F", "mid", 0.03, 0.07), ("F", "high", 0.07, 1.01))

  private def q12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = buckets.toDF("status", "label", "lo", "hi")
    val l = Tables.lineitem(spark, dir)
    l.join(broadcast(dim),
        col("l_linestatus") === col("status") &&
          col("l_discount") >= col("lo") && col("l_discount") < col("hi"),
        "left")
      .groupBy(col("l_linestatus"), col("label"))
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
  }

  private val q12Sql = {
    val values = buckets
      .map { case (s, lb, lo, hi) => s"('$s', '$lb', $lo, $hi)" }
      .mkString(", ")
    s"""WITH dim(status, label, lo, hi) AS (VALUES $values)
      |SELECT l.l_linestatus, d.label, COUNT(*) AS cnt, SUM(l.l_quantity) AS sum_qty
      |FROM lineitem l LEFT JOIN dim d
      |  ON l.l_linestatus = d.status AND l.l_discount >= d.lo AND l.l_discount < d.hi
      |GROUP BY l.l_linestatus, d.label""".stripMargin
  }

  // ── q13: anti join (J6) — customers with no 1998 orders, by segment
  // (the reference's orphan-cleanup shape: keys present in the dim but
  // absent from the fact slice). ──
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(year(col("o_orderdate")) === 1998)
    c.join(o.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        F.sumMoney(col("c_acctbal")).as("total_balance"))
  }

  private val q13Sql =
    s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  ${OracleSql.sumMoneySql("c_acctbal")} AS total_balance
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND year(o.o_orderdate) = 1998)
      |GROUP BY c_mktsegment""".stripMargin

  // ── q14: semi join (J7) — customers with at least one 1998 order, by
  // nation. left_semi avoids materializing the join fan-out. ──
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1998)
    c.join(o.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_semi")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_active_customers"))
  }

  private val q14Sql =
    """SELECT n.n_name AS nation, COUNT(*) AS n_active_customers
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND year(o.o_orderdate) = 1998)
      |GROUP BY n.n_name""".stripMargin

  // ── q15: validation left-join + null probe (J8) — orders whose customer
  // is missing from a filtered "current" dim slice. ──
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") >= 5000)
    Silver.missingFkCount(o, "o_custkey", dim, "c_custkey")
  }

  private val q15Sql =
    """SELECT COUNT(*) AS n_fact,
      |  CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_fk
      |FROM orders o
      |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal >= 5000) d
      |  ON o.o_custkey = d.c_custkey
      |WHERE o.o_custkey IS NOT NULL""".stripMargin

  // ── q16: union of overlapping extracts + full-row dedup (U1/A12) —
  // cross-run incremental append then DISTINCT, the reference's re-crawl
  // overlap behavior. ──
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_id", "user_id", "event_type", "value")
    val a = e.filter(col("event_id") % 2 === 0 || col("event_id") % 3 === 0)
    val b = e.filter(col("event_id") % 3 === 0 || col("event_id") % 5 === 0)
    a.unionByName(b).distinct()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"),
        F.sumMoney(col("value")).as("sum_value"))
  }

  private val q16Sql =
    s"""WITH merged AS (
      |  SELECT event_id, user_id, event_type, value FROM events
      |  WHERE event_id % 2 = 0 OR event_id % 3 = 0
      |  UNION
      |  SELECT event_id, user_id, event_type, value FROM events
      |  WHERE event_id % 3 = 0 OR event_id % 5 = 0)
      |SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
      |  ${OracleSql.sumMoneySql("value")} AS sum_value
      |FROM merged GROUP BY event_type""".stripMargin

  // ── q17: JSON field shredding (S2/F5) — extract a typed scalar from the
  // props JSON blob, aggregate per type. get_json_object stays codegen'd. ──
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        F.avgIntExact(sum("k"), count(col("k"))).as("avg_k"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_k"),
        max("k").as("max_k"))
  }

  private val q17Sql =
    s"""SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  ${OracleSql.avgIntExactSql("k", "COUNT(k)")} AS avg_k,
      |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
      |  MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  // ── q18: HTML clean chain (F1/F2/F15) — tag strip, entity unescape
  // (codegen'd HtmlUnescape expression), whitespace collapse, empty→NULL,
  // truncate-with-ellipsis preview. Input HTML is derived deterministically
  // from documents.text so the oracle can replicate entity-by-entity. ──
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val html = concat(lit("<div class=\"post\"><p>"), col("text"),
      lit("</p> <br/> &amp; tail&#33;</div>"))
    d.select(col("doc_id"),
        F.preview(F.cleanHtml(html), 100).as("preview"),
        length(F.cleanHtml(html)).as("clean_len"))
      .orderBy(col("doc_id"))
  }

  private val q18Sql =
    """WITH cleaned AS (
      |  SELECT doc_id,
      |    NULLIF(TRIM(regexp_replace(
      |      replace(replace(
      |        regexp_replace(
      |          regexp_replace('<div class="post"><p>' || text || '</p> <br/> &amp; tail&#33;</div>',
      |                         '<br\s*/?>', ' ', 'g'),
      |          '<[^>]+>', '', 'g'),
      |        '&amp;', '&'), '&#33;', '!'),
      |      '\s+', ' ', 'g')), '') AS clean
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN length(clean) > 100 THEN substr(clean, 1, 100) || '...'
      |       ELSE clean END AS preview,
      |  CAST(length(clean) AS INTEGER) AS clean_len
      |FROM cleaned ORDER BY doc_id""".stripMargin

  // ── q39: as-of join — each event matched to the customer's most recent
  // order at event time (union-and-carry-forward operator; right side
  // pre-deduped per (key, time) for determinism). Oracle uses DuckDB's
  // native ASOF LEFT JOIN. ──
  private def q39(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val o = Silver.dedupLatest(Tables.orders(spark, dir),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    graft.operators.AsofJoin(e, o, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
      .orderBy("event_id")
  }

  private val q39Sql =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
      |        ORDER BY o_orderkey DESC) rn FROM orders) WHERE rn = 1),
      |l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |SELECT l.event_id, l.user_id, l.ts, r.o_orderkey, r.o_totalprice
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.o_orderdate
      |ORDER BY event_id""".stripMargin

  // ── q40: interval/range join — every 20th event opens a 2-hour
  // "campaign window"; count same-user events landing inside each window,
  // via the binned equi-join (never a cross product). ──
  private def q40(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = e.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("win_id"), col("user_id"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("win_end"))
    graft.operators.IntervalJoin(e, w, "user_id", "ts", "win_start", "win_end",
        binSeconds = 7200)
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        F.sumMoney(col("value")).as("total_value"))
      .orderBy("win_id")
  }

  private val q40Sql =
    s"""WITH w AS (
      |  SELECT event_id AS win_id, user_id, CAST(ts AS TIMESTAMP) AS win_start,
      |         CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS win_end
      |  FROM events WHERE event_id % 20 = 0),
      |l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
      |SELECT w.win_id, COUNT(*) AS n_events, MIN(l.event_id) AS first_event,
      |  ${OracleSql.sumMoneySql("l.value")} AS total_value
      |FROM l JOIN w ON l.user_id = w.user_id
      |  AND l.ts >= w.win_start AND l.ts < w.win_end
      |GROUP BY w.win_id ORDER BY w.win_id""".stripMargin

  // ── q41: batch sessionization — gap > 30 min starts a new session;
  // session id = running count of gap-starts per user (lag + cumulative
  // sum over one window partition), then per-session rollup. The batch
  // analog of streaming/Streams.sessionize. ──
  private def q41(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))
      .orderBy("user_id", "session_seq")
  }

  private val q41Sql =
    """WITH marked AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN LAG(CAST(ts AS TIMESTAMP), 1) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP))
      |              - epoch_us(LAG(CAST(ts AS TIMESTAMP), 1) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |            ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM marked)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  // ── q47: keep-FIRST dedup (A12) — the deterministic variant of the
  // bronze within-batch keep='first': earliest row per key under a total
  // order (ts, event_id), via the same dedupLatest window machinery with
  // an ascending sort. ──
  private def q47(spark: SparkSession, dir: String): DataFrame =
    Silver.dedupLatest(Tables.events(spark, dir), Seq("user_id"),
        Seq(col("ts").asc, col("event_id").asc))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")

  private val q47Sql =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ── q48: layer stats probe (S9) — row count, event-time high-water
  // mark, distinct partition count in ONE aggregation pass
  // (bronze_loader.py:190-224); the timestamp surfaces as epoch micros
  // for engine-portable comparison. ──
  private def q48(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Landing.layerStatsDf(Tables.events(spark, dir),
        hwmCol = "ts", runCol = "event_type")
      .select(col("n_rows"), unix_micros(col("high_water")).as("high_water_us"),
        col("n_runs"))

  private val q48Sql =
    """SELECT COUNT(*) AS n_rows,
      |  epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS high_water_us,
      |  COUNT(DISTINCT event_type) AS n_runs
      |FROM events""".stripMargin

  // ── q50: partition-level incremental MV refresh (E3 at scale) — an
  // events daily rollup is built from a prior load, then a re-crawl
  // delta arrives; only the touched days are recomputed and spliced in
  // (Gold.spliceRefresh). The oracle is the FULL aggregation, so any
  // splice bug — dropped days, duplicated days, stale touched rows —
  // hash-fails. ──
  private def q50(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
    def mv(df: DataFrame) = df.groupBy("day")
      .agg(count(lit(1)).as("n_events"), F.sumMoney(col("value")).as("sum_value"))
    val prior = e.filter(col("event_id") % 10 =!= 0) // first load
    val delta = e.filter(col("event_id") % 10 === 0) // re-crawl batch
    val touched = delta.select("day").distinct()
    graft.engine.Gold.spliceRefresh(
      mv(prior),
      mv(e.join(broadcast(touched), Seq("day"), "left_semi")),
      touched, Seq("day"))
      .orderBy("day")
  }

  private val q50Sql =
    s"""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS n_events,
      |  ${OracleSql.sumMoneySql("value")} AS sum_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // ── q117: FORWARD as-of join — next-event attribution (each click's
  // NEXT purchase by the same user, with the exact microsecond delay):
  // the mirror of q39's backward as-of, gated against DuckDB's native
  // `ASOF LEFT JOIN … ON l.ts <= r.ts`. Same scale shape as q39 —
  // union-and-carry, ONE shuffle on user_id, no join operator in the
  // plan at all; a range-condition join would cross-product per user.
  // The right side pre-dedups to one purchase per (user, ts) (highest
  // event_id), the determinism contract both engines' ASOF requires. ──
  private def q117(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = Silver.dedupLatest(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
    graft.operators.AsofJoin.forward(clicks, purchases, "user_id",
        "ts", "p_ts", Seq("p_id", "p_ts", "value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("p_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("ts"))).as("delay_us"),
        col("value"))
      .orderBy("event_id")
  }

  private val q117Sql =
    """WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, event_id AS p_id, value
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |        ORDER BY event_id DESC) rn FROM events
      |        WHERE event_type = 'purchase') WHERE rn = 1),
      |c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, c.ts, p.p_id,
      |  epoch_us(p.p_ts) - epoch_us(c.ts) AS delay_us, p.value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.p_ts
      |ORDER BY event_id""".stripMargin

  // ── q113: CDC MERGE apply — the lakehouse MERGE INTO analog the
  // reference's ON CONFLICT upsert (S6) grows into once deletes and
  // out-of-order change feeds exist: an op-typed change batch
  // (I/U/D + op_seq) applied to a base snapshot in one pass.
  // Semantics: latest op per key wins (op_seq order — late-arriving
  // CDC), D drops the row even when an earlier U touched it, U is a
  // PARTIAL update (null change fields keep the base value), I
  // inserts. The change batch is derived deterministically from the
  // base itself (residue classes), so both engines construct the
  // identical feed and the full post-merge state hash-gates. Scale:
  // the change-dedup window and the full-outer merge both key on
  // custkey — one exchange per side, co-partitioned; the on-disk
  // version of this apply is Pipeline.upsertBronze's swap-write
  // (spec-gated), this query gates the MERGE semantics themselves.
  // All acctbal math stays in exact cents territory (+100.0 on
  // cent-exact doubles), so no float drift. ──
  private def q113(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
    val updates = base.filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("k"), lit(1L).as("op_seq"),
        lit("U").as("op"), lit(null).cast("string").as("n_name"),
        lit(null).cast("string").as("n_seg"),
        (col("c_acctbal") + 100.0).as("n_acctbal"))
    val inserts = base.filter(col("c_custkey") % 31 === 1)
      .select((col("c_custkey") + 1000000L).as("k"), lit(1L).as("op_seq"),
        lit("I").as("op"),
        concat(lit("NEW-"), col("c_custkey").cast("string")).as("n_name"),
        col("c_mktsegment").as("n_seg"), lit(10.0).as("n_acctbal"))
    val deletes = base.filter(col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("k"), lit(2L).as("op_seq"),
        lit("D").as("op"), lit(null).cast("string").as("n_name"),
        lit(null).cast("string").as("n_seg"),
        lit(null).cast("double").as("n_acctbal"))
    val latest = Silver.dedupLatest(
      updates.unionByName(inserts).unionByName(deletes),
      Seq("k"), Seq(col("op_seq").desc))
    base.join(latest, col("c_custkey") === col("k"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        coalesce(col("c_custkey"), col("k")).as("custkey"),
        coalesce(col("n_name"), col("c_name")).as("name"),
        coalesce(col("n_seg"), col("c_mktsegment")).as("mktsegment"),
        coalesce(col("n_acctbal"), col("c_acctbal")).as("acctbal"),
        when(col("op").isNull, "kept").when(col("op") === "U", "updated")
          .otherwise("inserted").as("change"))
      .orderBy("custkey")
  }

  private val q113Sql =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer),
      |changes AS (
      |  SELECT c_custkey AS k, 1 AS op_seq, 'U' AS op,
      |    CAST(NULL AS VARCHAR) AS n_name, CAST(NULL AS VARCHAR) AS n_seg,
      |    c_acctbal + 100.0 AS n_acctbal
      |  FROM base WHERE c_custkey % 7 = 3
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 1, 'I', 'NEW-' || CAST(c_custkey AS VARCHAR),
      |    c_mktsegment, CAST(10.0 AS DOUBLE)
      |  FROM base WHERE c_custkey % 31 = 1
      |  UNION ALL
      |  SELECT c_custkey, 2, 'D', NULL, NULL, NULL
      |  FROM base WHERE c_custkey % 13 = 0),
      |latest AS (
      |  SELECT * FROM changes
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY op_seq DESC) = 1)
      |SELECT COALESCE(b.c_custkey, l.k) AS custkey,
      |  COALESCE(l.n_name, b.c_name) AS name,
      |  COALESCE(l.n_seg, b.c_mktsegment) AS mktsegment,
      |  COALESCE(l.n_acctbal, b.c_acctbal) AS acctbal,
      |  CASE WHEN l.op IS NULL THEN 'kept' WHEN l.op = 'U' THEN 'updated'
      |       ELSE 'inserted' END AS change
      |FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.k
      |WHERE COALESCE(l.op, '') <> 'D'
      |ORDER BY custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q10_dedup_latest", q10, Some(q10Sql)),
    QueryDef("q11_scd2_apply", q11, Some(q11Sql)),
    QueryDef("q12_band_join", q12, Some(q12Sql)),
    QueryDef("q13_anti_join", q13, Some(q13Sql)),
    QueryDef("q14_semi_join", q14, Some(q14Sql)),
    QueryDef("q15_fk_validation", q15, Some(q15Sql)),
    QueryDef("q16_union_dedup", q16, Some(q16Sql)),
    QueryDef("q17_json_extract", q17, Some(q17Sql)),
    QueryDef("q18_html_clean", q18, Some(q18Sql)),
    QueryDef("q39_asof_join", q39, Some(q39Sql)),
    QueryDef("q40_range_join", q40, Some(q40Sql)),
    QueryDef("q41_sessionize", q41, Some(q41Sql)),
    QueryDef("q47_keep_first", q47, Some(q47Sql)),
    QueryDef("q48_layer_stats", q48, Some(q48Sql)),
    QueryDef("q50_incremental_mv", q50, Some(q50Sql)),
    QueryDef("q113_cdc_merge", q113, Some(q113Sql)),
    QueryDef("q117_asof_forward", q117, Some(q117Sql)))
}
