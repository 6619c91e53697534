package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Functions => F, Tables}

/** Profiling / reporting operator surface: per-column null counts (A4),
  * scalar summary stats (A2/A5), threshold-label scoring (F16 shape), and
  * the calendar-dimension build (F7, silver dim_date).
  */
object Profile {

  // ── q30: data-quality null profile (A4) — apply the quality rules, then
  // count the nulls they introduce, one pass, single row. ──
  private def q30(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("v_shift", F.nullIfNegative(col("value") - 20.0))
      .withColumn("etype_cap", F.nullIfLongerThan(col("event_type"), 4))
    e.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v_shift").isNull, 1L).otherwise(0L)).as("null_v_shift"),
      sum(when(col("etype_cap").isNull, 1L).otherwise(0L)).as("null_etype_cap"),
      countDistinct("event_type").as("n_event_types"))
  }

  private val q30Sql =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN CASE WHEN value - 20.0 < 0 THEN NULL ELSE value - 20.0 END IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS null_v_shift,
      |  CAST(SUM(CASE WHEN CASE WHEN length(event_type) > 4 THEN NULL ELSE event_type END IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS null_etype_cap,
      |  COUNT(DISTINCT event_type) AS n_event_types
      |FROM events""".stripMargin

  // ── q31: pluggable score + threshold labels (F16 shape) + top-k per
  // label (O2). Portable deterministic score from integer arithmetic. ──
  private def score(nChars: org.apache.spark.sql.Column) =
    pmod(nChars * lit(2654435761L), lit(1000L)) / lit(1000.0)

  private def q31(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("score", score(col("n_chars")))
      .withColumn("label",
        F.sentimentLabel(col("score"), positiveIf = col("n_chars") % 2 === 0))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("label").orderBy(col("score").desc, col("doc_id"))
    d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("label"), col("rk").cast("int").as("rk"), col("doc_id"),
        col("score"), col("lang"))
      .orderBy("label", "rk")
  }

  private val q31Sql =
    """WITH scored AS (
      |  SELECT doc_id, lang, ((n_chars * 2654435761) % 1000) / 1000.0 AS score,
      |    CASE WHEN ((n_chars * 2654435761) % 1000) / 1000.0 < 0.75 THEN 'Neutral'
      |         WHEN n_chars % 2 = 0 THEN 'Positive' ELSE 'Negative' END AS label
      |  FROM documents)
      |SELECT label, CAST(rk AS INT) AS rk, doc_id, score, lang FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
      |            ORDER BY score DESC, doc_id) AS rk
      |  FROM scored)
      |WHERE rk <= 5 ORDER BY label, rk""".stripMargin

  // ── q32: scalar run-summary (A2/A5, the notifier stats): one row of
  // min/max/count/sum over the fact slice. ──
  private def q32(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.agg(
      count(lit(1)).as("n_orders"),
      countDistinct("o_custkey").as("n_customers"),
      F.sumMoney(col("o_totalprice")).as("total_price"),
      round(max(col("o_totalprice")), 2).as("max_price"),
      min(to_date(col("o_orderdate"))).as("first_date"),
      max(to_date(col("o_orderdate"))).as("last_date"))
  }

  private val q32Sql =
    s"""SELECT COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers,
      |  ${OracleSql.sumMoneySql("o_totalprice")} AS total_price,
      |  ROUND(MAX(o_totalprice), 2) AS max_price,
      |  MIN(CAST(o_orderdate AS DATE)) AS first_date,
      |  MAX(CAST(o_orderdate AS DATE)) AS last_date
      |FROM orders""".stripMargin

  // ── q33: calendar dimension build (F7 / silver dim_date) — full
  // date-part derivation with PG DOW semantics over observed dates. ──
  private def q33(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(to_date(col("o_orderdate")).as("full_date")).distinct()
      .select(
        F.dateKey(col("full_date")).as("date_key"),
        col("full_date"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        weekofyear(col("full_date")).as("week"),
        F.dow0(col("full_date")).as("day_of_week"),
        F.dayName(col("full_date")).as("day_name"),
        F.monthName(col("full_date")).as("month_name"),
        F.isWeekend(col("full_date")).as("is_weekend"))
      .orderBy("date_key")
  }

  private val q33Sql =
    """SELECT CAST(strftime(full_date, '%Y%m%d') AS INT) AS date_key, full_date,
      |  CAST(year(full_date) AS INT) AS year,
      |  CAST(quarter(full_date) AS INT) AS quarter,
      |  CAST(month(full_date) AS INT) AS month,
      |  CAST(weekofyear(full_date) AS INT) AS week,
      |  CAST(dayofweek(full_date) AS INT) AS day_of_week,
      |  dayname(full_date) AS day_name,
      |  monthname(full_date) AS month_name,
      |  dayofweek(full_date) IN (0, 6) AS is_weekend
      |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date FROM orders)
      |ORDER BY date_key""".stripMargin

  // ── q34: rollup (GROUPING SETS) — subtotal hierarchy year→quarter with
  // grouping_id distinguishing total rows; integer measures stay exact. ──
  private def q34(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"),
        col("o_orderkey"))
      .rollup("y", "q")
      .agg(count(lit(1)).as("n_orders"), grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("y"), col("q"))
  }

  private val q34Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  COUNT(*) AS n_orders,
      |  CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(quarter(o_orderdate)) AS INT) AS gid
      |FROM orders
      |GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
      |ORDER BY gid, y, q""".stripMargin

  // ── q35: window frame — running engagement total per customer in order
  // date order (ROWS UNBOUNDED PRECEDING), exact integer money units. ──
  private def q35(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).filter(col("o_custkey") < 100)
    val cents = (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), cents.as("cents"))
      .withColumn("running_cents", sum(col("cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        (col("running_cents") / 100.0).as("running_total"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  private val q35Sql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
      |    AS running_total
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // ── q36: multimodal feature stats — drives the binary-column
  // featurization (mapPartitions batched "decode") end-to-end; the oracle
  // reproduces payload size and digest because the synthetic payloads are
  // the ASCII text bytes. ──
  private def q36(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.engine.Multimodal.syntheticMedia(spark, dir)
    graft.engine.Multimodal.featurize(media)
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        countDistinct("content_digest").as("n_distinct_payloads"),
        max("n_bytes").as("max_bytes"))
      .orderBy("media_type")
  }

  private val q36Sql =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
      |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
      |  CAST(MAX(length(text)) AS INTEGER) AS max_bytes
      |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin

  // ── q152: perceptual NEAR-dup census — drives the banded
  // Hamming-≤3 media-fingerprint kernel (Multimodal.nearDupByHash: the
  // machinery behind imageNearDup/audioNearDup) end-to-end through the
  // oracle. The codec half (aHash/envelope words) can only be
  // spec-gated — DuckDB cannot decode pixels — so the gated input is a
  // deterministic 60-bit stand-in fingerprint both engines derive
  // identically: 15 md5 nibbles of the GROUP key (media_id div 4, the
  // q22 hex-to-int primitive), XOR-perturbed by media_id % 4 — members
  // of a group sit within Hamming ≤ 2 of each other (the planted
  // near-dup class), distinct groups sit ~30 bits apart. The oracle
  // replays the ENTIRE kernel — banding, bucket cap, in-bucket pairs,
  // exact bit_count filter, recursive-CTE closure — never the plant, so
  // a drift in any stage breaks the hash gate. Output is the per-keeper
  // cluster census (clusters only, q49's convention). ──
  private def q152(spark: SparkSession, dir: String): DataFrame = {
    val compose = (0 until 15).map(n =>
      s"(instr('0123456789abcdef', substring(__h, ${n + 1}, 1)) - 1)" +
        s" * ${1L << (4 * n)}L").mkString(" + ")
    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"))
      .withColumn("__h", md5(expr("CAST(media_id div 4 AS STRING)")))
      .withColumn("phash", expr(s"($compose) ^ (media_id % 4)"))
      .select("media_id", "phash")
    graft.engine.Multimodal.nearDupByHash(hashed, maxHamming = 3)
      .filter(col("n_members") >= 2)
      .groupBy(col("keeper"))
      .agg(count(lit(1)).as("cluster_size"), max("media_id").as("max_member"))
      .orderBy("keeper")
  }

  private val q152Sql = {
    val compose = (0 until 15).map(n =>
      s"(instr('0123456789abcdef', substr(__h, ${n + 1}, 1)) - 1)" +
        s" * ${1L << (4 * n)}").mkString(" + ")
    s"""WITH RECURSIVE h AS (
      |  SELECT media_id, xor($compose, media_id % 4) AS phash FROM (
      |    SELECT doc_id AS media_id,
      |      md5(CAST(doc_id // 4 AS VARCHAR)) AS __h
      |    FROM documents)),
      |banded AS (
      |  SELECT media_id, phash, band,
      |    (phash >> (16 * (band - 1))) & 65535 AS bk
      |  FROM h, (SELECT unnest([1, 2, 3, 4]) AS band) bands),
      |small AS (SELECT band, bk FROM banded GROUP BY 1, 2 HAVING COUNT(*) <= 64),
      |kept AS (
      |  SELECT b.media_id, b.phash, b.band, b.bk
      |  FROM banded b JOIN small s ON b.band = s.band AND b.bk = s.bk),
      |pairs AS (
      |  SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id
      |  FROM kept a JOIN kept b ON a.band = b.band AND a.bk = b.bk
      |    AND a.media_id < b.media_id
      |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
      |${TrainData.ccClosureSql("pairs", "a_id", "b_id")}
      |SELECT comp AS keeper, COUNT(*) AS cluster_size, MAX(node) AS max_member
      |FROM comps GROUP BY 1 ORDER BY keeper""".stripMargin
  }

  // ── q160: VIDEO perceptual near-dup census — the frame-grain
  // extension of q152: per-frame fingerprints reduce to a clip hash by
  // PER-BIT MAJORITY (Multimodal.clipMajorityHash — the reduction
  // videoNearDup applies to real aHashed AVI frames, where it absorbs
  // single-frame re-encode noise and passes persistent shifts through),
  // then the banded Hamming-≤3 kernel clusters clips. The codec half
  // (sampleFrames → per-frame aHash on real MJPEG AVIs) is spec-gated
  // in MultimodalSpec — DuckDB cannot decode pixels — so the gated
  // frame fingerprints are q152's md5-nibble stand-in at (clip, frame)
  // grain: groups of 4 synthetic-video clips share per-frame base
  // hashes; member m ≥ 1 flips one PERSISTENT bit (7m, all frames —
  // survives majority, lands the clip at Hamming 1 from the keeper)
  // and one single-frame NOISE bit (7m+3, frame m−1 only — majority
  // must absorb it; if it leaked, pairwise distances would exceed the
  // band guarantee and clusters would split, so the gate proves the
  // absorption). The oracle replays frame fan-out, bit majority,
  // banding, bucket cap, bit_count filter, and the recursive closure —
  // drift anywhere breaks the hash gate. ──
  private val VidFrames = 3

  private def q160(spark: SparkSession, dir: String): DataFrame = {
    val compose = (0 until 15).map(n =>
      s"(instr('0123456789abcdef', substring(__h, ${n + 1}, 1)) - 1)" +
        s" * ${1L << (4 * n)}L").mkString(" + ")
    val fh = Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2) // the synthetic VIDEO rows (q36's split)
      .select(col("doc_id").as("media_id"))
      .withColumn("f", explode(expr(s"sequence(0, ${VidFrames - 1})")))
      .withColumn("__h", md5(expr(
        "concat('q160:', CAST(media_id div 12 AS STRING), ':', CAST(f AS STRING))")))
      .withColumn("__m", expr("(media_id div 3) % 4"))
      .withColumn("fh", expr(
        s"($compose) ^ (CASE WHEN __m = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), CAST(7 * __m AS INT)) + " +
          "(CASE WHEN f = __m - 1 " +
          "THEN shiftleft(CAST(1 AS BIGINT), CAST(7 * __m + 3 AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END) END)"))
      .select("media_id", "fh")
    graft.engine.Multimodal.nearDupByHash(
        graft.engine.Multimodal.clipMajorityHash(fh), maxHamming = 3)
      .filter(col("n_members") >= 2)
      .groupBy("keeper")
      .agg(count(lit(1)).as("cluster_size"), max("media_id").as("max_member"))
      .orderBy("keeper")
  }

  private val q160Sql = {
    val compose = (0 until 15).map(n =>
      s"(instr('0123456789abcdef', substr(__h, ${n + 1}, 1)) - 1)" +
        s" * ${1L << (4 * n)}").mkString(" + ")
    val m = "((media_id // 3) % 4)"
    s"""WITH RECURSIVE fh AS (
      |  SELECT media_id,
      |    xor($compose,
      |      CASE WHEN $m = 0 THEN 0
      |           ELSE (CAST(1 AS BIGINT) << CAST(7 * $m AS INT)) +
      |                (CASE WHEN f = $m - 1
      |                 THEN (CAST(1 AS BIGINT) << CAST(7 * $m + 3 AS INT))
      |                 ELSE 0 END) END) AS fh
      |  FROM (
      |    SELECT doc_id AS media_id, f,
      |      md5('q160:' || CAST(doc_id // 12 AS VARCHAR) || ':'
      |          || CAST(f AS VARCHAR)) AS __h
      |    FROM documents, (SELECT unnest(range(0, $VidFrames)) AS f) fr
      |    WHERE doc_id % 3 = 2)),
      |fb AS (
      |  SELECT media_id, j,
      |    SUM((fh >> CAST(j AS INT)) & 1) AS n_set, COUNT(*) AS n_fr
      |  FROM fh, (SELECT unnest(range(0, 64)) AS j) bits
      |  GROUP BY 1, 2),
      |clip AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN n_set * 2 > n_fr
      |      THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT)
      |      AS phash
      |  FROM fb GROUP BY 1),
      |banded AS (
      |  SELECT media_id, phash, band,
      |    (phash >> (16 * (band - 1))) & 65535 AS bk
      |  FROM clip, (SELECT unnest([1, 2, 3, 4]) AS band) bands),
      |small AS (SELECT band, bk FROM banded GROUP BY 1, 2 HAVING COUNT(*) <= 64),
      |kept AS (
      |  SELECT b.media_id, b.phash, b.band, b.bk
      |  FROM banded b JOIN small s ON b.band = s.band AND b.bk = s.bk),
      |pairs AS (
      |  SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id
      |  FROM kept a JOIN kept b ON a.band = b.band AND a.bk = b.bk
      |    AND a.media_id < b.media_id
      |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
      |${TrainData.ccClosureSql("pairs", "a_id", "b_id")}
      |SELECT comp AS keeper, COUNT(*) AS cluster_size, MAX(node) AS max_member
      |FROM comps GROUP BY 1 ORDER BY keeper""".stripMargin
  }

  // ── q37: exact percentiles — Spark `percentile` and DuckDB
  // `quantile_cont` share linear interpolation; over integer-valued
  // quantities the results are bit-identical. ──
  private def q37(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_quantity, 0.99)").as("p99_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val q37Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_quantity, 0.99) AS p99_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ── q38: approximate distinct (HLL++) — the opt-in perf variant of
  // COUNT(DISTINCT) for 100 TB cardinalities. The sketch estimate itself
  // is engine-specific (Spark HLL++ vs DuckDB's HLL disagree by design),
  // so the GATED output carries the exact count plus a tolerance boolean
  // `|approx − exact| / exact < 0.05` that each engine computes from ITS
  // OWN estimate — deterministic iff both sketches hold their advertised
  // error, which is exactly the property worth gating. (The exact count
  // here exists to gate the estimate; production callers use the sketch
  // alone.) ──
  private def q38(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("exact_customers"),
        // rsd=0.01 so the 5% gate sits ~5σ out — the default 0.05 sketch
        // drifts past its own 1σ routinely (observed 5.4% on sf0.01).
        approx_count_distinct(col("o_custkey"), 0.01).as("__approx"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"), col("exact_customers"), col("n_orders"),
        (abs(col("__approx") - col("exact_customers")) / col("exact_customers")
          < 0.05).as("within_tol"))
      .orderBy("o_orderstatus")
  }

  private val q38Sql =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS exact_customers,
      |  COUNT(*) AS n_orders,
      |  abs(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
      |    / COUNT(DISTINCT o_custkey) < 0.05 AS within_tol
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ── q114: native approximate percentiles (`approx_percentile`, the
  // GK/QuantileSummaries sketch) — the 100 TB quantile path next to
  // q37's exact sort-based percentile and q79's hand-rolled mergeable
  // histogram. The sketch estimate is engine-specific (Spark GK vs
  // DuckDB t-digest), so the gate is q38's pattern: exact values plus
  // each engine's own within-5% tolerance boolean (1% holds from
  // sf0.01 up, but DuckDB's t-digest drifts to 1.7% of the median on
  // a 273-row sf0.001 group — 5% is q38's level, 3x the worst
  // observed drift). The EXACT side is
  // the DISCRETE percentile — the element at rank ceil(p·n), computed
  // with integer division ((p_num·n + p_den − 1) div p_den), so the
  // gated doubles are COPIED data values, never interpolated (a
  // continuous percentile's lower+(upper−lower)·f arithmetic is
  // formula-order-sensitive across engines on distinct doubles — the
  // q106 copy-don't-recompute rule). Scale: one o_orderpriority
  // shuffle serves rank window and aggregation; accuracy 10000 keeps
  // the sketch's rank error ~n/10⁴, orders inside the gate. ──
  private def q114(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
    o.groupBy("o_orderpriority")
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("o_totalprice")))
          .as("p50_exact"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("o_totalprice")))
          .as("p99_exact"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("__a50"),
        expr("approx_percentile(o_totalprice, 0.99, 10000)").as("__a99"))
      .select(col("o_orderpriority"), col("n"), col("p50_exact"), col("p99_exact"),
        (abs(col("__a50") - col("p50_exact")) <= col("p50_exact") * 0.05)
          .as("p50_within_tol"),
        (abs(col("__a99") - col("p99_exact")) <= col("p99_exact") * 0.05)
          .as("p99_within_tol"))
      .orderBy("o_orderpriority")
  }

  private val q114Sql =
    """WITH o AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders),
      |ex AS (
      |  SELECT o_orderpriority, MAX(n) AS n,
      |    MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50_exact,
      |    MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN o_totalprice END) AS p99_exact,
      |    approx_quantile(o_totalprice, 0.5) AS a50,
      |    approx_quantile(o_totalprice, 0.99) AS a99
      |  FROM o GROUP BY 1)
      |SELECT o_orderpriority, CAST(n AS BIGINT) AS n, p50_exact, p99_exact,
      |  abs(a50 - p50_exact) <= p50_exact * 0.05 AS p50_within_tol,
      |  abs(a99 - p99_exact) <= p99_exact * 0.05 AS p99_within_tol
      |FROM ex ORDER BY o_orderpriority""".stripMargin

  // ── q118: data-contract audit — the dbt-style test suite (unique /
  // not_null / accepted_values / relationships) the reference's
  // data_quality checks grow into, as ONE gated result: each contract
  // emits (tbl, test, n_violations), so the whole quality posture is a
  // single small table a scheduler can alert on (zero rows violated ⇔
  // all n_violations = 0 — the zeros stay visible, a dbt convention).
  // The lineitem composite-key test reports a REAL breach on the driver
  // data (the generator emits duplicate (l_orderkey, l_linenumber)
  // pairs), so the gated output proves the audit surfaces violations
  // rather than rubber-stamping zeros; ProfileSpec additionally proves
  // detection of planted violations for every other contract.
  // Scale: each test is one aggregate or one anti/semi-join on its
  // natural key — no test scans a table twice, and the union glues
  // 1-row aggregates, not data. ──
  private def q118(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    def row(tbl: String, test: String, viol: Column): DataFrame => DataFrame =
      df => df.agg(viol.cast("long").as("n_violations"))
        .select(lit(tbl).as("tbl"), lit(test).as("test"), col("n_violations"))
    // unique: n_rows − n_distinct_keys
    val uOrders = row("orders", "unique_o_orderkey",
      count(lit(1)) - countDistinct(col("o_orderkey")))(o)
    val uLineitem = row("lineitem", "unique_l_orderkey_l_linenumber",
      count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))(l)
    // not_null
    val nnCust = row("orders", "not_null_o_custkey",
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)))(o)
    // accepted_values
    val avStatus = row("orders", "accepted_values_o_orderstatus",
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L)))(o)
    // relationships (FK orphans): anti-join, then count
    val relOrders = row("orders", "relationships_o_custkey",
      count(lit(1)))(
      o.filter(col("o_custkey").isNotNull)
        .join(c.select("c_custkey"), col("o_custkey") === col("c_custkey"),
          "left_anti"))
    val relLineitem = row("lineitem", "relationships_l_orderkey",
      count(lit(1)))(
      l.join(o.select(col("o_orderkey").as("__ok")),
        col("l_orderkey") === col("__ok"), "left_anti"))
    Seq(uOrders, uLineitem, nnCust, avStatus, relOrders, relLineitem)
      .reduce(_ unionByName _)
      .orderBy("tbl", "test")
  }

  private val q118Sql =
    """SELECT tbl, test, n_violations FROM (
      |  SELECT 'orders' AS tbl, 'unique_o_orderkey' AS test,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', 'unique_l_orderkey_l_linenumber',
      |    COUNT(*) - (SELECT COUNT(*) FROM
      |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders', 'not_null_o_custkey',
      |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'accepted_values_o_orderstatus',
      |    CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END)
      |      AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'relationships_o_custkey', COUNT(*)
      |  FROM orders o
      |  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem', 'relationships_l_orderkey', COUNT(*)
      |  FROM lineitem li
      |  WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o2 WHERE o2.o_orderkey = li.l_orderkey))
      |ORDER BY tbl, test""".stripMargin

  // ── q71: mergeable distinct sketches (Apache DataSketches HLL) — the
  // shard-then-union shape q38's monolithic HLL++ can't express: at
  // 100 TB every shard (here: a hash bucket of event_id; in production a
  // file, partition or day) sketches its own users in one pass, the
  // per-shard sketches union per key (associative, a few KB each), and
  // the estimate reads off the merged state — re-sketching nothing when
  // a new shard lands. Like q38, the sketch estimate is engine-specific,
  // so the gated columns are the exact count plus each engine's own
  // within-5% tolerance boolean (lgConfigK=14 ≈ 0.8 % 1σ, so the gate
  // sits far outside honest sketch drift). ──
  private def q71(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // stage 1: one sketch per (event_type, shard) — the per-file pass
    val perShard = ev.withColumn("shard", pmod(col("event_id"), lit(8)))
      .groupBy("event_type", "shard")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
        count(lit(1)).as("n_ev"))
    // stage 2: union the shard sketches per key, estimate from the merge
    val merged = perShard.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("__approx"),
        sum("n_ev").as("n_events"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("__approx") - col("exact_users")) / col("exact_users") < 0.05)
          .as("within_tol"))
      .orderBy("event_type")
  }

  private val q71Sql =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  COUNT(*) AS n_events,
      |  abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
      |    / COUNT(DISTINCT user_id) < 0.05 AS within_tol
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // ── q42: pivot — status columns per order-year (wide reshape); exact
  // integer-cents sums surfaced as doubles. Oracle via conditional
  // aggregation, the relational equivalent. ──
  private def q42(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("cents", (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
    o.groupBy(year(col("o_orderdate")).as("y"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum("cents"))
      .select(col("y"),
        (coalesce(col("F"), lit(0L)) / 100.0).as("f_total"),
        (coalesce(col("O"), lit(0L)) / 100.0).as("o_total"),
        (coalesce(col("P"), lit(0L)) / 100.0).as("p_total"))
      .orderBy("y")
  }

  private val q42Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
      |    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT) END), 0) / 100.0 AS f_total,
      |  COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
      |    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT) END), 0) / 100.0 AS o_total,
      |  COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
      |    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT) END), 0) / 100.0 AS p_total
      |FROM orders GROUP BY 1 ORDER BY y""".stripMargin

  // ── q43: EXCEPT / INTERSECT — customers active in 1997 but not 1998,
  // and in both years (set semantics, dedup included). ──
  private def q43(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def activeIn(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("custkey"))
    val churned = activeIn(1997).except(activeIn(1998))
      .withColumn("cohort", lit("churned_98"))
    val retained = activeIn(1997).intersect(activeIn(1998))
      .withColumn("cohort", lit("retained_98"))
    churned.unionByName(retained)
      .groupBy("cohort").agg(count(lit(1)).as("n_customers"))
      .orderBy("cohort")
  }

  private val q43Sql =
    """WITH a97 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997),
      |a98 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998),
      |u AS (
      |  SELECT custkey, 'churned_98' AS cohort FROM (SELECT * FROM a97 EXCEPT SELECT * FROM a98)
      |  UNION ALL
      |  SELECT custkey, 'retained_98' AS cohort FROM (SELECT * FROM a97 INTERSECT SELECT * FROM a98))
      |SELECT cohort, COUNT(*) AS n_customers FROM u GROUP BY cohort ORDER BY cohort""".stripMargin

  // ── q46: CSV split→count (F12) — a CSV field is derived
  // deterministically from document tokens (doc_id % 4 leading tokens;
  // % 4 == 0 yields the empty string, exercising the NULL/empty→0 guard),
  // then the member-count distribution is aggregated. ──
  private def q46(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val csv = concat_ws(",",
      slice(split(col("text"), " "), lit(1), (col("doc_id") % 4).cast("int")))
    d.select(F.csvCount(csv).as("n_members"))
      .groupBy("n_members").agg(count(lit(1)).as("n_docs"))
      .orderBy("n_members")
  }

  private val q46Sql =
    """SELECT n_members, COUNT(*) AS n_docs FROM (
      |  SELECT CASE WHEN csv IS NULL OR trim(csv) = '' THEN 0
      |              ELSE CAST(len(string_split(csv, ',')) AS INTEGER) END AS n_members
      |  FROM (SELECT array_to_string(
      |          string_split(text, ' ')[1:CAST(doc_id % 4 AS INT)], ',') AS csv
      |        FROM documents))
      |GROUP BY n_members ORDER BY n_members""".stripMargin

  // ── q86: cohort retention matrix — the classic growth-analytics
  // reshape the gold layer stops short of: customers cohorted by first
  // order year, then each (cohort, year-offset) cell counts how many of
  // that cohort came back. Two aggregations plus one broadcast-sized
  // join back to cohort sizes; the per-cell retention is an exact
  // BIGINT/BIGINT double division (deterministic IEEE on both engines).
  // Scale: cohort assignment is one groupBy(cust) — the matrix itself
  // is |cohorts|×|offsets| (tiny) no matter the fact size. ──
  private def q86(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"), year(col("o_orderdate")).as("y"))
    val cohort = o.groupBy("cust").agg(min("y").as("cohort_y"))
    val sizes = cohort.groupBy("cohort_y").agg(count(lit(1)).as("n_cohort"))
    o.join(cohort, "cust")
      .groupBy(col("cohort_y"), (col("y") - col("cohort_y")).as("offset_y"))
      .agg(countDistinct("cust").as("n_active"))
      .join(sizes, "cohort_y")
      .select(col("cohort_y"), col("offset_y"), col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
      .orderBy("cohort_y", "offset_y")
  }

  private val q86Sql =
    """WITH o AS (
      |  SELECT o_custkey AS cust, CAST(year(o_orderdate) AS INT) AS y FROM orders),
      |cohort AS (SELECT cust, MIN(y) AS cohort_y FROM o GROUP BY 1),
      |sizes AS (
      |  SELECT cohort_y, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM cohort GROUP BY 1),
      |act AS (
      |  SELECT c.cohort_y, o.y - c.cohort_y AS offset_y,
      |    CAST(COUNT(DISTINCT o.cust) AS BIGINT) AS n_active
      |  FROM o JOIN cohort c ON o.cust = c.cust GROUP BY 1, 2)
      |SELECT a.cohort_y, a.offset_y, a.n_active, s.n_cohort,
      |  CAST(a.n_active AS DOUBLE) / s.n_cohort AS retention
      |FROM act a JOIN sizes s ON a.cohort_y = s.cohort_y
      |ORDER BY a.cohort_y, offset_y""".stripMargin

  // ── q87: ordered event funnel — signup → click → purchase, each step
  // within 72 h of the previous one and at-or-after it (inclusive >=
  // bounds in BOTH engines: min-ts per step, time-bounded join to the
  // prior step's per-user timestamp; a same-microsecond follow-up
  // event counts as converted).
  // The funnel table is 4 rows; step-over-step conversion is again an
  // exact integer-ratio double. Scale: three filtered scans, each
  // joined to a per-user 1-row step table that shrinks monotonically —
  // all equi-joins on user_id, no window over the raw events. ──
  private def q87(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val horizonUs = 72L * 3600 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(unix_micros(col("ts")) >= unix_micros(col("t1")) &&
        unix_micros(col("ts")) <= unix_micros(col("t1")) + horizonUs)
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(unix_micros(col("ts")) >= unix_micros(col("t2")) &&
        unix_micros(col("ts")) <= unix_micros(col("t2")) + horizonUs)
      .groupBy("user_id").agg(min("ts").as("t3"))
    val steps = ev.select(countDistinct("user_id").as("n_users"))
      .withColumn("step", lit("0_all"))
      .unionByName(s1.agg(count(lit(1)).as("n_users")).withColumn("step", lit("1_signup")))
      .unionByName(s2.agg(count(lit(1)).as("n_users")).withColumn("step", lit("2_click")))
      .unionByName(s3.agg(count(lit(1)).as("n_users")).withColumn("step", lit("3_purchase")))
    val w = Window.orderBy("step")
    steps.withColumn("pct_of_prev",
        when(lag(col("n_users"), 1).over(w).isNull, lit(1.0))
          .otherwise(col("n_users").cast("double") / lag(col("n_users"), 1).over(w)))
      .select(col("step"), col("n_users"), col("pct_of_prev"))
      .orderBy("step")
  }

  private val q87Sql =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= epoch_us(s1.t1)
      |    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 259200000000
      |  GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= epoch_us(s2.t2)
      |    AND epoch_us(e.ts) <= epoch_us(s2.t2) + 259200000000
      |  GROUP BY 1),
      |steps AS (
      |  SELECT '0_all' AS step, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ev
      |  UNION ALL SELECT '1_signup', CAST(COUNT(*) AS BIGINT) FROM s1
      |  UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3)
      |SELECT step, n_users,
      |  CASE WHEN LAG(n_users) OVER (ORDER BY step) IS NULL THEN CAST(1.0 AS DOUBLE)
      |       ELSE CAST(n_users AS DOUBLE) / LAG(n_users) OVER (ORDER BY step) END
      |    AS pct_of_prev
      |FROM steps ORDER BY step""".stripMargin

  // ── q90: event-rate spike detection — the monitoring query every event
  // pipeline runs over its ingest stream: per (event_type, hour) counts on
  // a GAP-FREE hour spine (missing hours are real zeros — a window over
  // observed rows only would silently shrink the baseline), then a
  // trailing 24-hour z-score flags hours where the count exceeds the
  // trailing mean by > 3σ. The verdict is computed entirely in integer
  // cross-multiplied form (the q55 pattern): with S = Σcnt, Q = Σcnt²
  // over the 24 trailing hours, z > 3 ⇔ 24·cnt − S > 0 AND
  // (24·cnt − S)² > 9·(24·Q − S²) — no float mean/stddev, so both
  // engines agree bit-for-bit (naive vs Welford variance would differ in
  // ulps). A dead-flat baseline (den2 = 0) spikes on any positive excess,
  // deliberately. Longs are exact here up to ~10⁹ events/hour (squares
  // approach 2⁶³ beyond that — at that volume move S/Q to DECIMAL).
  // Scale: one partial-aggregated count shuffle at (type, hour) grain —
  // the spine join and window run on the AGGREGATED relation (hours ×
  // types, KBs at any corpus size), never on raw events. ──
  private def q90(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
    val spine = ev.groupBy("event_type").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val filled = spine.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    filled
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s_win", sum("cnt").over(w))
      .withColumn("q_win", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("n_win") === 24)
      .withColumn("num", col("cnt") * col("n_win") - col("s_win"))
      .withColumn("den2", col("n_win") * col("q_win") - col("s_win") * col("s_win"))
      .filter(col("num") > 0 && col("num") * col("num") > lit(9L) * col("den2"))
      .select(col("event_type"), col("h").as("hour"), col("cnt"),
        col("s_win"), col("q_win"), col("num"), col("den2"))
      .orderBy("event_type", "hour")
  }

  private val q90Sql =
    """WITH ev AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
      |counts AS (
      |  SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2),
      |rng AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY 1),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM rng),
      |filled AS (
      |  SELECT s.event_type, s.h, COALESCE(c.cnt, 0) AS cnt
      |  FROM spine s LEFT JOIN counts c ON s.event_type = c.event_type AND s.h = c.h),
      |st AS (
      |  SELECT event_type, h, cnt,
      |    COUNT(*) OVER w AS n_win,
      |    CAST(SUM(cnt) OVER w AS BIGINT) AS s_win,
      |    CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS q_win
      |  FROM filled
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, h AS hour, cnt, s_win, q_win,
      |  cnt * n_win - s_win AS num,
      |  n_win * q_win - s_win * s_win AS den2
      |FROM st
      |WHERE n_win = 24 AND cnt * n_win - s_win > 0
      |  AND (cnt * n_win - s_win) * (cnt * n_win - s_win)
      |    > 9 * (n_win * q_win - s_win * s_win)
      |ORDER BY event_type, hour""".stripMargin

  // ── q91: per-column profile drift between batches — the data-quality
  // audit (deequ / Great-Expectations class) a pipeline runs before
  // admitting a new crawl batch: profile each column in the stored
  // corpus (doc_id % 10 != 0) and the incoming batch (% 10 == 0), then
  // flag drift. Categorical columns (lang, source) compare VALUE SHARES
  // — drift ⇔ |share_a − share_b| > 5 points, evaluated as
  // |a·TB − b·TA|·20 > TA·TB in integers; numeric n_chars compares the
  // MEAN (|mean_a/mean_b − 1| > 5%, as |sa·cb − sb·ca|·20 > sb·ca) and
  // min/max extremes (relative move > 5%). No float division anywhere
  // in a verdict, so both engines agree exactly (the q55/q90 pattern).
  // Output is stacked (metric, key, a, b, drift) — the long layout a
  // quality dashboard stores per batch. Scale: two filtered scans →
  // partial-agg groupBys at VALUE grain; the share windows run over the
  // ≤|distinct values| aggregate (the bounded single-partition-window
  // class). In production the stored-side profile is persisted state
  // and only the batch scan runs — same incremental contract as q83. ──
  private def q91(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val a = d.filter(col("doc_id") % 10 =!= 0)
    val b = d.filter(col("doc_id") % 10 === 0)
    def catDrift(c: String): DataFrame = {
      val pa = a.groupBy(col(c).as("key")).agg(count(lit(1)).as("a"))
      val pb = b.groupBy(col(c).as("key")).agg(count(lit(1)).as("b"))
      val w = Window.partitionBy(lit(1))
      pa.join(pb, Seq("key"), "full_outer")
        .select(lit(s"share:$c").as("metric"), col("key"),
          coalesce(col("a"), lit(0L)).as("a"), coalesce(col("b"), lit(0L)).as("b"))
        .withColumn("ta", sum("a").over(w)).withColumn("tb", sum("b").over(w))
        .withColumn("drift",
          abs(col("a") * col("tb") - col("b") * col("ta")) * 20 > col("ta") * col("tb"))
        .drop("ta", "tb")
    }
    def numDrift: DataFrame = {
      // both batch profiles in ONE conditional-aggregation pass — a 1-row
      // join of two scalar aggregates would constant-fold its literal key
      // and plan as a nested loop; this is one scan and no join at all
      val isA = col("doc_id") % 10 =!= 0
      val j = d.agg(
        count(when(isA, 1)).as("ca"), sum(when(isA, col("n_chars"))).as("sa"),
        min(when(isA, col("n_chars"))).as("mna"),
        max(when(isA, col("n_chars"))).as("mxa"),
        count(when(!isA, 1)).as("cb"), sum(when(!isA, col("n_chars"))).as("sb"),
        min(when(!isA, col("n_chars"))).as("mnb"),
        max(when(!isA, col("n_chars"))).as("mxb"))
      j.select(lit("nchars:mean").as("metric"), lit(null: String).as("key"),
          col("sa").as("a"), col("sb").as("b"),
          (abs(col("sa") * col("cb") - col("sb") * col("ca")) * 20 >
            col("sb") * col("ca")).as("drift"))
        .unionByName(j.select(lit("nchars:min").as("metric"),
          lit(null: String).as("key"), col("mna").as("a"), col("mnb").as("b"),
          (abs(col("mna") - col("mnb")) * 20 > col("mnb")).as("drift")))
        .unionByName(j.select(lit("nchars:max").as("metric"),
          lit(null: String).as("key"), col("mxa").as("a"), col("mxb").as("b"),
          (abs(col("mxa") - col("mxb")) * 20 > col("mxb")).as("drift")))
    }
    catDrift("lang").unionByName(catDrift("source")).unionByName(numDrift)
      .orderBy("metric", "key")
  }

  private val q91Sql =
    """WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
      |a AS (SELECT * FROM d WHERE doc_id % 10 != 0),
      |b AS (SELECT * FROM d WHERE doc_id % 10 = 0),
      |cat AS (
      |  SELECT metric, key, a, b,
      |    CAST(SUM(a) OVER (PARTITION BY metric) AS BIGINT) AS ta,
      |    CAST(SUM(b) OVER (PARTITION BY metric) AS BIGINT) AS tb
      |  FROM (
      |    SELECT 'share:lang' AS metric, COALESCE(pa.key, pb.key) AS key,
      |      COALESCE(pa.a, 0) AS a, COALESCE(pb.b, 0) AS b
      |    FROM (SELECT lang AS key, CAST(COUNT(*) AS BIGINT) AS a FROM a GROUP BY 1) pa
      |    FULL OUTER JOIN
      |      (SELECT lang AS key, CAST(COUNT(*) AS BIGINT) AS b FROM b GROUP BY 1) pb
      |      ON pa.key = pb.key
      |    UNION ALL
      |    SELECT 'share:source', COALESCE(pa.key, pb.key),
      |      COALESCE(pa.a, 0), COALESCE(pb.b, 0)
      |    FROM (SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS a FROM a GROUP BY 1) pa
      |    FULL OUTER JOIN
      |      (SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS b FROM b GROUP BY 1) pb
      |      ON pa.key = pb.key)),
      |sa AS (SELECT CAST(COUNT(*) AS BIGINT) AS ca, CAST(SUM(n_chars) AS BIGINT) AS sa,
      |    MIN(n_chars) AS mna, MAX(n_chars) AS mxa FROM a),
      |sb AS (SELECT CAST(COUNT(*) AS BIGINT) AS cb, CAST(SUM(n_chars) AS BIGINT) AS sb,
      |    MIN(n_chars) AS mnb, MAX(n_chars) AS mxb FROM b)
      |SELECT metric, key, a, b, ABS(a * tb - b * ta) * 20 > ta * tb AS drift
      |FROM cat
      |UNION ALL
      |SELECT 'nchars:mean', NULL, sa, sb, ABS(sa * cb - sb * ca) * 20 > sb * ca
      |FROM sa, sb
      |UNION ALL
      |SELECT 'nchars:min', NULL, mna, mnb, ABS(mna - mnb) * 20 > mnb FROM sa, sb
      |UNION ALL
      |SELECT 'nchars:max', NULL, mxa, mxb, ABS(mxa - mxb) * 20 > mxb FROM sa, sb
      |ORDER BY metric, key""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q86_retention_matrix", q86, Some(q86Sql)),
    QueryDef("q87_event_funnel", q87, Some(q87Sql)),
    QueryDef("q90_rate_spike", q90, Some(q90Sql)),
    QueryDef("q91_profile_drift", q91, Some(q91Sql)),
    QueryDef("q30_null_profile", q30, Some(q30Sql)),
    QueryDef("q31_score_labels", q31, Some(q31Sql)),
    QueryDef("q32_summary_stats", q32, Some(q32Sql)),
    QueryDef("q33_date_dim", q33, Some(q33Sql)),
    QueryDef("q34_rollup", q34, Some(q34Sql)),
    QueryDef("q35_running_total", q35, Some(q35Sql)),
    QueryDef("q36_multimodal_stats", q36, Some(q36Sql)),
    QueryDef("q37_percentiles", q37, Some(q37Sql)),
    QueryDef("q38_approx_distinct", q38, Some(q38Sql)),
    QueryDef("q114_approx_percentile", q114, Some(q114Sql)),
    QueryDef("q118_contract_audit", q118, Some(q118Sql)),
    QueryDef("q71_hll_shard_union", q71, Some(q71Sql)),
    QueryDef("q42_pivot", q42, Some(q42Sql)),
    QueryDef("q43_set_ops", q43, Some(q43Sql)),
    QueryDef("q46_csv_count", q46, Some(q46Sql)),
    QueryDef("q152_phash_neardup", q152, Some(q152Sql)),
    QueryDef("q160_video_neardup", q160, Some(q160Sql)))
}
