package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.engine.Functions.dec2
import graft.operators.{AsofJoin, CountMin}

/** Warehouse-operations breadth — the maintenance/observability queries a
  * lakehouse team runs NEXT TO the analytics the reference ships: temporal
  * (point-in-time) reads over versioned dimensions, optimizer-statistics
  * join-size estimation, data-layout (Z-order) skipping audits, robust
  * outlier screens, attribution, and interval algebra.
  *
  *   - q119: POINT-IN-TIME snapshot over a versioned dimension — the read
  *     side of q11's SCD2 apply ("what did the customer dimension look
  *     like on date D"). Versions derive from the order stream with one
  *     LEAD window (valid_from = order date, valid_to = next version's
  *     start); the PIT filter is then ROW-LOCAL — a time-travel read costs
  *     one scan + one keyed window, never a join.
  *   - q120: JOIN-SIZE ESTIMATION from count-min sketches — what a
  *     cost-based optimizer (or AQE) does before picking a join strategy:
  *     |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), estimated by the CMS inner
  *     product min_j Σ_cell a_j[cell]·b_j[cell] (Cormode–Muthukrishnan's
  *     one-sided overestimate). Reuses q81's deterministic md5-row
  *     sketches, so both engines build bit-identical counter matrices:
  *     each side's sketch is one partial-aggregated groupBy (≤1024 rows
  *     regardless of table size), the "estimate" is a 1024-row join — at
  *     100 TB this prices a fact⋈fact join without touching either fact
  *     twice.
  *   - q121: TF-IDF keyword extraction — top-3 terms per document with a
  *     FIXED-POINT rarity weight (idf ∝ N/df via truncating integer
  *     division, score = tf · ((10⁶·N) div df)): transcendental-free, so
  *     the ranking is bit-identical across engines (the q61/q90 integer
  *     discipline applied to tf-idf). The literal rank≤3 bound plans as
  *     WindowGroupLimit — partial top-k before the doc_id shuffle.
  *   - q122: Z-ORDER LAYOUT skipping audit — the data-layout decision that
  *     dominates scan cost at 100 TB: interleave 8-bit quantized
  *     (l_partkey, l_suppkey) coordinates into a 16-bit Z-value, assign
  *     files by Z-range vs by leading-column range (both ROW-LOCAL given
  *     the 1-row maxima — this is exactly what repartitionByRange on the
  *     Z column does distributively, no global sort needed), then replay
  *     a rectangle probe against per-file min/max stats: files hit,
  *     rows scanned, true matches. The audit shows Z-order pruning both
  *     dimensions where the linear layout prunes only the leading one.
  *   - q123: ROBUST OUTLIER SCREEN (median/MAD) — |x − median| > 3·1.4826·
  *     MAD, the outlier test that (unlike mean/stddev z-scores) heavy
  *     tails can't poison. Both medians are DISCRETE rank-⌈n/2⌉ statistics
  *     (q114's rule) computed from per-(type, cents) HISTOGRAMS, so every
  *     window runs at aggregated grain — never over raw events (q90's
  *     grain discipline); the 1.4826 consistency constant is cross-
  *     multiplied as ×14826 vs ×10000, keeping the verdict integer-exact.
  *   - q124: LINEAR MULTI-TOUCH ATTRIBUTION — each click attributes to the
  *     user's NEXT purchase within 7 days (q117's forward as-of join);
  *     the purchase's value splits evenly across its touches in integer
  *     cents, remainder to the last touch, so credits conserve the spend
  *     exactly (Σ credits = cents, spec-pinned).
  *   - q125: INTERVAL MERGE (gaps-and-islands union) — overlapping
  *     30-minute activity intervals per user merged via the running-max-
  *     of-end island rule; covered time and island count are exact
  *     integer microsecond sums. The window is per-user — the partition
  *     key carries it at any scale.
  *   - q129–q131: LAKE-MAINTENANCE PLANNERS — small-file compaction
  *     (order-preserving next-fit packing at shard-census grain),
  *     equi-mass range boundaries off the mergeable histogram (the
  *     sampling-free repartitionByRange plan), and the join-skew audit
  *     with the `saltedAgg` fan-out that levels a hot key.
  *   - q132–q135: GRAPH + ML ANALYTICS — degree-oriented triangle
  *     counting (hub-safe O(√m) wedge bound), deterministic quantile-bin
  *     discretization, MAX_BY/ARG_MAX one-pass argmax with a tie-proof
  *     composite key, and group-median NULL imputation.
  *   - q136–q137: PIPELINE CLASSICS — telemetry debounce (islands with
  *     keep-first; streaming twin `Streams.debounce`) and trailing-24h
  *     rolling DISTINCT users via the ×24 user-hour fan-out that
  *     replaces an unsupported windowed COUNT(DISTINCT).
  *
  * Reference framing: the reference's Postgres warehouse would reach the
  * same needs as it grows — PIT reads over its SCD2 account dim
  * (src/loader/silver_etl.py's valid_from/valid_to columns), layout and
  * stats decisions its single Postgres node gets from indexes+ANALYZE,
  * and attribution/outlier screens over its engagement facts.
  */
object Warehouse {

  /** Non-foldable always-0 join key (IvfFlat's trick, q111's pattern):
    * joining 1-row aggregates through `pmod(hash(x), 1)` plans as a
    * BroadcastHashJoin — never BNLJ/cartesian. */
  private def one(c: Column): Column = pmod(hash(c), lit(1))

  // ── q119: point-in-time (time-travel) dimension snapshot. ──
  private val PitDate = "1998-06-01"

  private def q119(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val versions = o.select(
      col("o_custkey"), col("o_orderstatus").as("status"), col("o_totalprice"),
      col("o_orderdate").as("valid_from"),
      lead(col("o_orderdate"), 1).over(w).as("valid_to"))
    // PIT filter is row-local: zero-length versions (same-day successor)
    // can never satisfy valid_to > D, so exactly ≤1 row per key survives.
    val d = lit(PitDate).cast("timestamp")
    versions
      .filter(col("valid_from") <= d && (col("valid_to").isNull || col("valid_to") > d))
      .groupBy("status")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(dec2(col("o_totalprice"))), 2).cast("double").as("sum_price"),
        min("valid_from").as("oldest_version"),
        max("valid_from").as("newest_version"))
      .orderBy("status")
  }

  private val q119Sql =
    s"""WITH v AS (
      |  SELECT o_custkey, o_orderstatus AS status, o_totalprice,
      |    o_orderdate AS valid_from,
      |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS valid_to
      |  FROM orders)
      |SELECT status, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
      |    AS sum_price,
      |  MIN(valid_from) AS oldest_version, MAX(valid_from) AS newest_version
      |FROM v
      |WHERE valid_from <= TIMESTAMP '$PitDate 00:00:00'
      |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '$PitDate 00:00:00')
      |GROUP BY 1 ORDER BY status""".stripMargin

  // ── q120: CMS join-cardinality estimate vs exact. Bound caveat: like
  // q81, (est−exact)·64 ≤ nl·nr is 4× the EXPECTED inner-product error
  // (‖a‖₁‖b‖₁/w), not a worst case — it holds on the pinned corpora the
  // gate replays; widen the factor if the corpora ever change. ──
  private def q120(spark: SparkSession, dir: String): DataFrame = {
    val aw = Tables.orders(spark, dir).select(col("o_custkey").cast("string").as("w"))
    val bw = Tables.customer(spark, dir).select(col("c_custkey").cast("string").as("w"))
    val ca = CountMin.cells(aw).localCheckpoint(false) // ≤1024 rows; read twice
    val cb = CountMin.cells(bw)
      .withColumnRenamed("cnt", "cnt_b").localCheckpoint(false)
    val est = ca.join(cb, Seq("j", "cell"))
      .groupBy("j").agg(sum(col("cnt") * col("cnt_b")).as("ip"))
      .agg(min("ip").as("est_rows"))
    val exact = Tables.orders(spark, dir).groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("na"))
      .join(Tables.customer(spark, dir).groupBy(col("c_custkey").as("k"))
        .agg(count(lit(1)).as("nb")), Seq("k"))
      .agg(sum(col("na") * col("nb")).as("exact_rows"))
    val nl = ca.filter(col("j") === 0).agg(sum("cnt").as("n_left"))
    val nr = cb.filter(col("j") === 0).agg(sum("cnt_b").as("n_right"))
    exact.withColumn("__one", one(col("exact_rows")))
      .join(broadcast(est.withColumn("__one", one(col("est_rows")))), Seq("__one"))
      .join(broadcast(nl.withColumn("__one", one(col("n_left")))), Seq("__one"))
      .join(broadcast(nr.withColumn("__one", one(col("n_right")))), Seq("__one"))
      .select(col("exact_rows"), col("est_rows"), col("n_left"), col("n_right"),
        (col("est_rows") - col("exact_rows")).as("overcount"),
        (col("est_rows") >= col("exact_rows")).as("over_ok"),
        ((col("est_rows") - col("exact_rows")) * 64 <= col("n_left") * col("n_right"))
          .as("within_bound"))
  }

  private val q120Sql =
    """WITH aw AS (SELECT CAST(o_custkey AS VARCHAR) AS w FROM orders),
      |bw AS (SELECT CAST(c_custkey AS VARCHAR) AS w FROM customer),
      |ca AS (
      |  SELECT j,
      |    (instr('0123456789abcdef', substr(md5(w), 2*j + 1, 1)) - 1) * 16
      |      + (instr('0123456789abcdef', substr(md5(w), 2*j + 2, 1)) - 1) AS cell,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (SELECT w, unnest([0,1,2,3]) AS j FROM aw) GROUP BY 1, 2),
      |cb AS (
      |  SELECT j,
      |    (instr('0123456789abcdef', substr(md5(w), 2*j + 1, 1)) - 1) * 16
      |      + (instr('0123456789abcdef', substr(md5(w), 2*j + 2, 1)) - 1) AS cell,
      |    CAST(COUNT(*) AS BIGINT) AS cnt_b
      |  FROM (SELECT w, unnest([0,1,2,3]) AS j FROM bw) GROUP BY 1, 2),
      |est AS (
      |  SELECT CAST(MIN(ip) AS BIGINT) AS est_rows FROM (
      |    SELECT ca.j, SUM(ca.cnt * cb.cnt_b) AS ip
      |    FROM ca JOIN cb USING (j, cell) GROUP BY 1)),
      |ex AS (
      |  SELECT CAST(SUM(a.na * b.nb) AS BIGINT) AS exact_rows FROM
      |    (SELECT o_custkey AS k, COUNT(*) AS na FROM orders GROUP BY 1) a
      |    JOIN (SELECT c_custkey AS k, COUNT(*) AS nb FROM customer GROUP BY 1) b
      |      USING (k)),
      |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_left FROM orders),
      |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_right FROM customer)
      |SELECT exact_rows, est_rows, n_left, n_right,
      |  est_rows - exact_rows AS overcount,
      |  est_rows >= exact_rows AS over_ok,
      |  (est_rows - exact_rows) * 64 <= n_left * n_right AS within_bound
      |FROM ex, est, nl, nr""".stripMargin

  // ── q121: fixed-point tf-idf top-3 keywords per document. ──
  private def q121(spark: SparkSession, dir: String): DataFrame = {
    val tf = TrainData.docsParallel(spark, dir)
      .select(col("doc_id"), explode(TrainData.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val weights = df.withColumn("__one", one(col("df")))
      .join(broadcast(nd.withColumn("__one", one(col("n_docs")))), Seq("__one"))
      .select(col("w"), col("df"), expr("(1000000 * n_docs) div df").as("idf_fp"))
    val rankW = Window.partitionBy("doc_id").orderBy(col("score_fp").desc, col("w"))
    tf.join(weights, Seq("w"))
      .withColumn("score_fp", col("tf") * col("idf_fp"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= 3) // literal bound → WindowGroupLimit
      .select("doc_id", "rank", "w", "tf", "df", "score_fp")
      .orderBy("doc_id", "rank")
  }

  private val q121Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY 1, 2),
      |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
      |    tf.tf * ((1000000 * nd.n_docs) // dfq.df) AS score_fp
      |  FROM tf JOIN dfq USING (w), nd)
      |SELECT doc_id, rank, w, tf, df, score_fp FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score_fp DESC, w) AS rank FROM scored)
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ── q122: Z-order vs linear layout — file-skipping audit. ──
  /** Bit-interleave of two 8-bit coordinates via div/%/× only — the
    * integer primitives Spark SQL and DuckDB share exactly (`op` is
    * "div" or "//"). z bit 2i = px bit i, z bit 2i+1 = py bit i. */
  private def zInterleave(px: String, py: String, op: String): String =
    (0 until 8).map { i =>
      val p2 = 1L << i
      s"((($px $op $p2) % 2) * ${1L << (2 * i)}" +
        s" + (($py $op $p2) % 2) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  private def q122(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val mx = li.agg(max("l_partkey").as("kp"), max("l_suppkey").as("ks"))
      .withColumn("__one", one(col("kp")))
      .localCheckpoint(false) // 1 row; consumed by the coord pass and the audit
    val coords = li.withColumn("__one", one(col("l_partkey")))
      .join(broadcast(mx), Seq("__one"))
      .withColumn("px", expr("(l_partkey * 256) div (kp + 1)"))
      .withColumn("py", expr("(l_suppkey * 256) div (ks + 1)"))
      .withColumn("z", expr(zInterleave("px", "py", "div")))
      .withColumn("in_rect",
        col("l_partkey") >= expr("kp div 10") && col("l_partkey") <= expr("kp div 5") &&
          col("l_suppkey") >= expr("(3 * ks) div 10") &&
          col("l_suppkey") <= expr("(2 * ks) div 5"))
    // both file assignments are row-local range rules (what
    // repartitionByRange(z) / partitionBy(leading) do distributively)
    val filed = coords.select(col("l_partkey"), col("l_suppkey"), col("in_rect"),
        explode(array(
          struct(lit("zorder").as("layout"), expr("z div 2048").as("file_id")),
          struct(lit("linear").as("layout"), expr("px div 8").as("file_id")))).as("f"))
      .select(col("l_partkey"), col("l_suppkey"), col("in_rect"),
        col("f.layout").as("layout"), col("f.file_id").as("file_id"))
    val files = filed.groupBy("layout", "file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("f_minp"), max("l_partkey").as("f_maxp"),
        min("l_suppkey").as("f_mins"), max("l_suppkey").as("f_maxs"),
        sum(when(col("in_rect"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("__one", one(col("file_id")))
      .join(broadcast(mx), Seq("__one"))
      .withColumn("hit",
        col("f_minp") <= expr("kp div 5") && col("f_maxp") >= expr("kp div 10") &&
          col("f_mins") <= expr("(2 * ks) div 5") &&
          col("f_maxs") >= expr("(3 * ks) div 10"))
    files.groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_files_hit"),
        sum(when(col("hit"), col("n_rows")).otherwise(0L)).as("rows_scanned"),
        sum("n_match").as("n_match"))
      .orderBy("layout")
  }

  private val q122Sql =
    s"""WITH mx AS (SELECT MAX(l_partkey) AS kp, MAX(l_suppkey) AS ks FROM lineitem),
      |co AS (
      |  SELECT l_partkey, l_suppkey, kp, ks,
      |    (l_partkey * 256) // (kp + 1) AS px,
      |    (l_suppkey * 256) // (ks + 1) AS py,
      |    (l_partkey >= kp // 10 AND l_partkey <= kp // 5
      |      AND l_suppkey >= (3 * ks) // 10 AND l_suppkey <= (2 * ks) // 5)
      |      AS in_rect
      |  FROM lineitem, mx),
      |filed AS (
      |  SELECT l_partkey, l_suppkey, in_rect, u.layout,
      |    CASE WHEN u.layout = 'zorder'
      |      THEN (${zInterleave("px", "py", "//")}) // 2048
      |      ELSE px // 8 END AS file_id
      |  FROM co, (SELECT unnest(['linear', 'zorder']) AS layout) u),
      |files AS (
      |  SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    MIN(l_partkey) AS f_minp, MAX(l_partkey) AS f_maxp,
      |    MIN(l_suppkey) AS f_mins, MAX(l_suppkey) AS f_maxs,
      |    CAST(SUM(CASE WHEN in_rect THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      |  FROM filed GROUP BY 1, 2)
      |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
      |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_files_hit,
      |  CAST(SUM(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
      |  CAST(SUM(n_match) AS BIGINT) AS n_match
      |FROM (
      |  SELECT f.*,
      |    (f_minp <= kp // 5 AND f_maxp >= kp // 10
      |      AND f_mins <= (2 * ks) // 5 AND f_maxs >= (3 * ks) // 10) AS hit
      |  FROM files f, mx)
      |GROUP BY 1 ORDER BY layout""".stripMargin

  // ── q123: median/MAD robust outlier screen at histogram grain. ──
  private def q123(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
    // discrete lower median (rank ⌈n/2⌉ = (n+1) div 2) read off the
    // cumulative per-(type, cents) histogram — windows at aggregated grain
    def histMedian(h: DataFrame, vcol: String, out: String): DataFrame = {
      val cum = Window.partitionBy("event_type").orderBy(vcol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("event_type")
      h.withColumn("cum", sum("cnt").over(cum))
        .withColumn("n", sum("cnt").over(tot))
        .filter(col("cum") - col("cnt") < expr("(n + 1) div 2") &&
          col("cum") >= expr("(n + 1) div 2"))
        .select(col("event_type"), col(vcol).as(out), col("n"))
    }
    val h1 = e.groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
    val med = histMedian(h1, "cents", "med_cents")
    val dev = e.join(broadcast(med.drop("n")), Seq("event_type"))
      .select(col("event_type"), col("med_cents"),
        abs(col("cents") - col("med_cents")).as("adev"))
    val h2 = dev.groupBy("event_type", "med_cents", "adev").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // histogram grain (≤ type×distinct-cents rows); read twice
    val mad = histMedian(h2, "adev", "mad_cents")
    h2.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(min("n").as("n_events"), min("med_cents").as("med_cents"),
        min("mad_cents").as("mad_cents"),
        // |x − med| > 3 · 1.4826 · MAD, cross-multiplied ×10⁴ vs ×3·14826
        sum(when(col("adev") * 10000L > col("mad_cents") * (3L * 14826L), col("cnt"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  private val q123Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
      |h1 AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
      |       FROM e GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, cents AS med_cents, n FROM (
      |    SELECT event_type, cents, cnt,
      |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      SUM(cnt) OVER (PARTITION BY event_type) AS n
      |    FROM h1)
      |  WHERE cum - cnt < (n + 1) // 2 AND cum >= (n + 1) // 2),
      |h2 AS (
      |  SELECT e.event_type, m.med_cents, abs(e.cents - m.med_cents) AS adev,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM e JOIN med m USING (event_type) GROUP BY 1, 2, 3),
      |mad AS (
      |  SELECT event_type, adev AS mad_cents FROM (
      |    SELECT event_type, adev, cnt,
      |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY adev
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      SUM(cnt) OVER (PARTITION BY event_type) AS n
      |    FROM h2)
      |  WHERE cum - cnt < (n + 1) // 2 AND cum >= (n + 1) // 2)
      |SELECT h2.event_type, CAST(SUM(h2.cnt) AS BIGINT) AS n_events,
      |  MIN(h2.med_cents) AS med_cents, MIN(mad.mad_cents) AS mad_cents,
      |  CAST(SUM(CASE WHEN h2.adev * 10000 > mad.mad_cents * (3 * 14826)
      |    THEN h2.cnt ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM h2 JOIN mad USING (event_type)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  // ── q124: linear multi-touch attribution (click → next purchase ≤7d). ──
  private val AttrHorizonUs = 7L * 86400L * 1000000L

  private def q124(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = graft.engine.Silver.dedupLatest(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
    AsofJoin.forward(clicks, purchases, "user_id", "ts", "p_ts",
        Seq("p_id", "p_ts", "value"))
      .filter(col("p_id").isNotNull &&
        unix_micros(col("p_ts")) - unix_micros(col("ts")) <= AttrHorizonUs)
      .groupBy(col("p_id"), col("user_id"), col("p_ts"),
        floor(col("value") * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("n_touches"),
        min("ts").as("first_click"), max("ts").as("last_click"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("cents"),
        col("n_touches"), col("first_click"), col("last_click"),
        expr("cents div n_touches").as("credit_base"),
        // remainder to the last touch: credits sum back to cents exactly
        expr("cents - (n_touches - 1) * (cents div n_touches)").as("credit_last"))
      .orderBy("p_id")
  }

  private val q124Sql =
    s"""WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, event_id AS p_id, value
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |        ORDER BY event_id DESC) rn FROM events
      |        WHERE event_type = 'purchase') WHERE rn = 1),
      |c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |touched AS (
      |  SELECT c.user_id, c.ts, p.p_id, p.p_ts, p.value
      |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.p_ts
      |  WHERE p.p_id IS NOT NULL
      |    AND epoch_us(p.p_ts) - epoch_us(c.ts) <= $AttrHorizonUs)
      |SELECT p_id, user_id, p_ts, CAST(floor(value * 100) AS BIGINT) AS cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  MIN(ts) AS first_click, MAX(ts) AS last_click,
      |  CAST(floor(value * 100) AS BIGINT) // COUNT(*) AS credit_base,
      |  CAST(floor(value * 100) AS BIGINT)
      |    - (COUNT(*) - 1) * (CAST(floor(value * 100) AS BIGINT) // COUNT(*))
      |    AS credit_last
      |FROM touched GROUP BY 1, 2, 3, floor(value * 100)
      |ORDER BY p_id""".stripMargin

  // ── q125: merge overlapping per-user activity intervals. ──
  private val IntervalUs = 1800L * 1000000L // 30 min

  private def q125(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + IntervalUs)
    val ord = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("prev_max_e", max("e").over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      // touching intervals (s == prev end) merge; strict gap starts an island
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L).otherwise(0L))
      .withColumn("island", sum("new_island")
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("s").as("is_s"), max("e").as("is_e"), count(lit(1)).as("n_ev"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"), sum("n_ev").as("n_events"),
        sum(col("is_e") - col("is_s")).as("covered_us"),
        max(col("is_e") - col("is_s")).as("longest_us"))
      .orderBy("user_id")
  }

  private val q125Sql =
    s"""WITH iv AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
      |    epoch_us(CAST(ts AS TIMESTAMP)) + $IntervalUs AS e
      |  FROM events),
      |marked AS (
      |  SELECT user_id, s, e,
      |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
      |  FROM iv),
      |islands AS (
      |  SELECT user_id, island, MIN(s) AS is_s, MAX(e) AS is_e,
      |    CAST(COUNT(*) AS BIGINT) AS n_ev
      |  FROM (
      |    SELECT user_id, s, e,
      |      SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY user_id ORDER BY s, e
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |    FROM marked)
      |  GROUP BY 1, 2)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(SUM(is_e - is_s) AS BIGINT) AS covered_us,
      |  CAST(MAX(is_e - is_s) AS BIGINT) AS longest_us
      |FROM islands GROUP BY 1 ORDER BY user_id""".stripMargin

  // ── q129: small-file compaction planner — the maintenance op every
  // parquet lake runs: pack many small shards into target-size output
  // groups, PRESERVING shard order (so downstream range/pruning
  // assumptions survive the rewrite). Greedy next-fit by running byte
  // mass is a cumulative-sum window at SHARD grain (≤256 rows here —
  // q58's offset-packing math on the file-size domain); group id =
  // bytes-before div target is row-local off the cumsum, so engine and
  // oracle agree exactly. Scale: the raw table contributes one
  // partial-agg'd groupBy; everything after runs on the shard census. ──
  private val CompactTarget = 65536L // 64 KB target output size

  private def q129(spark: SparkSession, dir: String): DataFrame = {
    val shards = Tables.documents(spark, dir)
      .withColumn("shard", substring(md5(col("doc_id").cast("string")), 1, 2))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
    val cum = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shards
      .withColumn("cum_bytes", sum("bytes").over(cum))
      .withColumn("group_id", expr(s"(cum_bytes - bytes) div $CompactTarget"))
      .groupBy("group_id")
      .agg(count(lit(1)).as("n_shards"), sum("n_docs").as("n_docs"),
        sum("bytes").as("bytes"),
        min("shard").as("first_shard"), max("shard").as("last_shard"))
      .withColumn("reached_target", col("bytes") >= CompactTarget)
      .orderBy("group_id")
  }

  private val q129Sql =
    s"""WITH shards AS (
      |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS bytes
      |  FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT shard, n_docs, bytes,
      |    SUM(bytes) OVER (ORDER BY shard
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bytes
      |  FROM shards)
      |SELECT CAST((cum_bytes - bytes) // $CompactTarget AS BIGINT) AS group_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_shards,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(bytes) AS BIGINT) AS bytes,
      |  MIN(shard) AS first_shard, MAX(shard) AS last_shard,
      |  CAST(SUM(bytes) AS BIGINT) >= $CompactTarget AS reached_target
      |FROM cum GROUP BY 1 ORDER BY group_id""".stripMargin

  // ── q130: range-boundary planning from a mergeable histogram — what
  // repartitionByRange gets from reservoir SAMPLING, computed instead
  // from the q79-style equi-width histogram: boundaries at the k·n/8
  // cumulative ranks give equi-MASS ranges with a deterministic,
  // sampling-free answer (and the histogram merges across shards, so at
  // 100 TB the plan comes from combining per-file sketches, not
  // re-reading data). A bin is the k-th boundary iff the rank k·n/8
  // falls inside it: (cum−cnt)·8 < k·n ≤ cum·8 — integer
  // cross-multiplied, windows at histogram grain. ──
  private def q130(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.lineitem(spark, dir)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 10000").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    hist
      .withColumn("cum", sum("cnt").over(cum))
      .withColumn("n", sum("cnt").over(tot))
      .select(col("bin"), col("cum"), col("n"),
        explode(array((1 to 7).map(lit): _*)).as("k"))
      .filter((col("cum") - col("cnt")) * 8 < col("k") * col("n") &&
        col("cum") * 8 >= col("k") * col("n"))
      .select(col("k"), col("bin").as("boundary_bin"), col("cum").as("rows_below"),
        expr("(cum * 10000) div n").as("share_bp"))
      .orderBy("k")
  }

  private val q130Sql =
    """WITH hist AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT bin, cnt,
      |    SUM(cnt) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER () AS n
      |  FROM hist)
      |SELECT k, bin AS boundary_bin, CAST(cum AS BIGINT) AS rows_below,
      |  (CAST(cum AS BIGINT) * 10000) // CAST(n AS BIGINT) AS share_bp
      |FROM cum, (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k) ks
      |WHERE (cum - cnt) * 8 < k * n AND cum * 8 >= k * n
      |ORDER BY k""".stripMargin

  // ── q131: join-skew audit — the pre-flight check before a big
  // shuffle: per-key load vs the average partition's, with the salt
  // fan-out `Silver.saltedAgg` would need to level it. A key is hot
  // when it alone exceeds 4 average partitions' load (cnt·P > 4·n,
  // integer cross-multiplied, P = 32 — the session's shuffle
  // parallelism); suggested salt buckets = ⌈cnt·P / n⌉ spreads it back
  // to ~one partition's worth per bucket. A deterministic hot key is
  // INJECTED (q44's planted-dirt pattern: a quarter of rows fold to
  // key 0) so the audit's positive path is exercised — the drop-in
  // real-world input is any join/groupBy key column. Top-10 keys by
  // load; everything runs at key-census grain. ──
  private val SkewP = 32L

  private def q131(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(spark, dir)
      .select(when(col("l_orderkey") % 4 === 0, 0L)
        .otherwise(col("l_suppkey")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val tot = Window.partitionBy()
    keyed
      .withColumn("n", sum("cnt").over(tot))
      .select(col("key"), col("cnt"),
        expr("(cnt * 10000) div n").as("share_bp"),
        (col("cnt") * SkewP > col("n") * 4L).as("hot"),
        expr(s"(cnt * $SkewP + n - 1) div n").as("salt_buckets"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(10)
  }

  private val q131Sql =
    s"""WITH keyed AS (
      |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0 ELSE l_suppkey END AS key,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM keyed)
      |SELECT key, cnt, (cnt * 10000) // n AS share_bp,
      |  cnt * $SkewP > n * 4 AS hot,
      |  (cnt * $SkewP + n - 1) // n AS salt_buckets
      |FROM keyed, tot
      |ORDER BY cnt DESC, key LIMIT 10""".stripMargin

  // ── q132: triangle counting over the corpus link graph — the graph-
  // health metric next to q92's PageRank (clustering coefficient
  // separates organic link neighborhoods from spam farms). DEGREE-
  // ORIENTED wedge counting: every undirected edge points from its
  // lower (deg, id) endpoint to the higher, so each triangle is counted
  // exactly once (a→b, a→c, b→c under the total order) and — the scale
  // property — every wedge center's out-degree is O(√m), which bounds
  // the wedge join that explodes a hub-heavy graph counted naively.
  // Same deterministic edge synthesis as q92; wedge closure is a
  // left-semi against the oriented edge set (an equi-join, never
  // per-pair probing). ──
  private def q132(spark: SparkSession, dir: String): DataFrame = {
    val d = TrainData.docsParallel(spark, dir).select(col("doc_id"))
    val n = Tables.documents(spark, dir).count() // driver scalar (q92's pattern)
    val und = d.select(col("doc_id").as("src"),
        explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") * col("src") * 31 + col("j") * 97) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(false) // consumed by degrees, orientation and the counts
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("x"), col("v").as("y")))
          .otherwise(struct(col("v").as("x"), col("u").as("y"))).as("e"))
      .select(col("e.x").as("a"), col("e.y").as("b"))
      .localCheckpoint(false) // consumed by both wedge sides and the closure probe
    val wedges = oriented
      .join(oriented.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") =!= col("c"))
      .localCheckpoint(false)
    val tri = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")),
      Seq("b", "c"), "left_semi")
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val nWedges = wedges.agg((count(lit(1)) / 2).cast("long").as("n_wedges"))
    val nTri = tri.agg(count(lit(1)).as("n_triangles"))
    nNodes.withColumn("__one", one(col("n_nodes")))
      .join(broadcast(nEdges.withColumn("__one", one(col("n_edges")))), Seq("__one"))
      .join(broadcast(nWedges.withColumn("__one", one(col("n_wedges")))), Seq("__one"))
      .join(broadcast(nTri.withColumn("__one", one(col("n_triangles")))), Seq("__one"))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("(n_triangles * 1000000) div n_wedges").as("closure_ppm"))
  }

  private val q132Sql =
    """WITH raw AS (
      |  SELECT src, dst FROM (
      |    SELECT doc_id AS src,
      |      (doc_id * doc_id * 31 + j * 97) % (SELECT COUNT(*) FROM documents) AS dst
      |    FROM (SELECT doc_id, unnest([1, 2, 3]) AS j FROM documents))
      |  WHERE dst != src),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM raw),
      |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |  SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) GROUP BY 1),
      |ori AS (
      |  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
      |         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b
      |  FROM (SELECT und.u, und.v, d1.deg AS du, d2.deg AS dv FROM und
      |        JOIN deg d1 ON und.u = d1.node JOIN deg d2 ON und.v = d2.node)),
      |wed AS (SELECT o1.a, o1.b, o2.b AS c FROM ori o1
      |        JOIN ori o2 ON o1.a = o2.a AND o1.b != o2.b),
      |tri AS (SELECT w.a FROM wed w
      |        WHERE EXISTS (SELECT 1 FROM ori o WHERE o.a = w.b AND o.b = w.c))
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
      |  (SELECT CAST(COUNT(*) AS BIGINT) // 2 FROM wed) AS n_wedges,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles,
      |  ((SELECT COUNT(*) FROM tri) * 1000000)
      |    // ((SELECT COUNT(*) FROM wed) // 2) AS closure_ppm""".stripMargin

  // ── q133: quantile-bin discretization (the ML QuantileDiscretizer,
  // deterministically): quartile boundaries read off the n_chars
  // histogram at the k·n/4 ranks (q130's rule), pivoted into ONE row of
  // model state, then bin assignment is row-local (count of boundaries
  // strictly below the value). Ties land in the lower bin on the
  // boundary value itself — stated, not sampled, unlike the MLlib
  // discretizer whose approxQuantile boundaries move run to run. ──
  private def q133(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hist = docs.groupBy(col("n_chars").as("vv")).agg(count(lit(1)).as("cnt"))
    val cum = Window.orderBy("vv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val bnd = hist
      .withColumn("cum", sum("cnt").over(cum))
      .withColumn("n", sum("cnt").over(tot))
      .select(col("vv"), col("cum"), col("cnt"), col("n"),
        explode(array((1 to 3).map(lit): _*)).as("k"))
      .filter((col("cum") - col("cnt")) * 4 < col("k") * col("n") &&
        col("cum") * 4 >= col("k") * col("n"))
      .groupBy() // 3 boundary rows → 1 row of model state
      .agg(max(when(col("k") === 1, col("vv"))).as("b1"),
        max(when(col("k") === 2, col("vv"))).as("b2"),
        max(when(col("k") === 3, col("vv"))).as("b3"))
      .withColumn("__one", one(col("b1")))
    docs.withColumn("__one", one(col("doc_id")))
      .join(broadcast(bnd), Seq("__one"))
      .withColumn("bin",
        (col("n_chars") > col("b1")).cast("long") +
          (col("n_chars") > col("b2")).cast("long") +
          (col("n_chars") > col("b3")).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("bin")
  }

  private val q133Sql =
    """WITH hist AS (
      |  SELECT n_chars AS vv, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT vv, cnt,
      |    SUM(cnt) OVER (ORDER BY vv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER () AS n
      |  FROM hist),
      |bnd AS (
      |  SELECT MAX(CASE WHEN k = 1 THEN vv END) AS b1,
      |    MAX(CASE WHEN k = 2 THEN vv END) AS b2,
      |    MAX(CASE WHEN k = 3 THEN vv END) AS b3
      |  FROM cum, (SELECT unnest([1, 2, 3]) AS k) ks
      |  WHERE (cum - cnt) * 4 < k * n AND cum * 4 >= k * n)
      |SELECT CAST((n_chars > b1) AS BIGINT) + CAST((n_chars > b2) AS BIGINT)
      |    + CAST((n_chars > b3) AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents, bnd
      |GROUP BY 1 ORDER BY bin""".stripMargin

  // ── q134: argmax aggregates (MAX_BY / ARG_MAX) — top customer per
  // nation in ONE aggregation pass, no window, no self-join: the
  // per-group argmax is a partial-aggregable state (candidate, key),
  // so it map-side combines like any sum. Ties are impossible BY
  // CONSTRUCTION: the ordering key is the unique composite
  // cents·2²⁰ + custkey (custkey < 2²⁰ here — both engines would
  // otherwise break argmax ties arbitrarily and the gate would flake). ──
  private def q134(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .withColumn("score", col("cents") * (1L << 20) + col("c_custkey"))
    cust.join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        max_by(col("c_name"), col("score")).as("top_customer"),
        max_by(col("c_custkey"), col("score")).as("top_custkey"),
        (max("cents") / 100.0).as("max_acctbal"))
      .orderBy("n_name")
  }

  private val q134Sql =
    """SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  ARG_MAX(c.c_name, CAST(round(c.c_acctbal * 100) AS BIGINT) * 1048576
      |    + c.c_custkey) AS top_customer,
      |  ARG_MAX(c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) * 1048576
      |    + c.c_custkey) AS top_custkey,
      |  MAX(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS max_acctbal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  // ── q135: group-statistic imputation — the data-repair step after
  // q30's null profile finds holes: NULLs fill with their group's
  // DISCRETE median (rank-⌈n/2⌉ over the non-null histogram — q123's
  // machinery), so the repair is deterministic and engine-portable,
  // unlike mean imputation whose float average is reduction-order-
  // sensitive. Holes are INJECTED deterministically (event_id % 7 —
  // q44's planted-dirt pattern) since the driver data has none; the
  // imputed table's exact integer checksum is part of the gate. ──
  private def q135(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        when(col("event_id") % 7 === 0, lit(null).cast("long"))
          .otherwise(floor(col("value") * 100).cast("long")).as("cents"))
    val hist = e.filter(col("cents").isNotNull)
      .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("event_type")
    val med = hist
      .withColumn("cum", sum("cnt").over(cum))
      .withColumn("n", sum("cnt").over(tot))
      .filter(col("cum") - col("cnt") < expr("(n + 1) div 2") &&
        col("cum") >= expr("(n + 1) div 2"))
      .select(col("event_type"), col("cents").as("med_cents"))
    e.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("med_cents"),
        col("cents").isNull.as("was_null"),
        coalesce(col("cents"), col("med_cents")).as("filled"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("was_null"), 1L).otherwise(0L)).as("n_imputed"),
        min("med_cents").as("imputed_cents"),
        sum("filled").as("sum_cents_after"))
      .orderBy("event_type")
  }

  private val q135Sql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CASE WHEN event_id % 7 = 0 THEN NULL
      |      ELSE CAST(floor(value * 100) AS BIGINT) END AS cents
      |  FROM events),
      |hist AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
      |         FROM e WHERE cents IS NOT NULL GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, cents AS med_cents FROM (
      |    SELECT event_type, cents, cnt,
      |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      SUM(cnt) OVER (PARTITION BY event_type) AS n
      |    FROM hist)
      |  WHERE cum - cnt < (n + 1) // 2 AND cum >= (n + 1) // 2)
      |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN e.cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_imputed,
      |  MIN(m.med_cents) AS imputed_cents,
      |  CAST(SUM(COALESCE(e.cents, m.med_cents)) AS BIGINT) AS sum_cents_after
      |FROM e JOIN med m USING (event_type)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  // ── q136: telemetry debounce — collapse bursts of the same (user,
  // type) signal into one kept event: a new burst starts when the gap
  // from the previous event exceeds the debounce window, and the burst
  // KEEPS ITS FIRST event (q125's island rule with keep-first instead
  // of merge — the sequential "previous kept event" chain that looks
  // iterative is exactly gaps-and-islands). Windows run per (user,
  // type); the kept-id sum is an order-free integrity checksum. ──
  private val DebounceUs = 5L * 1000000L

  private def q136(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"))
    val ord = Window.partitionBy("user_id", "event_type")
      .orderBy(col("t"), col("event_id"))
    e.withColumn("prev_t", lag("t", 1).over(ord))
      .withColumn("first_of_burst",
        col("prev_t").isNull || col("t") - col("prev_t") > DebounceUs)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("first_of_burst"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("first_of_burst"), col("event_id")).otherwise(0L))
          .as("kept_id_sum"))
      .orderBy("event_type")
  }

  private val q136Sql =
    s"""WITH e AS (
      |  SELECT event_type, user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |marked AS (
      |  SELECT event_type, event_id,
      |    (LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > $DebounceUs)
      |      AS first_of_burst
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t, event_id))
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_raw,
      |  CAST(SUM(CASE WHEN first_of_burst THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN first_of_burst THEN event_id ELSE 0 END) AS BIGINT)
      |    AS kept_id_sum
      |FROM marked GROUP BY 1 ORDER BY event_type""".stripMargin

  // ── q137: trailing-24h rolling DISTINCT users per hour — windowed
  // COUNT(DISTINCT) doesn't exist as a frame aggregate (in Spark OR most
  // engines), and the naive per-hour self-join re-scans 24× per hour.
  // The scalable rewrite: fan each (user, active-hour) out to the 24
  // trailing report-hours it contributes to, then ONE distinct-count per
  // report hour. Fan-out runs at (user, hour) grain — already deduped
  // from raw events — so shuffle volume is 24×|user-hours|, independent
  // of raw event volume; report hours are pinned to hours that actually
  // have events so both engines enumerate identical rows. ──
  private def q137(spark: SparkSession, dir: String): DataFrame = {
    val uh = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct()
      .localCheckpoint(false) // (user, hour) grain; fan-out + report-hour spine
    val hours = uh.select(col("h").as("rh")).distinct()
    uh.select(col("user_id"), col("h"),
        explode(sequence(col("h"), col("h") + 23)).as("rh"))
      .join(hours, Seq("rh"), "left_semi") // only real report hours
      .groupBy("rh")
      .agg(countDistinct("user_id").as("n_users_24h"))
      .orderBy("rh")
  }

  private val q137Sql =
    """WITH uh AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
      |  FROM events),
      |hours AS (SELECT DISTINCT h AS rh FROM uh),
      |fan AS (
      |  SELECT u.user_id, u.h, u.h + d AS rh
      |  FROM uh u, (SELECT unnest(range(0, 24)) AS d) ds)
      |SELECT f.rh AS rh, CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users_24h
      |FROM fan f JOIN hours ho ON f.rh = ho.rh
      |GROUP BY 1 ORDER BY f.rh""".stripMargin

  // ── q138: two-hop reach — friend-of-friend audience size per node
  // over q92's link graph (the influence metric PageRank approximates
  // globally, measured exactly at radius 2). TWO selectable wedge
  // enumerations, both exact (the spec pins their equality):
  //   - naive: one adjacency self-join on the mid node — Σdeg² ORDERED
  //     pairs of fan-out (every wedge twice, plus deg self-pairs), with
  //     the whole mass keyed on the mid node, so one hub melts its
  //     shuffle partition;
  //   - degree-oriented (q132's orientation: each edge points from its
  //     lower (deg, id) endpoint): every wedge enumerated exactly ONCE
  //     as one of three equi-joins — out–out pairs at the center (out-
  //     degree is O(√m) under the orientation, so this join is skew-
  //     proof), directed 2-paths a→b→c (fan indeg·outdeg ≤ indeg·O(√m)),
  //     and in–in pairs (C(indeg,2) — exactly the intrinsic answer mass;
  //     no exact algorithm emits less). Halves total fan-out and bounds
  //     two of the three joins independently of hub degree.
  // The Σdeg² census (the q131-style pre-flight) picks the path:
  // above [[TwoHopFanoutCap]] the oriented enumeration runs. Distinct-
  // union per node, self excluded; top-20 by reach, tie-broken on id. ──
  /** Σdeg² fan-out cap above which q138 switches from the naive mid-node
    * self-join to the degree-oriented wedge enumeration. */
  private[graft] val TwoHopFanoutCap = 64L * 1000 * 1000

  private def q138(spark: SparkSession, dir: String): DataFrame =
    q138TwoHop(spark, dir, forceOriented = None)

  /** Both q138 wedge enumerations behind one census-driven selector;
    * `forceOriented` lets the spec pin their equality at test scale. */
  private[graft] def q138TwoHop(spark: SparkSession, dir: String,
      forceOriented: Option[Boolean]): DataFrame = {
    val d = TrainData.docsParallel(spark, dir).select(col("doc_id"))
    val n = Tables.documents(spark, dir).count() // driver scalar (q92 pattern)
    val adj = d.select(col("doc_id").as("src"),
        explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") * col("src") * 31 + col("j") * 97) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint(false) // symmetric closure feeds hop-1 and the mid join
    val sym = adj.select(col("u").as("a"), col("v").as("b"))
      .unionAll(adj.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(false)
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    // the q131-style pre-flight: Σdeg² prices the naive join BEFORE it
    // runs — by-need, so a spec-pinned `forceOriented` never pays the
    // census job it would discard
    lazy val fanout = deg.agg(sum(col("deg") * col("deg")).as("f"))
      .collect()(0).getLong(0) // driver scalar: one number off the degree census
    val oriented = forceOriented.getOrElse(fanout > TwoHopFanoutCap)
    val hop2 =
      if (!oriented)
        sym.join(sym.select(col("a").as("b"), col("b").as("c")), Seq("b"))
          .select(col("a"), col("c").as("b"))
      else // q132's orientation — the shared kernel in operators/Wedges
        graft.operators.Wedges.orientedTwoHop(adj, deg)
    val reach = sym.select(col("a"), col("b"))
      .unionAll(hop2)
      .filter(col("a") =!= col("b"))
    val oneHop = sym.groupBy("a").agg(countDistinct("b").as("n_1hop"))
    reach.groupBy("a").agg(countDistinct("b").as("n_2hop"))
      .join(oneHop, Seq("a"))
      .select(col("a").as("doc_id"), col("n_1hop"), col("n_2hop"))
      .orderBy(col("n_2hop").desc, col("doc_id"))
      .limit(20)
  }

  private val q138Sql =
    """WITH raw AS (
      |  SELECT src, dst FROM (
      |    SELECT doc_id AS src,
      |      (doc_id * doc_id * 31 + j * 97) % (SELECT COUNT(*) FROM documents) AS dst
      |    FROM (SELECT doc_id, unnest([1, 2, 3]) AS j FROM documents))
      |  WHERE dst != src),
      |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM raw),
      |sym AS (SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
      |hop2 AS (SELECT s1.a, s2.b FROM sym s1 JOIN sym s2 ON s1.b = s2.a),
      |reach AS (
      |  SELECT a, b FROM (SELECT a, b FROM sym UNION ALL SELECT a, b FROM hop2)
      |  WHERE a != b)
      |SELECT r.a AS doc_id,
      |  (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) FROM sym WHERE sym.a = r.a)
      |    AS n_1hop,
      |  CAST(COUNT(DISTINCT r.b) AS BIGINT) AS n_2hop
      |FROM reach r GROUP BY 1
      |ORDER BY n_2hop DESC, doc_id LIMIT 20""".stripMargin

  // ── q139: clickstream transition matrix — P(next event type | type)
  // per user journey: one LEAD window on the user's own time order,
  // then counts at (from, to) grain with integer-bp shares (the Markov
  // model a recommender or anomaly detector starts from). The share
  // window runs over the ≤|types|² transition census, never raw events. ──
  private def q139(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("next_type", lead("event_type", 1).over(ord))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTot = Window.partitionBy("from_type")
    trans
      .withColumn("n_from", sum("n_trans").over(fromTot))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        expr("(n_trans * 10000) div n_from").as("share_bp"))
      .orderBy("from_type", "to_type")
  }

  private val q139Sql =
    """WITH seq AS (
      |  SELECT event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS next_type
      |  FROM events),
      |trans AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_trans
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_trans,
      |  (n_trans * 10000) // CAST(SUM(n_trans) OVER (PARTITION BY from_type)
      |    AS BIGINT) AS share_bp
      |FROM trans ORDER BY from_type, to_type""".stripMargin

  // ── q140: contingency independence audit — lang × source observed vs
  // expected-under-independence cell counts (the drift/bias screen run
  // before training-mix decisions; a χ² would need float squares — the
  // per-cell ±20% flags are what an operator acts on, integer
  // cross-multiplied: obs·n ≷ rt·ct·(12/10 | 10/12)). Everything after
  // the one groupBy runs at the ≤|lang|·|source| cell census. ──
  private def q140(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("obs"))
    val rowT = Window.partitionBy("lang")
    val colT = Window.partitionBy("source")
    val tot = Window.partitionBy()
    cells
      .withColumn("rt", sum("obs").over(rowT))
      .withColumn("ct", sum("obs").over(colT))
      .withColumn("n", sum("obs").over(tot))
      .select(col("lang"), col("source"), col("obs"),
        expr("(rt * ct * 100) div (n * 100)").as("expected"),
        (col("obs") * col("n") * 10 > col("rt") * col("ct") * 12).as("over_rep"),
        (col("obs") * col("n") * 12 < col("rt") * col("ct") * 10).as("under_rep"))
      .orderBy("lang", "source")
  }

  private val q140Sql =
    """WITH cells AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
      |  FROM documents GROUP BY 1, 2),
      |t AS (
      |  SELECT lang, source, obs,
      |    CAST(SUM(obs) OVER (PARTITION BY lang) AS BIGINT) AS rt,
      |    CAST(SUM(obs) OVER (PARTITION BY source) AS BIGINT) AS ct,
      |    CAST(SUM(obs) OVER () AS BIGINT) AS n
      |  FROM cells)
      |SELECT lang, source, obs,
      |  (rt * ct * 100) // (n * 100) AS expected,
      |  obs * n * 10 > rt * ct * 12 AS over_rep,
      |  obs * n * 12 < rt * ct * 10 AS under_rep
      |FROM t ORDER BY lang, source""".stripMargin

  // ── q141: Benford first-digit screen — the classic fabricated-numbers
  // audit: leading-digit shares of order totals vs Benford's log10(1+1/d)
  // expectation. The transcendental expectations are PINNED ppm literals
  // (both engines read the same table — no runtime log), deviation is
  // exact integer ppm, flags fire beyond ±2 pp. Uniform synthetic prices
  // WILL flag heavily — that is the point of the audit (and the gate
  // replays the verdicts, not just the counts). ──
  private val BenfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
    66947L, 57992L, 51153L, 45757L)

  private def q141(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
    val tot = Window.partitionBy()
    digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .withColumn("n", sum("n_obs").over(tot))
      .withColumn("obs_ppm", expr("(n_obs * 1000000) div n"))
      .withColumn("benford_ppm",
        element_at(array(BenfordPpm.map(lit): _*), col("digit").cast("int")))
      .select(col("digit"), col("n_obs"), col("obs_ppm"), col("benford_ppm"),
        (col("obs_ppm") - col("benford_ppm")).as("dev_ppm"),
        (abs(col("obs_ppm") - col("benford_ppm")) > 20000L).as("flagged"))
      .orderBy("digit")
  }

  private val q141Sql =
    s"""WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders),
      |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
      |t AS (
      |  SELECT digit, n_obs,
      |    (n_obs * 1000000) // CAST(SUM(n_obs) OVER () AS BIGINT) AS obs_ppm,
      |    CAST(([${BenfordPpm.mkString(", ")}])[CAST(digit AS INT)] AS BIGINT)
      |      AS benford_ppm
      |  FROM g)
      |SELECT digit, n_obs, obs_ppm, benford_ppm,
      |  obs_ppm - benford_ppm AS dev_ppm,
      |  abs(obs_ppm - benford_ppm) > 20000 AS flagged
      |FROM t ORDER BY digit""".stripMargin

  // ── q142: revenue concentration (Pareto/Lorenz) — cumulative revenue
  // share by customer decile, the 80/20 audit behind account-tiering
  // decisions. Ranks are deterministic on (cents DESC, custkey); all
  // shares integer bp over exact cents. TWO selectable rank paths, both
  // exact (the spec pins their equality):
  //   - exact-window: one customer-grain row_number — the simple plan,
  //     but its Window.orderBy is a single-partition barrier, so it is
  //     only taken while the customer census stays under
  //     [[ParetoWindowCap]];
  //   - value-census (q130's histogram-boundary rule at cents grain):
  //     rank = (#customers with strictly higher cents, read off a
  //     cumulative window over the DISTINCT-cents census) + row_number
  //     within the customer's own cents value (a PARTITIONED window on
  //     cents, ordered by custkey — the same tie-break as the exact
  //     path). The only global-order window left runs at value grain,
  //     which is bounded by the money domain, not the customer count —
  //     at 1e9 customers the barrier processes ~1e5 distinct cents
  //     values while every customer-grain step stays partitioned. ──
  /** Customer-census threshold above which q142 abandons the
    * single-partition exact-rank window for the value-census rank. */
  private[graft] val ParetoWindowCap = 8L * 1000 * 1000

  private def q142(spark: SparkSession, dir: String): DataFrame =
    q142Pareto(spark, dir, forceScalePath = None)

  /** The two q142 rank paths over a (o_custkey, cents) relation —
    * shared with `ScaleProbe`'s warehouse family so the probe measures
    * the shipping kernel. Both produce the identical deterministic rank
    * on (cents DESC, o_custkey): the exact path through one
    * single-partition row_number window, the scale path through the
    * value-census rank (cumulative window at DISTINCT-cents grain +
    * a PARTITIONED within-value row_number). */
  private[graft] def paretoRank(rev: DataFrame, scalePath: Boolean): DataFrame =
    if (!scalePath) {
      val rank = Window.orderBy(col("cents").desc, col("o_custkey"))
      rev.withColumn("rk", row_number().over(rank).cast("long"))
    } else {
      val byValue = rev.groupBy("cents").agg(count(lit(1)).as("vcnt"))
      val cum = Window.orderBy(col("cents").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val above = byValue
        .withColumn("above", sum("vcnt").over(cum) - col("vcnt"))
        .select(col("cents"), col("above"))
      val within = Window.partitionBy("cents").orderBy("o_custkey")
      rev.join(above, Seq("cents"))
        .withColumn("rk", col("above") + row_number().over(within).cast("long"))
    }

  /** Both q142 rank paths behind one census-driven selector;
    * `forceScalePath` lets the spec pin their equality at test scale. */
  private[graft] def q142Pareto(spark: SparkSession, dir: String,
      forceScalePath: Option[Boolean]): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val nCust = rev.count() // driver scalar (q92's pattern) = the trigger census
    val ranked = paretoRank(rev, forceScalePath.getOrElse(nCust > ParetoWindowCap))
    val tot = Window.partitionBy()
    ranked
      .withColumn("nc", lit(nCust))
      .withColumn("decile", expr("((rk - 1) * 10) div nc"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("cents"))
      .withColumn("total", sum("cents").over(tot))
      .withColumn("share_bp", expr("(cents * 10000) div total"))
      .withColumn("cum_share_bp",
        expr("(sum(cents) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW) * 10000) div total"))
      .select("decile", "n_cust", "cents", "share_bp", "cum_share_bp")
      .orderBy("decile")
  }

  private val q142Sql =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT cents,
      |    ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk,
      |    COUNT(*) OVER () AS nc
      |  FROM rev),
      |dec AS (
      |  SELECT ((rk - 1) * 10) // nc AS decile,
      |    CAST(COUNT(*) AS BIGINT) AS n_cust, CAST(SUM(cents) AS BIGINT) AS cents
      |  FROM ranked GROUP BY 1)
      |SELECT CAST(decile AS BIGINT) AS decile, n_cust, cents,
      |  (cents * 10000) // CAST(SUM(cents) OVER () AS BIGINT) AS share_bp,
      |  (CAST(SUM(cents) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW) AS BIGINT) * 10000)
      |    // CAST(SUM(cents) OVER () AS BIGINT) AS cum_share_bp
      |FROM dec ORDER BY decile""".stripMargin

  // ── q143: conversion vs abandonment — the anti-path of q124's
  // attribution: per activity day, clicks that found a purchase within
  // the horizon vs clicks that never converted. Same forward as-of
  // kernel (one window pass, no join operator); abandonment is exactly
  // the rows attribution drops, so the two queries partition the click
  // stream between them (conversion+abandonment = all clicks). ──
  private def q143(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = graft.engine.Silver.dedupLatest(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    AsofJoin.forward(clicks, purchases, "user_id", "ts", "p_ts", Seq("p_id", "p_ts"))
      .withColumn("converted", col("p_id").isNotNull &&
        unix_micros(col("p_ts")) - unix_micros(col("ts")) <= AttrHorizonUs)
      .groupBy(to_date(col("ts")).as("click_date"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"),
        sum(when(col("converted"), 0L).otherwise(1L)).as("n_abandoned"))
      .withColumn("conversion_bp", expr("(n_converted * 10000) div n_clicks"))
      .orderBy("click_date")
  }

  private val q143Sql =
    s"""WITH p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, event_id AS p_id
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |        ORDER BY event_id DESC) rn FROM events
      |        WHERE event_type = 'purchase') WHERE rn = 1),
      |c AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT c.ts,
      |    (p.p_id IS NOT NULL
      |      AND epoch_us(p.p_ts) - epoch_us(c.ts) <= $AttrHorizonUs)
      |      AS converted
      |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.p_ts)
      |SELECT CAST(ts AS DATE) AS click_date,
      |  CAST(COUNT(*) AS BIGINT) AS n_clicks,
      |  CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_converted,
      |  CAST(SUM(CASE WHEN converted THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_abandoned,
      |  CAST((SUM(CASE WHEN converted THEN 1 ELSE 0 END) * 10000) // COUNT(*)
      |    AS BIGINT) AS conversion_bp
      |FROM j GROUP BY 1 ORDER BY click_date""".stripMargin

  // ── q144: calendar-gap audit — per event type: days inside the
  // type's own active span that saw NO events, and the longest such
  // outage run (the freshness/SLA check a pipeline operator reads
  // before trusting a rollup). Day spine = integer day indices off one
  // (min, max) row per type; gaps = spine anti-join actives; runs =
  // day − rank islands. Everything after the first groupBy runs at DAY
  // grain (≤ span × |types| rows at any event volume). ──
  private def q144(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct()
      .localCheckpoint(false) // day grain; feeds bounds + the anti-join
    val spine = days.groupBy("event_type")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val gaps = spine.join(days, Seq("event_type", "d"), "left_anti")
    val run = Window.partitionBy("event_type").orderBy("d")
    val runs = gaps
      .withColumn("grp", col("d") - row_number().over(run))
      .groupBy("event_type", "grp").agg(count(lit(1)).as("run_len"))
    val act = days.groupBy("event_type")
      .agg(count(lit(1)).as("n_active"), (max("d") - min("d") + 1).as("n_span"))
    act.join(runs.groupBy("event_type")
        .agg(count(lit(1)).as("n_outages"), max("run_len").as("longest_gap_days")),
        Seq("event_type"), "left")
      .select(col("event_type"), col("n_span"), col("n_active"),
        (col("n_span") - col("n_active")).as("n_gap_days"),
        coalesce(col("n_outages"), lit(0L)).as("n_outages"),
        coalesce(col("longest_gap_days"), lit(0L)).as("longest_gap_days"))
      .orderBy("event_type")
  }

  private val q144Sql =
    """WITH days AS (
      |  SELECT DISTINCT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
      |  FROM events),
      |bounds AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
      |           FROM days GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(d0, d1)) AS d
      |          FROM bounds),
      |gaps AS (SELECT s.event_type, s.d FROM spine s
      |         LEFT JOIN days dd ON s.event_type = dd.event_type AND s.d = dd.d
      |         WHERE dd.d IS NULL),
      |runs AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS run_len FROM (
      |    SELECT event_type, d,
      |      d - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS grp
      |    FROM gaps)
      |  GROUP BY event_type, grp),
      |act AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_active,
      |    CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n_span
      |  FROM days GROUP BY 1)
      |SELECT a.event_type, a.n_span, a.n_active,
      |  a.n_span - a.n_active AS n_gap_days,
      |  COALESCE(r.n_outages, 0) AS n_outages,
      |  COALESCE(r.longest_gap_days, 0) AS longest_gap_days
      |FROM act a LEFT JOIN (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_outages,
      |    CAST(MAX(run_len) AS BIGINT) AS longest_gap_days
      |  FROM runs GROUP BY 1) r USING (event_type)
      |ORDER BY event_type""".stripMargin

  // ── q145: event-time disorder audit — how out-of-order does the
  // stream actually arrive, measured at BATCH grain (arrival batch =
  // event_id div 1000, the ingest sequence): a batch is late when its
  // min event time precedes the running max event time of all EARLIER
  // batches, and the max such regression is precisely the watermark
  // delay the streaming jobs (Streams.attribute/debounce/sessionize)
  // need to avoid dropping data. Batch grain keeps the running-max
  // window over n/1000 rows — the way disorder is estimated at scale
  // (within-batch disorder is bounded by the batch's own time span,
  // reported alongside). ──
  private def q145(spark: SparkSession, dir: String): DataFrame = {
    val batches = Tables.events(spark, dir)
      .select(col("event_type"), expr("event_id div 1000").as("batch"),
        unix_micros(col("ts")).as("t"))
      .groupBy("event_type", "batch")
      .agg(min("t").as("min_t"), max("t").as("max_t"))
    val prev = Window.partitionBy("event_type").orderBy("batch")
      .rowsBetween(Window.unboundedPreceding, -1)
    batches
      .withColumn("prev_max", max("max_t").over(prev))
      .withColumn("late_us",
        when(col("prev_max").isNotNull && col("min_t") < col("prev_max"),
          col("prev_max") - col("min_t")).otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_batches"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late_batches"),
        max("late_us").as("max_lateness_us"),
        max(col("max_t") - col("min_t")).as("max_batch_span_us"))
      .withColumn("watermark_delay_s",
        expr("(max_lateness_us + 999999) div 1000000"))
      .orderBy("event_type")
  }

  private val q145Sql =
    """WITH b AS (
      |  SELECT event_type, event_id // 1000 AS batch,
      |    MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS min_t,
      |    MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_t
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, batch, min_t, max_t,
      |    MAX(max_t) OVER (PARTITION BY event_type ORDER BY batch
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM b),
      |l AS (
      |  SELECT event_type, min_t, max_t,
      |    CASE WHEN prev_max IS NOT NULL AND min_t < prev_max
      |      THEN prev_max - min_t ELSE 0 END AS late_us
      |  FROM m)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_batches,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late_batches,
      |  CAST(MAX(late_us) AS BIGINT) AS max_lateness_us,
      |  CAST(MAX(max_t - min_t) AS BIGINT) AS max_batch_span_us,
      |  (CAST(MAX(late_us) AS BIGINT) + 999999) // 1000000 AS watermark_delay_s
      |FROM l GROUP BY 1 ORDER BY event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q119_scd2_pit", q119, Some(q119Sql)),
    QueryDef("q120_join_estimate", q120, Some(q120Sql)),
    QueryDef("q121_tfidf_keywords", q121, Some(q121Sql)),
    QueryDef("q122_zorder_audit", q122, Some(q122Sql)),
    QueryDef("q123_mad_outliers", q123, Some(q123Sql)),
    QueryDef("q124_attribution", q124, Some(q124Sql)),
    QueryDef("q125_interval_merge", q125, Some(q125Sql)),
    QueryDef("q129_compaction_plan", q129, Some(q129Sql)),
    QueryDef("q130_range_boundaries", q130, Some(q130Sql)),
    QueryDef("q131_skew_audit", q131, Some(q131Sql)),
    QueryDef("q132_triangle_count", q132, Some(q132Sql)),
    QueryDef("q133_quantile_bins", q133, Some(q133Sql)),
    QueryDef("q134_argmax_top", q134, Some(q134Sql)),
    QueryDef("q135_median_impute", q135, Some(q135Sql)),
    QueryDef("q136_debounce", q136, Some(q136Sql)),
    QueryDef("q137_rolling_distinct", q137, Some(q137Sql)),
    QueryDef("q138_two_hop_reach", q138, Some(q138Sql)),
    QueryDef("q139_transition_matrix", q139, Some(q139Sql)),
    QueryDef("q140_contingency", q140, Some(q140Sql)),
    QueryDef("q141_benford", q141, Some(q141Sql)),
    QueryDef("q142_pareto", q142, Some(q142Sql)),
    QueryDef("q143_conversion", q143, Some(q143Sql)),
    QueryDef("q144_gap_audit", q144, Some(q144Sql)),
    QueryDef("q145_disorder_audit", q145, Some(q145Sql)))
}
