package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Corpus hygiene & governance operators — round-7 additions closing the
  * remaining "day two" gaps of a production training-data pipeline:
  *
  *   - q93: EVAL-BUDGET APPORTIONMENT — given a fixed evaluation budget
  *     (N docs to hold out / annotate), allocate an exact integer count
  *     per (lang, source) stratum proportional to token mass using
  *     largest-remainder (Hamilton) apportionment: floor the quotas,
  *     hand the leftover seats to the largest remainders under a unique
  *     total order. Integer-exact, so Σ alloc == budget by construction
  *     and both engines agree bit-for-bit (no float shares).
  *   - q94: CANARY SCAN — benchmark-canary detection (BIG-bench style
  *     GUID strings): extract GUID-shaped candidate tokens row-locally
  *     with a regex, then equi-join against the canary list. The
  *     extract-then-equi-join shape is the scalable plan: per-pattern
  *     substring scans (LIKE-joins) are nested-loop at any size, while
  *     candidate extraction is fused into the scan and the join key is
  *     hashable. Canaries are planted deterministically (q44's PII
  *     pattern) so both engines see identical text.
  *   - q95: DOMAIN BLOCKLIST FILTER — web-corpus URL governance next to
  *     q78's canonicalization: per-doc host → registered domain + TLD,
  *     subdomain policy rule (row-local prefix test) plus a registered-
  *     domain blocklist (broadcast equi-join), with per-TLD doc/token
  *     retention accounting. Precedence is pinned (subdomain rule fires
  *     before the list) so the attribution is deterministic.
  *   - q96: TEXT NORMALIZATION — the unicode-hygiene pass every crawl
  *     corpus runs before tokenization: strip zero-width characters,
  *     normalize controls (tab/CR/LF) and NBSP to spaces, collapse runs,
  *     trim. Dirt is injected deterministically per doc-id residue; the
  *     cleaner must restore the original text EXACTLY (n_restored ==
  *     n_docs is part of the gated output — a self-checking invariant,
  *     not just a count).
  *
  * Reference framing: the reference's transform stage normalizes HTML
  * and empty strings (src/transformer/transformer.py:40-78,
  * data_quality.py:24-54) and never audits its eval split, canaries or
  * crawl domains; these are the at-scale generalizations of that
  * cleaning stage to corpus governance.
  */
object Hygiene {

  // ── q93: eval-budget apportionment (largest remainder / Hamilton).
  // Stratum grain = (lang, source); quota_i = tok_i * B / Σtok in exact
  // integer arithmetic: floor + remainder, leftover seats go to the
  // largest remainders with (lang, source) as the unique tie-break.
  // Scale: one corpus aggregation to ≤ |langs|×|sources| rows; the
  // windows run at that aggregated grain (≤ hundreds of rows on any
  // corpus), never over raw documents — the q07/q90 pattern. ──
  private val EvalBudget = 1000L

  /** Hamilton (largest-remainder) apportionment over arbitrary strata
    * `(lang, source, n_docs, n_tok)`: floor the exact integer quotas,
    * hand the `budget − Σfloor` leftover seats to the largest remainders
    * under the unique (rem DESC, lang, source) order. Exposed to the
    * property spec, which pins Σ alloc == budget and the quota-rule
    * bound (every alloc is its floor or floor + 1) on random strata. */
  private[graft] def apportion(strata: DataFrame, budget: Long): DataFrame = {
    val all = Window.partitionBy()
    strata
      .withColumn("total_tok", sum("n_tok").over(all))
      .withColumn("floor_alloc",
        expr(s"(n_tok * $budget) div total_tok"))
      .withColumn("rem", (col("n_tok") * budget) % col("total_tok"))
      .withColumn("leftover", lit(budget) - sum("floor_alloc").over(all))
      .withColumn("rnk", row_number().over(
        all.orderBy(col("rem").desc, col("lang"), col("source"))))
      .withColumn("extra", when(col("rnk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("alloc", col("floor_alloc") + col("extra"))
  }

  /** Shared Hamilton-apportionment core (q93 summary, q97 selection):
    * per-(lang, source) stratum rows with exact integer `alloc`. */
  private def allocations(spark: SparkSession, dir: String): DataFrame =
    apportion(Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tok")),
      EvalBudget)

  private def q93(spark: SparkSession, dir: String): DataFrame =
    allocations(spark, dir)
      .select(col("lang"), col("source"), col("n_docs"), col("n_tok"),
        col("floor_alloc"), col("extra"), col("alloc"))
      .orderBy("lang", "source")

  /** Oracle twin of [[allocations]] — CTEs ending in
    * `seats(lang, source, n_docs, n_tok, floor_alloc, extra, alloc)`. */
  private val allocCtes =
    s"""strata AS (
      |  SELECT lang, source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      |  FROM documents GROUP BY lang, source),
      |ranked AS (
      |  SELECT *,
      |    CAST(SUM(n_tok) OVER () AS BIGINT) AS total_tok,
      |    (n_tok * $EvalBudget) // CAST(SUM(n_tok) OVER () AS BIGINT) AS floor_alloc,
      |    (n_tok * $EvalBudget) % CAST(SUM(n_tok) OVER () AS BIGINT) AS rem
      |  FROM strata),
      |seated AS (
      |  SELECT *,
      |    $EvalBudget - CAST(SUM(floor_alloc) OVER () AS BIGINT) AS leftover,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang, source) AS rnk
      |  FROM ranked),
      |seats AS (
      |  SELECT lang, source, n_docs, n_tok,
      |    CAST(floor_alloc AS BIGINT) AS floor_alloc,
      |    CAST(CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
      |    CAST(floor_alloc + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |  FROM seated)""".stripMargin

  private val q93Sql =
    s"""WITH $allocCtes
      |SELECT lang, source, n_docs, n_tok, floor_alloc, extra, alloc
      |FROM seats ORDER BY lang, source""".stripMargin

  // ── q94: canary scan. Canary GUIDs are planted into every 37th doc
  // (guid chosen by doc_id % 5); detection extracts GUID-shaped tokens
  // row-locally (regexp fused into the scan) and equi-joins the tiny
  // canary list (broadcast) — never a per-pattern LIKE scan, which
  // cannot hash-join and degrades to a nested loop over patterns ×
  // corpus. Zero-hit canaries stay in the report (right join): "canary
  // absent" is the finding that matters most. ──
  private def q94(spark: SparkSession, dir: String): DataFrame = {
    val canaries = spark.range(0, 5)
      .select(col("id").as("canary_id"),
        concat(lit("canary-"),
          md5(concat(lit("canary:"), col("id").cast("string")))).as("guid"))
    val injected = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 37 === 0,
          concat(col("text"), lit(" canary-"),
            md5(concat(lit("canary:"), (col("doc_id") % 5).cast("string")))))
          .otherwise(col("text")).as("text2"))
    val hits = injected
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text2"),
          lit("canary-[0-9a-f]{32}"), lit(0))).as("guid"))
      .groupBy("guid")
      .agg(count(lit(1)).as("n_hits"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    broadcast(canaries).join(hits, Seq("guid"), "left")
      .select(col("canary_id"), col("guid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_doc"), col("last_doc"))
      .orderBy("canary_id")
  }

  private val q94Sql =
    """WITH canaries AS (
      |  SELECT k AS canary_id,
      |    'canary-' || md5('canary:' || CAST(k AS VARCHAR)) AS guid
      |  FROM range(5) t(k)),
      |injected AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 37 = 0
      |      THEN text || ' canary-' || md5('canary:' || CAST(doc_id % 5 AS VARCHAR))
      |      ELSE text END AS text2
      |  FROM documents),
      |hit AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text2, 'canary-[0-9a-f]{32}')) AS guid
      |  FROM injected),
      |agg AS (
      |  SELECT guid, COUNT(*) AS n_hits, MIN(doc_id) AS first_doc,
      |    MAX(doc_id) AS last_doc
      |  FROM hit GROUP BY guid)
      |SELECT c.canary_id, c.guid,
      |  CAST(COALESCE(a.n_hits, 0) AS BIGINT) AS n_hits,
      |  a.first_doc, a.last_doc
      |FROM canaries c LEFT JOIN agg a USING (guid)
      |ORDER BY canary_id""".stripMargin

  // ── q95: domain blocklist filter. Hosts are synthesized from
  // (source, doc_id) residues exactly like q78's raw URLs; governance
  // applies two rule shapes a crawl pipeline actually has: a row-local
  // subdomain policy (ads.* never enters the corpus — fused into the
  // scan) and a registered-domain blocklist (tiny, broadcast equi-join).
  // Precedence subdomain > list is pinned so attribution counts are
  // deterministic. Rollup grain = TLD. ──
  private val BlockedDomains = Seq(
    "src1.example.com", "src3.example.com", "src4.example.net",
    "src7.example.io", "src12.example.org")

  private def q95(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blocklist = BlockedDomains.toDF("blocked_domain")
    val hosts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        when(col("doc_id") % 4 === 0, "com").when(col("doc_id") % 4 === 1, "org")
          .when(col("doc_id") % 4 === 2, "net").otherwise("io").as("tld"),
        (col("doc_id") % 11 < 3).as("is_ads"))
      .withColumn("registered",
        concat(col("source"), lit(".example."), col("tld")))
    hosts.join(broadcast(blocklist),
        col("registered") === col("blocked_domain"), "left")
      .withColumn("verdict",
        when(col("is_ads"), "blocked_subdomain")
          .when(col("blocked_domain").isNotNull, "blocked_domain")
          .otherwise("kept"))
      .groupBy("tld")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("verdict") === "blocked_subdomain", 1L).otherwise(0L))
          .as("n_blocked_subdomain"),
        sum(when(col("verdict") === "blocked_domain", 1L).otherwise(0L))
          .as("n_blocked_domain"),
        sum(when(col("verdict") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("verdict") === "kept", col("n_tok")).otherwise(0L))
          .as("tok_kept"))
      .orderBy("tld")
  }

  private val q95Sql =
    s"""WITH blocklist(blocked_domain) AS (
      |  VALUES ${BlockedDomains.map(d => s"('$d')").mkString(", ")}),
      |hosts AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |      WHEN 2 THEN 'net' ELSE 'io' END AS tld,
      |    doc_id % 11 < 3 AS is_ads
      |  FROM documents),
      |ruled AS (
      |  SELECT h.*,
      |    CASE WHEN h.is_ads THEN 'blocked_subdomain'
      |      WHEN b.blocked_domain IS NOT NULL THEN 'blocked_domain'
      |      ELSE 'kept' END AS verdict
      |  FROM hosts h
      |  LEFT JOIN blocklist b
      |    ON h.source || '.example.' || h.tld = b.blocked_domain)
      |SELECT tld, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN verdict = 'blocked_subdomain' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_blocked_subdomain,
      |  CAST(SUM(CASE WHEN verdict = 'blocked_domain' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_blocked_domain,
      |  CAST(SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN verdict = 'kept' THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept
      |FROM ruled GROUP BY tld ORDER BY tld""".stripMargin

  // ── q96: text normalization. Dirt injected by doc-id residue: %5 → a
  // leading "\t ", %11 → every space becomes NBSP, %3 → trailing
  // " \u200B\u200B", %7 → trailing CRLF. The cleaner strips zero-width
  // code points, maps controls+NBSP to spaces, collapses runs, trims —
  // and must restore the ORIGINAL text exactly (n_restored is gated, so
  // an over- or under-aggressive cleaner fails the oracle, not just a
  // counter). Everything is row-local, fused into the scan — the whole
  // query is one aggregation at (lang) grain. ──
  private def q96(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("dirty", concat(
        when(col("doc_id") % 5 === 0, "\t ").otherwise(""),
        when(col("doc_id") % 11 === 0,
          regexp_replace(col("text"), " ", "\u00A0")).otherwise(col("text")),
        when(col("doc_id") % 3 === 0, " \u200B\u200B").otherwise(""),
        when(col("doc_id") % 7 === 0, "\r\n").otherwise("")))
      .withColumn("clean", trim(regexp_replace(regexp_replace(regexp_replace(
        col("dirty"),
        "[\u200B\u200C\u200D\uFEFF]", ""),
        "[\t\r\n\u00A0]", " "),
        " +", " ")))
    d.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dirty") =!= col("text"), 1L).otherwise(0L)).as("n_dirty"),
        sum(when(col("doc_id") % 3 === 0, 1L).otherwise(0L)).as("n_zero_width"),
        sum(when(col("doc_id") % 11 === 0, 1L).otherwise(0L)).as("n_nbsp"),
        sum(length(col("dirty")) - length(col("clean"))).cast("long")
          .as("chars_removed"),
        sum(when(col("clean") === col("text"), 1L).otherwise(0L)).as("n_restored"))
      .orderBy("lang")
  }

  private val q96Sql =
    """WITH dirtied AS (
      |  SELECT lang, doc_id, text,
      |    (CASE WHEN doc_id % 5 = 0 THEN chr(9) || ' ' ELSE '' END)
      |    || (CASE WHEN doc_id % 11 = 0 THEN replace(text, ' ', chr(160)) ELSE text END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(8203) || chr(8203) ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN chr(13) || chr(10) ELSE '' END) AS dirty
      |  FROM documents),
      |cleaned AS (
      |  SELECT lang, doc_id, text, dirty,
      |    trim(regexp_replace(regexp_replace(regexp_replace(dirty,
      |      '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']', '', 'g'),
      |      '[' || chr(9) || chr(13) || chr(10) || chr(160) || ']', ' ', 'g'),
      |      ' +', ' ', 'g')) AS clean
      |  FROM dirtied)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN dirty != text THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty,
      |  CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_width,
      |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nbsp,
      |  CAST(SUM(length(dirty) - length(clean)) AS BIGINT) AS chars_removed,
      |  CAST(SUM(CASE WHEN clean = text THEN 1 ELSE 0 END) AS BIGINT) AS n_restored
      |FROM cleaned GROUP BY lang ORDER BY lang""".stripMargin

  // ── q97: stratified eval-set SELECTION — the apply side of q93: given
  // the exact per-stratum allocations, pick exactly `alloc` docs per
  // (lang, source), ordered by a deterministic per-doc hash (the same
  // key-hashed reproducibility as q59/q67 sampling: the picked set is
  // identical on every run, engine and partitioning). The literal
  // rn <= budget pre-filter is WindowGroupLimit-eligible (no stratum can
  // ever receive more than the whole budget), so at scale each window
  // partition emits at most `budget` rows from the rank pushdown BEFORE
  // the tiny alloc join applies the exact per-stratum cut. ──
  private def q97(spark: SparkSession, dir: String): DataFrame = {
    val alloc = allocations(spark, dir).select("lang", "source", "alloc")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(concat(lit("q97:"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang", "source").orderBy(col("hk"), col("doc_id"))))
      .filter(col("rn") <= EvalBudget) // literal bound -> WindowGroupLimit
      .join(alloc, Seq("lang", "source"))
      .filter(col("rn") <= col("alloc"))
      .select(col("lang"), col("source"), col("doc_id"),
        col("rn").cast("long").as("pick_rank"))
      .orderBy("lang", "source", "pick_rank")
  }

  private val q97Sql =
    s"""WITH $allocCtes,
      |hashed AS (
      |  SELECT doc_id, lang, source,
      |    md5('q97:' || CAST(doc_id AS VARCHAR)) AS hk
      |  FROM documents),
      |rns AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY hk, doc_id) AS rn
      |  FROM hashed)
      |SELECT r.lang, r.source, r.doc_id, CAST(r.rn AS BIGINT) AS pick_rank
      |FROM rns r JOIN seats s ON r.lang = s.lang AND r.source = s.source
      |WHERE r.rn <= s.alloc
      |ORDER BY r.lang, r.source, pick_rank""".stripMargin

  // ── q98: LSH RECALL AUDIT — measures what the production near-dup
  // filter (capped MinHash-LSH + strong signature agreement, q49's edge
  // set) actually catches, against exact shingle-Jaccard ground truth
  // computed for a deterministic audit slice (doc_id % 10 = 7 — the
  // residue is the audit-rate knob). Truth = pairs with exact bigram
  // Jaccard > 1/2, tested integer cross-multiplied (2·|A∩B| >
  // |A|+|B|−|A∩B| — no float boundary). Per probe: candidate pairs,
  // truth pairs, and truth∩candidates — recall and precision read off
  // as exact integer ratios. Scale: the probe slice joins the corpus
  // shingle table on the shingle key (the q57 decontam shape — an
  // equi-join, never per-pair scans); the LSH side reuses the capped
  // banded candidates unchanged. ──
  private def q98(spark: SparkSession, dir: String): DataFrame =
    q98Impl(spark, dir, force = None)

  /** q98 with a selectable truth-join plan. Default (None) = the raw
    * shingle equi-join the oracle mirrors literally. `Some("prefix")` =
    * the df-ascending PPJoin prefix pigeonhole at τ=1/2 — the SAME
    * truth set (HygieneSpec pins row equality; recall preserved by the
    * prefix theorem), different cost shape: the raw join pays
    * Σ_s df_probe(s)·df_corpus(s) intermediate rows (a boilerplate hot
    * shingle couples every probe to the whole corpus — quadratic in the
    * hot key), the prefix plan pays a df census + a join on each doc's
    * RAREST ⌊n/2⌋+1 shingles + a row-local verify. Which wins is a
    * CORPUS-SHAPE question, not a size question (measured, SCALE.md
    * truthjoin leg): with a rare-shingle tail + boilerplate skew the
    * prefix plan collapses the hot key to nothing; on a corpus whose
    * every shingle is common (the dense synthetic here — no rare tail
    * for prefixes to pick) the raw join's partial-aggregated count is
    * cheaper than shipping candidate pairs with full sets. Hence a
    * `force` lever rather than an auto-census: the operator reads the
    * df distribution (q56's census) and picks. */
  private[graft] def q98Impl(spark: SparkSession, dir: String,
                             force: Option[String]): DataFrame =
    q98Docs(TrainData.docsParallel(spark, dir).select("doc_id", "text"), force)

  /** [[q98Impl]] over an arbitrary (doc_id, text) corpus — the
    * ScaleProbe truthjoin leg feeds synthetic corpus shapes through the
    * exact code path the gated query ships. */
  private[graft] def q98Docs(d: DataFrame,
                             force: Option[String]): DataFrame = {
    import graft.operators.MinHashLsh
    require(force.forall(Set("exact", "prefix")),
      s"q98: force must be exact|prefix, got $force")
    val isProbe = (c: Column) => c % 10 === 7
    // exact ground truth over the audit slice
    val sh = d
      .select(col("doc_id"), MinHashLsh.bigrams(col("text")).as("sg"))
      .localCheckpoint(false) // consumed by probe slice, corpus explode, sizes
    val sizes = sh.select(col("doc_id"), size(col("sg")).as("n_sg"))
    val usePrefix = force.contains("prefix")
    val truth = (if (!usePrefix) {
      // raw shingle equi-join: every co-occurrence shuffles — fine at
      // audit scale, and the shape the oracle replays literally
      val pex = sh.filter(isProbe(col("doc_id")))
        .select(col("doc_id").as("p_id"), explode(col("sg")).as("s"))
      val cex = sh.select(col("doc_id").as("c_id"), explode(col("sg")).as("s"))
      val inter = pex.join(cex, Seq("s"))
        .filter(col("c_id") =!= col("p_id"))
        .groupBy("p_id", "c_id").agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("p_id"), col("n_sg").as("n_p")), "p_id")
        .join(sizes.select(col("doc_id").as("c_id"), col("n_sg").as("n_c")), "c_id")
        .filter(col("n_inter") * 2 > col("n_p") + col("n_c") - col("n_inter"))
        .select("p_id", "c_id")
    } else {
      // the 100 TB plan — q157's df-ascending prefix pigeonhole at
      // τ=1/2: each doc keeps only its n − ⌈n/2⌉ + 1 RAREST shingles
      // (global df ascending, shingle tie-break), and a pair with
      // Jaccard > 1/2 must share a token in BOTH prefixes (miss A's
      // prefix ⇒ inter ≤ ⌈n_a/2⌉ − 1 ⇒ jac < 1/2) — so joining
      // prefixes loses NO truth pair while the boilerplate hot key
      // (max-df shingle) sorts to the END of every order and falls out
      // of almost every prefix. Survivors verify row-locally on the
      // full sets (array_intersect), giving the identical truth set —
      // spec-pinned equal, HygieneSpec.
      val tokAll = sh.select(col("doc_id"), size(col("sg")).as("n"),
        explode(col("sg")).as("s"))
      val dfS = tokAll.groupBy("s").agg(count(lit(1)).as("df"))
      val pref = tokAll.join(dfS, Seq("s"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "s")))
        .filter(col("rn") <= expr("n - ((n + 1) div 2) + 1"))
        .select("doc_id", "s", "n")
      val cand = pref.filter(isProbe(col("doc_id")))
        .select(col("doc_id").as("p_id"), col("s"), col("n").as("n_p"))
        .join(pref.select(col("doc_id").as("c_id"), col("s"),
          col("n").as("n_c")), Seq("s"))
        // jac > 1/2 ⇒ max < 2·min (jac ≤ min/max) — exact-recall cut
        .filter(col("c_id") =!= col("p_id") &&
          col("n_p") < col("n_c") * 2 && col("n_c") < col("n_p") * 2)
        .select("p_id", "c_id").distinct()
      cand
        .join(sh.select(col("doc_id").as("p_id"), col("sg").as("sgp")), "p_id")
        .join(sh.select(col("doc_id").as("c_id"), col("sg").as("sgc")), "c_id")
        .withColumn("n_inter",
          size(array_intersect(col("sgp"), col("sgc"))).cast("long"))
        .filter(col("n_inter") * 2 >
          size(col("sgp")) + size(col("sgc")) - col("n_inter"))
        .select("p_id", "c_id")
    }).localCheckpoint(false) // tiny; consumed by the truth count AND the semi-join
    // what the production filter caught
    val sigs = MinHashLsh.signatures(d).localCheckpoint(false)
    val strong = MinHashLsh.candidates(sigs, maxBucket = TrainData.LshMaxBucket)
      .filter(col("n_sig_match") >= TrainData.LshStrongMatch)
    val candP = strong
      .select(col("doc_a").as("p_id"), col("doc_b").as("c_id"))
      .filter(isProbe(col("p_id")))
      .unionByName(strong.select(col("doc_b").as("p_id"), col("doc_a").as("c_id"))
        .filter(isProbe(col("p_id"))))
      .localCheckpoint(false) // tiny; consumed by the cand count AND the semi-join
    val nTruth = truth.groupBy("p_id").agg(count(lit(1)).as("n_truth"))
    val nCand = candP.groupBy("p_id").agg(count(lit(1)).as("n_cand"))
    val nFound = truth.join(candP, Seq("p_id", "c_id"), "left_semi")
      .groupBy("p_id").agg(count(lit(1)).as("n_found"))
    d.filter(isProbe(col("doc_id"))).select(col("doc_id").as("probe_doc"))
      .join(nTruth, col("probe_doc") === nTruth("p_id"), "left").drop("p_id")
      .join(nCand, col("probe_doc") === nCand("p_id"), "left").drop("p_id")
      .join(nFound, col("probe_doc") === nFound("p_id"), "left").drop("p_id")
      .select(col("probe_doc"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_found"), lit(0L)).as("n_found"))
      // report only probes where the audit has signal: any truth or any
      // candidate (all-zero rows are the corpus-sized trivial majority)
      .filter(col("n_truth") > 0 || col("n_cand") > 0)
      .orderBy("probe_doc")
  }

  private val q98Sql =
    s"""WITH ${TrainData.lshCandidateCtes},
      |strong AS (
      |  SELECT doc_a, doc_b FROM cand WHERE n_sig_match >= ${TrainData.LshStrongMatch}),
      |candp AS (
      |  SELECT doc_a AS p_id, doc_b AS c_id FROM strong WHERE doc_a % 10 = 7
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM strong WHERE doc_b % 10 = 7),
      |sizes AS (SELECT doc_id, len(sg) AS n_sg FROM sh),
      |pex AS (SELECT doc_id AS p_id, unnest(sg) AS s FROM sh WHERE doc_id % 10 = 7),
      |cex AS (SELECT doc_id AS c_id, unnest(sg) AS s FROM sh),
      |inter AS (
      |  SELECT p_id, c_id, COUNT(*) AS n_inter
      |  FROM pex p JOIN cex c ON p.s = c.s AND c.c_id != p.p_id
      |  GROUP BY 1, 2),
      |truth AS (
      |  SELECT i.p_id, i.c_id
      |  FROM inter i
      |  JOIN sizes a ON i.p_id = a.doc_id
      |  JOIN sizes b ON i.c_id = b.doc_id
      |  WHERE i.n_inter * 2 > a.n_sg + b.n_sg - i.n_inter),
      |counts AS (
      |  SELECT p.doc_id AS probe_doc,
      |    CAST(COALESCE(t.n, 0) AS BIGINT) AS n_truth,
      |    CAST(COALESCE(cp.n, 0) AS BIGINT) AS n_cand,
      |    CAST(COALESCE(f.n, 0) AS BIGINT) AS n_found
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) p
      |  LEFT JOIN (SELECT p_id, COUNT(*) AS n FROM truth GROUP BY 1) t
      |    ON p.doc_id = t.p_id
      |  LEFT JOIN (SELECT p_id, COUNT(*) AS n FROM candp GROUP BY 1) cp
      |    ON p.doc_id = cp.p_id
      |  LEFT JOIN (SELECT p_id, COUNT(*) AS n FROM truth tr
      |             WHERE EXISTS (SELECT 1 FROM candp c2
      |               WHERE c2.p_id = tr.p_id AND c2.c_id = tr.c_id)
      |             GROUP BY 1) f
      |    ON p.doc_id = f.p_id)
      |SELECT * FROM counts
      |WHERE n_truth > 0 OR n_cand > 0
      |ORDER BY probe_doc""".stripMargin

  // ── q99: INCREMENTAL cluster-label maintenance — q53/q73/q83's
  // incremental contract applied to near-dup clustering: the stored
  // (node → comp) labels from the prior corpus stand in for the old
  // RAW edge set (labels are node-sized and already star-shaped; the
  // old candidate pairs — potentially far larger — are never re-read),
  // and only the new batch's pairs join them. CC over stored-stars ∪
  // new-pairs must equal CC over ALL pairs from scratch — that
  // equivalence IS the oracle gate (the oracle full-recomputes).
  // Candidate pairs are derived once over the full corpus (incremental
  // CANDIDATE generation is q73's contract; this query owns the
  // label-merge step). n_batch_members attributes each cluster's share
  // of new-batch docs. ──
  private def q99(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConnectedComponents, MinHashLsh}
    val sigs = MinHashLsh.signatures(TrainData.docsParallel(spark, dir))
      .localCheckpoint(false)
    val pairs = MinHashLsh.candidates(sigs, maxBucket = TrainData.LshMaxBucket)
      .filter(col("n_sig_match") >= TrainData.LshStrongMatch)
      .select("doc_a", "doc_b")
      .localCheckpoint(false) // consumed by the old slice AND the new slice
    val oldPairs = pairs
      .filter(col("doc_a") % 4 =!= 0 && col("doc_b") % 4 =!= 0)
    val newPairs = pairs
      .filter(col("doc_a") % 4 === 0 || col("doc_b") % 4 === 0)
    // stored state: the prior run's labels (node-sized star forest)
    val stored = ConnectedComponents(oldPairs, "doc_a", "doc_b")
    val merged = ConnectedComponents(
      stored.select(col("node").as("doc_a"), col("comp").as("doc_b"))
        .unionByName(newPairs), "doc_a", "doc_b")
    merged
      .groupBy(col("comp").as("keeper_doc"))
      .agg(count(lit(1)).as("cluster_size"), max("node").as("max_doc"),
        sum(when(col("node") % 4 === 0, 1L).otherwise(0L)).as("n_batch_members"))
      .orderBy("keeper_doc")
  }

  private val q99Sql =
    s"""WITH RECURSIVE ${TrainData.lshCandidateCtes},
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  WHERE n_sig_match >= ${TrainData.LshStrongMatch}),
      |${TrainData.ccClosureSql("pairs", "doc_a", "doc_b")}
      |SELECT comp AS keeper_doc, COUNT(*) AS cluster_size, MAX(node) AS max_doc,
      |  CAST(SUM(CASE WHEN node % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_batch_members
      |FROM comps GROUP BY comp ORDER BY keeper_doc""".stripMargin

  // ── q100: CLUSTER-AWARE SPLIT ASSIGNMENT — the remediation for what
  // q77 audits: assigning train/val per-document leaks near-duplicate
  // signal across the split; assigning per-CLUSTER (every member takes
  // the hash of its cluster keeper; singletons hash their own id)
  // guarantees zero cross-split near-dup pairs BY CONSTRUCTION — and
  // that zero is part of the gated output (leak_pairs), not a comment.
  // Same 3/16 val rate and key-hash determinism as q77/q59. Scale: one
  // clustering pass (shared with q49), a node-sized label left-join,
  // and a 1-row leak audit broadcast onto the per-split rollup. ──
  private def q100(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConnectedComponents, MinHashLsh}
    val d = Tables.documents(spark, dir)
    val sigs = MinHashLsh.signatures(TrainData.docsParallel(spark, dir))
      .localCheckpoint(false)
    val pairs = MinHashLsh.candidates(sigs, maxBucket = TrainData.LshMaxBucket)
      .filter(col("n_sig_match") >= TrainData.LshStrongMatch)
      .select("doc_a", "doc_b")
      .localCheckpoint(false) // consumed by the labels AND the leak audit
    val labels = ConnectedComponents(pairs, "doc_a", "doc_b")
    val assigned = d
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .join(labels, col("doc_id") === col("node"), "left")
      .withColumn("group_key", coalesce(col("comp"), col("doc_id")))
      .withColumn("split",
        when(substring(md5(concat(lit("q100:"), col("group_key").cast("string"))),
          1, 1) < "3", "val").otherwise("train"))
      .localCheckpoint(false) // consumed by the rollup AND the leak audit
    val leak = pairs
      .join(assigned.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(assigned.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .agg(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("leak_pairs"))
      // non-foldable never-null key (IvfFlat's trick): pmod(hash(data), 1)
      // is always 0 but the planner can't fold it, so the 1-row audit
      // joins as a BroadcastHashJoin — not a nested loop (a literal key
      // constant-folds the condition away and degrades to BNLJ)
      .withColumn("__k", pmod(hash(col("leak_pairs")), lit(1)))
    assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"),
        countDistinct("group_key").as("n_groups"))
      .withColumn("__k", pmod(hash(col("split")), lit(1)))
      .join(broadcast(leak), "__k").drop("__k")
      .orderBy("split")
  }

  private val q100Sql =
    s"""WITH RECURSIVE ${TrainData.lshCandidateCtes},
      |pairs AS (
      |  SELECT doc_a, doc_b FROM cand
      |  WHERE n_sig_match >= ${TrainData.LshStrongMatch}),
      |${TrainData.ccClosureSql("pairs", "doc_a", "doc_b")},
      |assigned AS (
      |  SELECT d.doc_id,
      |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
      |    COALESCE(c.comp, d.doc_id) AS group_key,
      |    CASE WHEN substr(md5('q100:'
      |        || CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)), 1, 1) < '3'
      |      THEN 'val' ELSE 'train' END AS split
      |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
      |leak AS (
      |  SELECT CAST(SUM(CASE WHEN a.split != b.split THEN 1 ELSE 0 END) AS BIGINT)
      |    AS leak_pairs
      |  FROM pairs p
      |  JOIN assigned a ON p.doc_a = a.doc_id
      |  JOIN assigned b ON p.doc_b = b.doc_id)
      |SELECT s.split, s.n_docs, s.n_tok, s.n_groups, l.leak_pairs
      |FROM (
      |  SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tok,
      |    CAST(COUNT(DISTINCT group_key) AS BIGINT) AS n_groups
      |  FROM assigned GROUP BY split) s
      |CROSS JOIN leak l
      |ORDER BY s.split""".stripMargin

  // ── q101: FUZZY VOCABULARY JOIN — edit-distance-1 word pairing via
  // deletion-neighborhood hashing (FastSS): each vocab word emits
  // itself plus every single-character deletion as join keys; two words
  // within distance 1 ALWAYS share a key (w2 is a deletion of w1, or
  // both delete the substituted position), so candidate generation is
  // an equi-join on the variant key — never the quadratic
  // levenshtein-everything cross join. Exact levenshtein == 1 then
  // verifies candidates (both engines' classic DP, integer-exact), and
  // pairs fold typo → canonical by (higher frequency, lexicographic)
  // — the vocab-normalization step (typo folding) a tokenizer pipeline
  // runs before counting. Typos are planted deterministically (q44's
  // pattern): every 13th doc's first word loses its 2nd character.
  // Scale: variants ≈ (len+1)·|vocab| rows — vocab-sized (MBs at 100 TB
  // corpus), one equi-join, and the corpus itself is touched once for
  // the word count. ──
  private def q101(spark: SparkSession, dir: String): DataFrame = {
    val d = TrainData.docsParallel(spark, dir)
      .withColumn("fw", substring_index(col("text"), " ", 1))
      .withColumn("text2",
        when(col("doc_id") % 13 === 0 && length(col("fw")) >= 3,
          concat(expr("substring(fw, 1, 1)"), expr("substring(fw, 3)"),
            expr("case when instr(text, ' ') > 0" +
              " then substring(text, instr(text, ' ')) else '' end")))
          .otherwise(col("text")))
    val vocab = d.select(explode(split(col("text2"), " ")).as("w"))
      .filter(length(col("w")) >= 3)
      .groupBy("w").agg(count(lit(1)).as("f"))
    val vars = vocab.withColumn("v", explode(expr(
        "array_union(array(w), transform(sequence(1, length(w))," +
          " i -> concat(substring(w, 1, i - 1), substring(w, i + 1))))")))
    val cand = vars.select(col("w").as("w1"), col("f").as("f1"), col("v"))
      .join(vars.select(col("w").as("w2"), col("f").as("f2"), col("v")), "v")
      .filter(col("w1") < col("w2"))
      .select("w1", "f1", "w2", "f2").distinct()
      .filter(levenshtein(col("w1"), col("w2")) === 1)
    cand
      .withColumn("is1Typo",
        col("f1") < col("f2") || (col("f1") === col("f2") && col("w1") > col("w2")))
      .select(
        when(col("is1Typo"), col("w1")).otherwise(col("w2")).as("variant_w"),
        when(col("is1Typo"), col("f1")).otherwise(col("f2")).as("f_variant"),
        when(col("is1Typo"), col("w2")).otherwise(col("w1")).as("canonical_w"),
        when(col("is1Typo"), col("f2")).otherwise(col("f1")).as("f_canonical"))
      .orderBy("variant_w", "canonical_w")
  }

  private val q101Sql =
    """WITH inj AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 AND len(split_part(text, ' ', 1)) >= 3
      |      THEN substr(split_part(text, ' ', 1), 1, 1)
      |        || substr(split_part(text, ' ', 1), 3)
      |        || CASE WHEN instr(text, ' ') > 0
      |             THEN substr(text, CAST(instr(text, ' ') AS INT)) ELSE '' END
      |      ELSE text END AS text2
      |  FROM documents),
      |vocab AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM (SELECT unnest(string_split(text2, ' ')) AS w FROM inj)
      |  WHERE len(w) >= 3 GROUP BY 1),
      |vars AS (
      |  SELECT w, f, w AS v FROM vocab
      |  UNION ALL
      |  SELECT w, f,
      |    substr(w, 1, CAST(i AS INT) - 1) || substr(w, CAST(i AS INT) + 1) AS v
      |  FROM (SELECT w, f, unnest(range(1, len(w) + 1)) AS i FROM vocab)),
      |cand AS (
      |  SELECT DISTINCT a.w AS w1, a.f AS f1, b.w AS w2, b.f AS f2
      |  FROM vars a JOIN vars b ON a.v = b.v AND a.w < b.w),
      |close_pairs AS (
      |  SELECT * FROM cand WHERE levenshtein(w1, w2) = 1)
      |SELECT
      |  CASE WHEN f1 < f2 OR (f1 = f2 AND w1 > w2) THEN w1 ELSE w2 END AS variant_w,
      |  CASE WHEN f1 < f2 OR (f1 = f2 AND w1 > w2) THEN f1 ELSE f2 END AS f_variant,
      |  CASE WHEN f1 < f2 OR (f1 = f2 AND w1 > w2) THEN w2 ELSE w1 END AS canonical_w,
      |  CASE WHEN f1 < f2 OR (f1 = f2 AND w1 > w2) THEN f2 ELSE f1 END AS f_canonical
      |FROM close_pairs
      |ORDER BY variant_w, canonical_w""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q93_eval_allocation", q93, Some(q93Sql)),
    QueryDef("q94_canary_scan", q94, Some(q94Sql)),
    QueryDef("q95_domain_filter", q95, Some(q95Sql)),
    QueryDef("q96_text_normalize", q96, Some(q96Sql)),
    QueryDef("q97_stratified_pick", q97, Some(q97Sql)),
    QueryDef("q98_lsh_recall", q98, Some(q98Sql)),
    QueryDef("q99_incremental_clusters", q99, Some(q99Sql)),
    QueryDef("q100_cluster_split", q100, Some(q100Sql)),
    QueryDef("q101_fuzzy_vocab", q101, Some(q101Sql)))
}
