package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{AnnLsh, ConnectedComponents, IvfFlat, MinHashLsh, SnapshotDiff}

/** Training-data pipeline operators over `documents`/`embeddings` — the
  * 100 TB-scale extensions: exact + near dedup (MinHash LSH, SimHash,
  * n-gram Jaccard), similarity search (brute-force + bucketed ANN),
  * language ID, quality scoring, token statistics and fingerprinting.
  *
  * Portability note: every hash used for dedup/LSH is built from `md5`
  * (identical across Spark and DuckDB) and compared as hex STRINGS, so the
  * oracle reproduces signatures byte-for-byte without engine-specific
  * integer hash functions.
  *
  * Scale notes: all shingle/minhash pipelines are explode → groupBy(key)
  * shuffles — linear in corpus size, partitioned by doc or signature key;
  * the LSH band join is the standard quadratic-in-bucket candidate join,
  * bounded by band-bucket size, never a full cross join.
  */
object TrainData {

  /** The per-doc shingle/hash derivations are CPU-bound (interpreted
    * higher-order functions); a small single-file scan would pin them to
    * one task, so spread the corpus across the cluster first. On a real
    * lake the scan already has thousands of splits and this is a no-op
    * cost-wise (one round-robin shuffle of doc_id+text). */
  private[queries] def docsParallel(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)

  private[graft] def embParallel(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).repartition(spark.sparkContext.defaultParallelism)

  private[queries] def tokens(c: Column): Column = split(c, " ")

  // ── q20: exact dedup — content-hash groups (sha2 ≡ DuckDB sha256). ──
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_doc_id"))
      .orderBy(col("content_hash"))
      .limit(50)
  }

  private val q20Sql =
    """SELECT sha256(text) AS content_hash, COUNT(*) AS n_copies,
      |  MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY 1 ORDER BY content_hash LIMIT 50""".stripMargin

  // ── q21: MinHash + LSH near-dup — bigram shingles, k=4 signature, 2
  // bands × 2 components, per-bucket size cap; candidate pairs scored by
  // signature agreement. Scale rationale in operators/MinHashLsh.scala. ──
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    // Materialize signatures ONCE (the banded self-join reads them from
    // both sides plus the bucket-size probe) via eager localCheckpoint —
    // NOT persist(): a CacheManager entry with no unpersist outlives the
    // query and grows executor storage without bound across a long job;
    // checkpoint blocks are MEMORY_AND_DISK and GC-scoped.
    val sigs = MinHashLsh.signatures(docsParallel(spark, dir)).localCheckpoint(false)
    MinHashLsh.candidates(sigs, maxBucket = LshMaxBucket)
      .orderBy(col("doc_a"), col("doc_b"))
      .limit(200)
  }

  /** Shared LSH policy knobs — referenced by every consumer (q21/q23/
    * q49/q66/q72/q73/q75, ScaleProbe) so a tuning change lands
    * everywhere at once. `LshStrongMatch` = minimum signature agreement
    * for a pair to count as a dedup EDGE (vs a mere candidate). */
  private[graft] val LshMaxBucket = 64
  private[graft] val LshStrongMatch = 3

  /** Size-capped banded rows — the oracle QUALIFY form of
    * `MinHashLsh.capBuckets`, shared by every banded-candidate CTE. */
  private def lshKeptSql(banded: String): String =
    s"""SELECT * FROM $banded
      |  QUALIFY COUNT(*) OVER (PARTITION BY band, bk) <= $LshMaxBucket""".stripMargin

  /** Shared oracle CTEs: shingles → signatures → banded rows → size-capped
    * buckets → candidate pairs, mirroring [[MinHashLsh]] exactly. */
  private[queries] val lshCandidateCtes =
    s"""sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS sg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |sigs AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 1, 8)), 'min') AS mh1,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 9, 8)), 'min') AS mh2,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 17, 8)), 'min') AS mh3,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 25, 8)), 'min') AS mh4
      |  FROM sh WHERE len(sg) > 0),
      |banded AS (
      |  SELECT doc_id, mh1, mh2, mh3, mh4, 1 AS band, mh1 || mh2 AS bk FROM sigs
      |  UNION ALL
      |  SELECT doc_id, mh1, mh2, mh3, mh4, 2 AS band, mh3 || mh4 AS bk FROM sigs),
      |kept AS (
      |  ${lshKeptSql("banded")}),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END
      |     + CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END
      |     + CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END
      |     + CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) AS n_sig_match
      |  FROM kept a JOIN kept b
      |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)""".stripMargin

  private val q21Sql =
    s"""WITH $lshCandidateCtes
      |SELECT doc_a, doc_b, n_sig_match FROM cand
      |ORDER BY doc_a, doc_b LIMIT 200""".stripMargin

  // ── q22: SimHash fingerprint — the production 64-bit shape: each
  // token's md5 supplies 64 hash bits (the first 16 hex nibbles decoded
  // to 4 bits each), majority vote per bit, composed to a BIGINT. The
  // nibble decode is `instr('0123456789abcdef', c) - 1` on BOTH engines —
  // the one hex-to-int primitive Spark SQL and DuckDB share exactly. ──

  /** Per-doc 64-bit SimHash (shared by q22 and q51). Bit j is decoded
    * from md5 nibble j/4 (bit j%4); composition uses `1L << j`, whose
    * j=63 value is Long.MinValue — two's-complement addition of distinct
    * powers is carry-free, so the sum IS the bit pattern. */
  private def simhashOf(spark: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(spark, dir)
    val tok = d.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("tok"))
      .withColumn("h", md5(col("tok")))
    // decode the 16 nibbles once per token; the 64 bit-votes below are
    // then cheap shift/mask reads, not 64 substring evaluations
    val nib = (0 until 16).map(n =>
      expr(s"instr('0123456789abcdef', substring(h, ${n + 1}, 1)) - 1").as(s"n$n"))
    val tokN = tok.select(col("doc_id") +: nib: _*)
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col(s"n${j / 4}"), j % 4).bitwiseAND(lit(1)) === 1, 1)
        .otherwise(-1)).as(s"s$j")
    }
    val simhash = (0 until 64)
      .map(j => when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    tokN.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  private def q22(spark: SparkSession, dir: String): DataFrame =
    simhashOf(spark, dir).orderBy("doc_id")

  /** Shared oracle CTEs: tokens → nibble decode → per-bit majority votes
    * → composed 64-bit simhash, mirroring [[simhashOf]]. DuckDB rejects
    * `1::BIGINT << 63` as overflow, so bit 63 composes via the
    * Long.MinValue literal, added LAST to keep every partial sum in
    * BIGINT range (DuckDB checks addition overflow; Spark wraps). */
  private val simhashCtes = {
    val nibbles = (0 until 16).map(n =>
      s"instr('0123456789abcdef', substr(h, ${n + 1}, 1)) - 1 AS n$n")
      .mkString(",\n      |    ")
    val bitSums = (0 until 64).map { j =>
      s"SUM(CASE WHEN (n${j / 4} >> ${j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n      |    ")
    val compose = ((0 until 63)
      .map(j => s"CASE WHEN s$j >= 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END") :+
      "CASE WHEN s63 >= 0 THEN (-9223372036854775807 - 1) ELSE 0::BIGINT END")
      .mkString(" + ")
    s"""tok AS (
      |  SELECT doc_id, md5(t) AS h
      |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |        FROM documents)),
      |nib AS (
      |  SELECT doc_id,
      |    $nibbles
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id,
      |    $bitSums
      |  FROM nib GROUP BY doc_id),
      |sh AS (SELECT doc_id, $compose AS simhash FROM bits)""".stripMargin
  }

  private val q22Sql =
    s"""WITH $simhashCtes
      |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  // ── q51: SimHash near-dup pairing — completes SimHash as a dedup: the
  // 64-bit fingerprint splits into 4 × 16-bit bands (Manku et al.,
  // WWW'07): any pair within Hamming distance ≤ 3 differs in at most 3
  // bands, so by pigeonhole it agrees EXACTLY on at least one — recall
  // for the hd ≤ 3 predicate is guaranteed, not probabilistic. Same
  // per-bucket size cap as the MinHash path, pairs re-ranked by exact
  // 64-bit Hamming distance. Sign-extension is banding-safe: both
  // engines shift arithmetically and `& 65535` masks the extended bits,
  // so band 4 (bits 48–63) keys identically despite negative BIGINTs. ──
  /** SimHash band-bucket size cap (q51) — the 16-bit-band analog of
    * [[LshMaxBucket]]; its oracle twin is interpolated into q51Sql. */
  private val SimhashMaxBucket = 64

  private def q51(spark: SparkSession, dir: String): DataFrame = {
    // Materialize the fingerprints ONCE (localCheckpoint — GC-scoped, see
    // q21): the banded relation is referenced by the bucket-size probe and
    // by BOTH self-join sides, and without the checkpoint each reference
    // re-runs the tokenize → md5 → 64-way majority-vote aggregation —
    // the most expensive subtree in the query — up to 3× over.
    val sh = simhashOf(spark, dir).localCheckpoint(false)
    // Single-pass banding: one explode of 4 (band, bk) structs per row.
    // The previous 4-way unionByName scanned the fingerprint relation
    // once per band; the explode is a narrow generate over one scan.
    val bandStructs = (1 to 4).map(band => struct(
      lit(band).as("band"),
      shiftright(col("simhash"), 16 * (band - 1)).bitwiseAND(lit(65535L)).as("bk")))
    val banded = sh
      .select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val small = banded.groupBy("band", "bk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= SimhashMaxBucket).select("band", "bk")
    val kept = banded.join(small, Seq("band", "bk"))
    val a = kept.select(col("band"), col("bk"), col("doc_id").as("a_id"),
      col("simhash").as("a_sh"))
    val b = kept.select(col("band"), col("bk"), col("doc_id").as("b_id"),
      col("simhash").as("b_sh"))
    a.join(b, Seq("band", "bk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        expr("CAST(bit_count(a_sh ^ b_sh) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
      .limit(200)
  }

  private val q51Sql = {
    val bandRows = (1 to 4).map(k =>
      s"SELECT doc_id, simhash, $k AS band, (simhash >> ${16 * (k - 1)}) & 65535 AS bk FROM sh")
      .mkString("\n      |  UNION ALL\n      |  ")
    s"""WITH $simhashCtes,
      |banded AS (
      |  $bandRows),
      |kept AS (
      |  SELECT * FROM banded
      |  QUALIFY COUNT(*) OVER (PARTITION BY band, bk) <= $SimhashMaxBucket),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      |  FROM kept a JOIN kept b
      |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
      |ORDER BY doc_a, doc_b LIMIT 200""".stripMargin
  }

  // ── q23: exact n-gram Jaccard re-rank over the LSH candidate pairs —
  // the production near-dup shape: q21's banded candidates bound the pair
  // set (linear via bucket cap), then an exact shingle-level equi-join
  // computes |A∩B| per candidate; |A∪B| = |A|+|B|−|A∩B|. Rational of
  // small ints → bit-identical double in both engines. ──
  /** Broadcast left-semi restriction of the corpus to candidate doc ids —
    * the corpus side never shuffles (plan shape pinned in PlanSpec; the
    * eager checkpoint in q23 hides it from the final query plan). */
  private[graft] def pruneToCandidates(d: DataFrame, candDocs: DataFrame): DataFrame =
    d.join(broadcast(candDocs), Seq("doc_id"), "left_semi")

  /** Shared exact shingle-overlap core (q23 Jaccard, q72 containment):
    * LSH-bounded candidate pairs + exact per-pair |A∩B| and set sizes —
    * (doc_a, doc_b, n_inter, n_a, n_b). */
  private def shingleOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(spark, dir)
    // localCheckpoint, not persist: GC-scoped blocks, no CacheManager
    // leak across queries (see q21).
    val sigs = MinHashLsh.signatures(d).localCheckpoint(false)
    val cand = MinHashLsh.candidates(sigs, maxBucket = LshMaxBucket)
      .select("doc_a", "doc_b").localCheckpoint(false)
    // Only docs that appear in some candidate pair matter for the exact
    // re-rank, so semi-join-prune the corpus BEFORE exploding shingles:
    // the exploded table shrinks from every doc's bigrams (~8M rows at
    // sf0.1) to just the candidate slice, which is what both
    // intersection joins and the size lookup actually consume. The
    // candidate-doc list is bounded by 2× the capped pair count —
    // broadcast it so the corpus never shuffles for the prune.
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
    // Prune from a FRESH scan, not the repartitioned `d`: the broadcast
    // semi-join filters at the scan and only the candidate slice (≤ 2×
    // the capped pair count) survives, so the round-robin shuffle that
    // spreads shingle CPU for the signature build would here shuffle the
    // whole corpus to keep a few hundred rows.
    val pruned = pruneToCandidates(Tables.documents(spark, dir), candDocs)
      .select(col("doc_id"), MinHashLsh.bigrams(col("text")).as("sg"))
      .localCheckpoint(false)
    val sizes = pruned.select(col("doc_id"), size(col("sg")).as("n_sg"))
    val ex = pruned.select(col("doc_id"), explode(col("sg")).as("s"))
    // |A∩B| per candidate pair: fan A's shingles over the pair list, then
    // match B's on (doc, shingle) — two hash joins, no all-pairs blowup.
    val inter = cand
      .join(ex.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(ex.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sg", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sg", "n_b"), "doc_b")
  }

  /** Oracle CTEs matching [[shingleOverlap]]: `inter(doc_a, doc_b,
    * n_inter)` + `sizes(doc_id, n_sg)` over the LSH candidates. */
  private val shingleOverlapCtes =
    s"""$lshCandidateCtes,
      |sizes AS (SELECT doc_id, len(sg) AS n_sg FROM sh),
      |ex AS (SELECT doc_id, unnest(sg) AS s FROM sh),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      |  FROM (SELECT DISTINCT doc_a, doc_b FROM cand) c
      |  JOIN ex x ON x.doc_id = c.doc_a
      |  JOIN ex y ON y.doc_id = c.doc_b AND y.s = x.s
      |  GROUP BY 1, 2)""".stripMargin

  private def q23(spark: SparkSession, dir: String): DataFrame =
    shingleOverlap(spark, dir)
      .withColumn("jaccard", col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") > 0.1)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
      .orderBy("doc_a", "doc_b")
      .limit(200)

  private val q23Sql =
    s"""WITH $shingleOverlapCtes
      |SELECT i.doc_a, i.doc_b, i.n_inter,
      |  i.n_inter / CAST(a.n_sg + b.n_sg - i.n_inter AS DOUBLE) AS jaccard
      |FROM inter i
      |JOIN sizes a ON i.doc_a = a.doc_id
      |JOIN sizes b ON i.doc_b = b.doc_id
      |WHERE i.n_inter / CAST(a.n_sg + b.n_sg - i.n_inter AS DOUBLE) > 0.1
      |ORDER BY doc_a, doc_b LIMIT 200""".stripMargin

  // ── q24: brute-force cosine top-k — 5 probe vectors × full corpus via
  // the codegen'd CosineSimilarity expression (identical left-to-right
  // double accumulation to the oracle's list_aggregate), top-10 per probe
  // with id tie-break. ──
  private[queries] def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  private def q24(spark: SparkSession, dir: String): DataFrame = {
    // probes: 5 rows — filter pushes into the scan, no repartition needed;
    // only the candidate side spreads for the per-pair kernel work
    val probes = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cands = embParallel(spark, dir)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
        col("label").as("cand_label"))
    val scored = probes.join(cands, col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", cosine(col("pv"), col("cv")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("probe_id"), col("cand_id"), col("cand_label"), col("cosine"),
        col("rk").cast("int").as("rk"))
      .orderBy("probe_id", "rk")
  }

  private val q24Sql =
    """WITH probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5),
      |cands AS (
      |  SELECT vec_id AS cand_id, embedding AS cv, label AS cand_label FROM embeddings),
      |scored AS (
      |  SELECT probe_id, cand_id, cand_label,
      |    list_aggregate(list_transform(range(1, len(pv) + 1),
      |      i -> CAST(pv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum')
      |    / (sqrt(list_aggregate(list_transform(range(1, len(pv) + 1),
      |         i -> CAST(pv[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)), 'sum'))
      |       * sqrt(list_aggregate(list_transform(range(1, len(cv) + 1),
      |           i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum'))) AS cosine
      |  FROM probes JOIN cands ON probe_id != cand_id)
      |SELECT probe_id, cand_id, cand_label, cosine, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      |            ORDER BY cosine DESC, cand_id) AS rk
      |  FROM scored)
      |WHERE rk <= 10 ORDER BY probe_id, rk""".stripMargin

  // ── q25: multi-table sign-LSH ANN (the scale path) — 4 tables × 16
  // sign bits over disjoint dim blocks, per-bucket size cap, candidates
  // re-ranked by exact cosine. n_tables = collision strength. Scale
  // rationale in operators/AnnLsh.scala. ──
  private val AnnTables = 4
  private val AnnBits = 16
  private val AnnMaxBucket = 128

  private def q25(spark: SparkSession, dir: String): DataFrame = {
    val e = embParallel(spark, dir).select(col("vec_id"), col("embedding"))
    AnnLsh.candidates(e, tables = AnnTables, bits = AnnBits, maxBucket = AnnMaxBucket)
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("av")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("bv")), "b_id")
      .withColumn("cosine", cosine(col("av"), col("bv")))
      .select(col("a_id"), col("b_id"), col("n_tables"), col("cosine"))
      .orderBy(col("a_id"), col("b_id"))
      .limit(300)
  }

  /** Shared oracle CTEs mirroring [[AnnLsh.candidates]] over `src`:
    * sign-bit bucket keys per table → size-capped buckets → candidate
    * pairs with `n_tables` collision strength. */
  private def annBitsSql(lo: Int) = (lo until lo + AnnBits).map(i =>
    s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  private def annKeyedSql(src: String): String =
    (0 until AnnTables).map(t =>
      s"SELECT vec_id, $t AS tbl, ${annBitsSql(t * AnnBits + 1)} AS bucket FROM $src")
      .mkString("\n      |  UNION ALL\n      |  ")

  private def annCandidateCtes(src: String): String = {
    val keyed = annKeyedSql(src)
    s"""keyed AS (
      |  $keyed),
      |kept AS (
      |  SELECT * FROM keyed
      |  QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= $AnnMaxBucket),
      |pairs AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, COUNT(DISTINCT a.tbl) AS n_tables
      |  FROM kept a JOIN kept b
      |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2)""".stripMargin
  }

  /** DuckDB cosine with the same left-to-right double accumulation as the
    * codegen'd [[graft.functions.CosineSimilarity]] (bit-identical). */
  private def cosineSql(ea: String, eb: String): String =
    s"""list_aggregate(list_transform(range(1, len($ea.embedding) + 1),
      |    i -> CAST($ea.embedding[i] AS DOUBLE) * CAST($eb.embedding[i] AS DOUBLE)), 'sum')
      |  / (sqrt(list_aggregate(list_transform(range(1, len($ea.embedding) + 1),
      |       i -> CAST($ea.embedding[i] AS DOUBLE) * CAST($ea.embedding[i] AS DOUBLE)), 'sum'))
      |     * sqrt(list_aggregate(list_transform(range(1, len($eb.embedding) + 1),
      |         i -> CAST($eb.embedding[i] AS DOUBLE) * CAST($eb.embedding[i] AS DOUBLE)), 'sum')))""".stripMargin

  private val q25Sql =
    s"""WITH ${annCandidateCtes("embeddings")}
      |SELECT p.a_id, p.b_id, p.n_tables,
      |  ${cosineSql("ea", "eb")} AS cosine
      |FROM pairs p
      |JOIN embeddings ea ON p.a_id = ea.vec_id
      |JOIN embeddings eb ON p.b_id = eb.vec_id
      |ORDER BY a_id, b_id LIMIT 300""".stripMargin

  // ── q26: language ID (n-gram/stopword heuristic) — stopword hit ratio
  // per doc, thresholded prediction, confusion counts vs the labeled lang. ──
  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def q26(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = tokens(col("text"))
    // codegen'd one-pass stopword probe (an interpreted filter-lambda
    // here is the same hot-loop tax word_bigrams removed — see
    // functions/TokenSetCount.scala)
    val nStop = graft.functions.TokenSetCount(col("text"), Stopwords)
    val scored = d.select(col("doc_id"), col("lang"),
      nStop.as("n_stop"), size(t).as("n_tok"))
      .withColumn("pred_en", col("n_stop") * 20 >= col("n_tok"))
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_en"), 1L).otherwise(0L)).as("n_pred_en"),
        sum("n_stop").as("total_stop"),
        sum("n_tok").as("total_tok"))
      .orderBy("lang")
  }

  private val q26Sql = {
    val set = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH scored AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '), x -> x IN ($set))) AS n_stop,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_stop * 20 >= n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en,
      |  CAST(SUM(n_stop) AS BIGINT) AS total_stop,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tok
      |FROM scored GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ── q27: quality scoring — integer-only features (token count, distinct
  // ratio, stopword count, char length) bucketed to a tier; per-source
  // distribution. ──
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = tokens(col("text"))
    val feats = d.select(col("doc_id"), col("source"),
      size(t).as("n_tok"),
      size(array_distinct(t)).as("n_distinct"),
      graft.functions.TokenSetCount(col("text"), Stopwords).as("n_stop"),
      col("n_chars"))
    val tier = when(col("n_tok") >= 100 && col("n_distinct") * 3 >= col("n_tok"), "high")
      .when(col("n_tok") >= 30, "medium")
      .otherwise("low")
    feats.withColumn("quality_tier", tier)
      .groupBy("source", "quality_tier")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tok"),
        sum("n_distinct").as("total_distinct"),
        max("n_chars").as("max_chars"))
      .orderBy("source", "quality_tier")
  }

  private val q27Sql = {
    val set = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH feats AS (
      |  SELECT doc_id, source,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |    len(list_filter(string_split(text, ' '), x -> x IN ($set))) AS n_stop,
      |    n_chars
      |  FROM documents)
      |SELECT source,
      |  CASE WHEN n_tok >= 100 AND n_distinct * 3 >= n_tok THEN 'high'
      |       WHEN n_tok >= 30 THEN 'medium' ELSE 'low' END AS quality_tier,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tok,
      |  CAST(SUM(n_distinct) AS BIGINT) AS total_distinct, MAX(n_chars) AS max_chars
      |FROM feats GROUP BY 1, 2 ORDER BY source, quality_tier""".stripMargin
  }

  // ── q28: token counting — whitespace split vs a BPE-ish regex
  // ([a-z]+ runs / digit runs / single non-space), global distribution. ──
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .as("bpe_tokens"),
        col("n_chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("bpe_tokens").as("total_bpe_tokens"),
        max("ws_tokens").as("max_ws_tokens"))
      .orderBy("source")
  }

  private val q28Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpe_tokens,
      |  CAST(MAX(len(string_split(text, ' '))) AS INTEGER) AS max_ws_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ── q29: document fingerprint — md5 over the sorted distinct token set
  // (order-insensitive content identity), collision groups. ──
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text")))))).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("fingerprint"))
      .limit(100)
  }

  private val q29Sql =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY n_docs DESC, fingerprint LIMIT 100""".stripMargin

  // ── q44: PII/URL scrubbing — regex removal of emails and URLs (training
  // corpora hygiene). Sensitive spans are injected deterministically so
  // the oracle can reproduce the scrub byte-for-byte; regexes are in the
  // Java∩RE2 common subset. ──
  private def q44(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val dirty = when(col("doc_id") % 5 === 0,
      concat(lit("contact me.1@example.com or https://ex.io/p?q=1 "), col("text")))
      .otherwise(col("text"))
    val noUrl = regexp_replace(dirty, "https?://[^ ]+", "<URL>")
    val clean = regexp_replace(noUrl, "[a-z0-9._]+@[a-z0-9.]+", "<EMAIL>")
    d.select(col("doc_id"), clean.as("clean"),
        (length(dirty) - length(clean)).as("removed_chars"))
      .groupBy((col("doc_id") % 5 === 0).as("was_dirty"))
      .agg(count(lit(1)).as("n_docs"),
        sum("removed_chars").as("total_removed"),
        sum(when(col("clean").contains("<EMAIL>"), 1L).otherwise(0L)).as("n_email_hits"),
        sum(when(col("clean").contains("<URL>"), 1L).otherwise(0L)).as("n_url_hits"))
      .orderBy("was_dirty")
  }

  private val q44Sql =
    """WITH scrub AS (
      |  SELECT doc_id, doc_id % 5 = 0 AS was_dirty,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN 'contact me.1@example.com or https://ex.io/p?q=1 ' || text
      |         ELSE text END AS dirty
      |  FROM documents),
      |cleaned AS (
      |  SELECT doc_id, was_dirty, dirty,
      |    regexp_replace(regexp_replace(dirty, 'https?://[^ ]+', '<URL>', 'g'),
      |                   '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g') AS clean
      |  FROM scrub)
      |SELECT was_dirty, COUNT(*) AS n_docs,
      |  CAST(SUM(length(dirty) - length(clean)) AS BIGINT) AS total_removed,
      |  CAST(SUM(CASE WHEN contains(clean, '<EMAIL>') THEN 1 ELSE 0 END) AS BIGINT) AS n_email_hits,
      |  CAST(SUM(CASE WHEN contains(clean, '<URL>') THEN 1 ELSE 0 END) AS BIGINT) AS n_url_hits
      |FROM cleaned GROUP BY was_dirty ORDER BY was_dirty""".stripMargin

  // ── q45: deterministic hash sampling — reproducible ~1/8 corpus sample
  // keyed on content hash (same rows selected on every run, every engine,
  // any partitioning — unlike seeded RNG sampling, which is
  // engine-specific). The standard way to carve stable train/eval slices. ──
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("in_sample", substring(md5(col("text")), 1, 1).isin("0", "1"))
    d.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"),
        min(when(col("in_sample"), col("doc_id"))).as("first_sampled_doc"))
      .orderBy("lang")
  }

  private val q45Sql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN substr(md5(text), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  MIN(CASE WHEN substr(md5(text), 1, 1) IN ('0', '1') THEN doc_id END) AS first_sampled_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ── q49: near-dup CLUSTERS — the dedup decision step: LSH candidate
  // pairs (strong agreement only) → connected components → one keeper
  // (the minimum doc_id = the component label) per duplicate group.
  // O(log n)-round star contraction, no driver-side graph state; the
  // oracle reproduces components via a recursive-CTE transitive closure
  // (fine at oracle scale, quadratic in cluster size — the engine-side
  // algorithm is the one that survives 100 TB). ──
  private def q49(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint, not persist — GC-scoped, no cache leak (see q21).
    val sigs = MinHashLsh.signatures(docsParallel(spark, dir)).localCheckpoint(false)
    val pairs = MinHashLsh.candidates(sigs, maxBucket = LshMaxBucket)
      .filter(col("n_sig_match") >= LshStrongMatch)
      .select("doc_a", "doc_b")
    ConnectedComponents(pairs, "doc_a", "doc_b")
      .groupBy(col("comp").as("keeper_doc"))
      .agg(count(lit(1)).as("cluster_size"), max("node").as("max_doc"))
      .orderBy("keeper_doc")
  }

  /** Recursive-CTE transitive closure over edge CTE `edges(a, b)` —
    * yields `comps(node, comp)` with comp = component minimum; the
    * oracle mirror of [[ConnectedComponents]], shared by every
    * clustering oracle (q49/q52/q66/q75). */
  private[queries] def ccClosureSql(edges: String, a: String, b: String): String =
    s"""sym AS (
      |  SELECT $a AS a, $b AS b FROM $edges
      |  UNION SELECT $b, $a FROM $edges),
      |reach(a, b) AS (
      |  SELECT DISTINCT a, a FROM sym
      |  UNION
      |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      |comps AS (SELECT a AS node, MIN(b) AS comp FROM reach GROUP BY a)""".stripMargin

  private val q49Sql =
    s"""WITH RECURSIVE $lshCandidateCtes,
      |pairs AS (SELECT doc_a, doc_b FROM cand WHERE n_sig_match >= $LshStrongMatch),
      |${ccClosureSql("pairs", "doc_a", "doc_b")}
      |SELECT comp AS keeper_doc, COUNT(*) AS cluster_size, MAX(node) AS max_doc
      |FROM comps GROUP BY comp ORDER BY keeper_doc""".stripMargin

  // ── q52: embedding-cluster dedup — the SEMANTIC-dedup stage of a
  // training pipeline, closing the ANN loop the way q49 closes the text
  // loop: ANN candidate pairs, exact-cosine thresholded, clustered by
  // connected components, one keeper (min vec_id) per cluster.
  //
  // The synthetic embeddings are random vectors with NO true near-dups
  // (max pairwise cosine ≈0.51 at sf0.01), so — like q44's deterministic
  // PII injection — every 10th vector is planted as an exact copy at
  // vec_id + max(vec_id) + 1 (data-derived offset: a fixed constant
  // would collide with real ids once the corpus outgrows it), reproduced
  // identically in the oracle. An exact copy has identical sign buckets
  // (collides in every table) and cosine ≈1.0; the 0.8 threshold sits
  // far above any random pair and far below the planted ones, so the
  // filter is boundary-safe in both engines. Originals sort below every
  // planted copy, so the min-id keeper is always the original. ──
  private val Q52Threshold = 0.8

  private def q52(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // single-row scalar read — the id-space bound, not data movement
    val offset = base.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    val dups = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(offset)).as("vec_id"), col("embedding"))
    // localCheckpoint: `all` feeds the 4 bucket tables, the hub-cap probe
    // and BOTH embedding-attach joins — materializing once replaces up to
    // seven re-evaluations of the union+repartition subtree (exchange
    // reuse only dedups identical plan fragments, not the post-shuffle
    // recomputes under different projections)
    val all = base.unionByName(dups)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(false)
    val edges = AnnLsh.candidates(all,
        tables = AnnTables, bits = AnnBits, maxBucket = AnnMaxBucket)
      .join(all.select(col("vec_id").as("a_id"), col("embedding").as("av")), "a_id")
      .join(all.select(col("vec_id").as("b_id"), col("embedding").as("bv")), "b_id")
      .filter(cosine(col("av"), col("bv")) >= Q52Threshold)
      .select("a_id", "b_id")
    ConnectedComponents(edges, "a_id", "b_id")
      .groupBy(col("comp").as("keeper_vec"))
      .agg(count(lit(1)).as("cluster_size"), max("node").as("max_vec"))
      .orderBy("keeper_vec")
  }

  private val q52Sql =
    s"""WITH RECURSIVE all_vecs AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings), embedding
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |${annCandidateCtes("all_vecs")},
      |scored AS (
      |  SELECT p.a_id, p.b_id,
      |    ${cosineSql("ea", "eb")} AS cosine
      |  FROM pairs p
      |  JOIN all_vecs ea ON p.a_id = ea.vec_id
      |  JOIN all_vecs eb ON p.b_id = eb.vec_id),
      |edges AS (SELECT a_id, b_id FROM scored WHERE cosine >= $Q52Threshold),
      |${ccClosureSql("edges", "a_id", "b_id")}
      |SELECT comp AS keeper_vec, COUNT(*) AS cluster_size, MAX(node) AS max_vec
      |FROM comps GROUP BY comp ORDER BY keeper_vec""".stripMargin

  // ── q53: INCREMENTAL exact dedup — the cross-run analog of q20: an
  // incoming batch is deduped against the accumulated content-hash INDEX
  // (here: the ¾ of the corpus standing in for prior runs), never
  // against the historical corpus itself. Within-batch keep-first (min
  // doc_id per hash) composes with an anti-join on the index. At scale
  // the index is a table bucketed by content_hash, so only the (small)
  // batch shuffles — the corpus is read zero times per increment; the
  // full-corpus hash here exists only because the test lake has no
  // persisted index table. ──
  private def q53(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val index = d.filter(col("doc_id") % 4 =!= 0)
      .select(sha2(col("text"), 256).as("content_hash")).distinct()
    val batchFirst = d.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .groupBy("content_hash").agg(min("doc_id").as("doc_id"))
    batchFirst.join(index, Seq("content_hash"), "left_anti")
      .select(col("doc_id"), col("content_hash"))
      .orderBy("doc_id")
  }

  private val q53Sql =
    """WITH index_hashes AS (
      |  SELECT DISTINCT sha256(text) AS content_hash
      |  FROM documents WHERE doc_id % 4 != 0),
      |batch_first AS (
      |  SELECT sha256(text) AS content_hash, MIN(doc_id) AS doc_id
      |  FROM documents WHERE doc_id % 4 = 0 GROUP BY 1)
      |SELECT b.doc_id, b.content_hash
      |FROM batch_first b
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM index_hashes i WHERE i.content_hash = b.content_hash)
      |ORDER BY doc_id""".stripMargin

  // ── q54: IVF-Flat ANN — the inverted-file scale path next to q25's
  // sign-LSH: k deterministic seed centroids (production: k-means — the
  // Lloyd step is the same assign pass), zero-shuffle nearest-centroid
  // assignment, probes search only their nprobe nearest clusters, exact
  // cosine re-rank. Centroids = the first K corpus vectors so both
  // engines rebuild the identical index; the cosine kernel is the
  // bit-identical left-to-right accumulation shared with q24/q25. Scale
  // rationale in operators/IvfFlat.scala. ──
  private val IvfK = 16
  private[graft] val IvfNprobe = 2
  private[graft] val IvfTopK = 10

  private def q54(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // the corpus-side assignment consumes the model AS A TABLE (the
    // distributed-model path — centroids never become plan literals for
    // the 100 TB side); only the P×k probe ranking below uses
    // driver-held centers (P and k both model-sized)
    val centTable = e.filter(col("vec_id") < IvfK)
      .select((col("vec_id") + 1).cast("int").as("cent_id"),
        col("embedding").as("cvec"))
    val centroids: Seq[Array[Float]] = e.filter(col("vec_id") < IvfK)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray).toSeq
    val assigned = IvfFlat.assignByTable(embParallel(spark, dir)
      .select(col("vec_id"), col("embedding")), centTable)
    val probes = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    IvfFlat.probe(assigned, probes, centroids, nprobe = IvfNprobe, k = IvfTopK)
      .orderBy("probe_id", "rk")
  }

  private val q54Sql =
    s"""WITH cents AS (
      |  SELECT CAST(vec_id + 1 AS INTEGER) AS cent_id, embedding
      |  FROM embeddings WHERE vec_id < $IvfK),
      |asg AS (
      |  SELECT e.vec_id, c.cent_id,
      |    ${cosineSql("e", "c")} AS cos
      |  FROM embeddings e CROSS JOIN cents c),
      |assigned AS (
      |  SELECT vec_id, cent_id AS cluster FROM asg
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) = 1),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding
      |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
      |pc AS (
      |  SELECT p.probe_id, c.cent_id,
      |    ${cosineSql("p", "c")} AS pc_cos
      |  FROM probes p CROSS JOIN cents c),
      |probed AS (
      |  SELECT probe_id, cent_id FROM pc
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY pc_cos DESC, cent_id) <= $IvfNprobe),
      |cand AS (
      |  SELECT pr.probe_id, a.vec_id AS cand_id, a.cluster
      |  FROM probed pr JOIN assigned a ON a.cluster = pr.cent_id
      |  WHERE a.vec_id != pr.probe_id),
      |scored AS (
      |  SELECT c.probe_id, c.cand_id, c.cluster,
      |    ${cosineSql("pe", "ce")} AS cosine
      |  FROM cand c
      |  JOIN embeddings pe ON c.probe_id = pe.vec_id
      |  JOIN embeddings ce ON c.cand_id = ce.vec_id)
      |SELECT probe_id, cand_id, cluster, cosine, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      |            ORDER BY cosine DESC, cand_id) AS rk
      |  FROM scored)
      |WHERE rk <= $IvfTopK ORDER BY probe_id, rk""".stripMargin

  // ── q55: repetition-based quality filtering (Gopher-style "fraction of
  // tokens in the most common n-gram" / duplicate-n-gram rules, DeepMind
  // Gopher §A.1.1 analogs) — per-doc bigram stats → keep/flag/drop
  // verdict → per-source distribution. All comparisons are INTEGER
  // cross-multiplications (top_bg*15 > n_bg ⇔ top-bigram fraction >
  // 1/15), so there is no float boundary to disagree across engines;
  // thresholds are calibrated to the synthetic corpus (30-word
  // vocabulary inflates repetition vs natural text, where Gopher's
  // published 0.18/0.2 cuts apply). Docs too short to have bigrams are
  // dropped outright. Scale: explode → two-level groupBy partitioned by
  // doc, then a doc-keyed join — linear, skew-free (bigram counts are
  // per-doc, never global). ──
  private def q55(spark: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(spark, dir)
    val per = d.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).as("n_tok"))
    val bgStats = d
      .select(col("doc_id"), explode(graft.functions.WordBigrams(col("text"))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max("c").as("top_bg"), sum("c").as("n_bg"),
        count(lit(1)).as("n_distinct_bg"))
    val verdict = when(col("n_bg").isNull, "drop")
      .when(col("top_bg") * 15 > col("n_bg"), "drop")
      .when((col("n_bg") - col("n_distinct_bg")) * 20 > col("n_bg"), "flag")
      .otherwise("keep")
    per.join(bgStats, Seq("doc_id"), "left")
      .withColumn("verdict", verdict)
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tok"),
        min("doc_id").as("first_doc"))
      .orderBy("source", "verdict")
  }

  private val q55Sql =
    """WITH toks AS (
      |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
      |    string_split(text, ' ') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM toks),
      |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bgs AS (
      |  SELECT doc_id, MAX(c) AS top_bg, CAST(SUM(c) AS BIGINT) AS n_bg,
      |    COUNT(*) AS n_distinct_bg
      |  FROM bgc GROUP BY 1),
      |verdicts AS (
      |  SELECT t.source, t.n_tok, t.doc_id,
      |    CASE WHEN b.n_bg IS NULL THEN 'drop'
      |         WHEN b.top_bg * 15 > b.n_bg THEN 'drop'
      |         WHEN (b.n_bg - b.n_distinct_bg) * 20 > b.n_bg THEN 'flag'
      |         ELSE 'keep' END AS verdict
      |  FROM toks t LEFT JOIN bgs b ON t.doc_id = b.doc_id)
      |SELECT source, verdict, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tok,
      |  MIN(doc_id) AS first_doc
      |FROM verdicts GROUP BY 1, 2 ORDER BY source, verdict""".stripMargin

  // ── q56: cross-document boilerplate spans (RefinedWeb/CCNet-style) —
  // 8-gram spans appearing in ≥2 documents mark shared/templated text;
  // per-doc shared-span counts feed an is_boilerplate verdict (half or
  // more of the doc's spans shared — integer cross-multiplication, no
  // float boundary). Complements q49's whole-doc near-dup clustering:
  // this finds PARTIAL overlap (headers, footers, templates) that
  // doc-level MinHash under-weighs. Scale: explode distinct 8-grams
  // (codegen'd word_ngrams kernel) → groupBy(gram) doc-frequency —
  // linear, one shuffle keyed by gram; a mega-frequent span only
  // aggregates (map-side partials), it never fans out into pairs. ──
  private[graft] val SpanN = 8

  /** Spark-side distinct SpanN-gram set of `text` — shared by the
    * boilerplate (q56), decontamination (q57) and funnel (q75) stages;
    * [[ngramListSql]] is its oracle mirror over pre-split tokens `t`. */
  private def spanGrams: Column =
    array_distinct(graft.functions.WordNgrams(col("text"), SpanN))

  private val ngramListSql: String = {
    val gramExpr = (0 until SpanN).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len(t) - ${SpanN - 2}), i -> $gramExpr))"
  }

  private def q56(spark: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(spark, dir)
    val ex = d.select(col("doc_id"), explode(spanGrams).as("g"))
    val shared = ex.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("g")
    val perDoc = ex.join(shared, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val grams = d.select(col("doc_id"), size(spanGrams).as("n_grams"))
    grams.join(perDoc, Seq("doc_id"))
      .withColumn("is_boilerplate", col("n_shared") * 2 >= col("n_grams"))
      .select("doc_id", "n_grams", "n_shared", "is_boilerplate")
      .orderBy("doc_id")
  }

  private val q56Sql = {
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, unnest($ngramListSql) AS g FROM toks),
      |shared AS (SELECT g FROM g GROUP BY g HAVING COUNT(*) >= 2),
      |per_doc AS (
      |  SELECT doc_id, COUNT(*) AS n_shared FROM g
      |  WHERE g IN (SELECT g FROM shared) GROUP BY 1),
      |grams AS (
      |  SELECT doc_id, CAST(len($ngramListSql) AS INTEGER) AS n_grams
      |  FROM toks)
      |SELECT gr.doc_id, gr.n_grams, p.n_shared,
      |  p.n_shared * 2 >= gr.n_grams AS is_boilerplate
      |FROM grams gr JOIN per_doc p ON gr.doc_id = p.doc_id
      |ORDER BY gr.doc_id""".stripMargin
  }

  // ── q57: benchmark decontamination — the eval-overlap scrub every
  // training pipeline runs before a model sees the data (GPT-3 §C /
  // PaLM-style 8-gram collision test): any train document sharing an
  // 8-gram span with the held-out eval slice is flagged, with the hit
  // count as evidence. Eval slice = deterministic doc_id % 10 == 7 (a
  // stand-in for the real benchmark suite). Scale: the eval side is
  // tiny by construction (benchmarks are MBs, corpora are TBs), so its
  // distinct-gram set BROADCASTS and the train side never shuffles —
  // one explode + broadcast-hash-join + per-doc count, linear in the
  // corpus with zero exchange on the 100 TB side. ──
  private def q57(spark: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(spark, dir)
    val grams = d.select(col("doc_id"), col("source"), explode(spanGrams).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 10 === 7)
      .select("g").distinct()
    grams.filter(col("doc_id") % 10 =!= 7)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_hit_grams"))
      .orderBy("doc_id")
      .limit(100)
  }

  private val q57Sql = {
    s"""WITH g AS (
      |  SELECT doc_id, source, unnest($ngramListSql) AS g
      |  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)),
      |eval_grams AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 7)
      |SELECT doc_id, source, COUNT(*) AS n_hit_grams
      |FROM g WHERE doc_id % 10 != 7 AND g IN (SELECT g FROM eval_grams)
      |GROUP BY 1, 2 ORDER BY doc_id LIMIT 100""".stripMargin
  }

  // ── q58: sequence packing — GPT-style concat-and-split: within each
  // source shard, documents are laid end-to-end in doc_id order and cut
  // into fixed SeqCap-token training sequences; a doc starting in one
  // sequence may spill into the next (boundary crossers are what
  // attention-mask-aware packers try to minimize). Per-source layout
  // stats: sequences produced, docs crossing a boundary. All integer
  // arithmetic (offsets via running sum, seq ids via integer div) — no
  // float boundary. Scale: packing is per-shard BY DESIGN (a global
  // concat order is meaningless and unscalable); offsets come from
  // [[packedOffsets]], whose doc census swaps the per-source window for
  // the bucketed two-pass plan past PackWindowMaxDocs — no single task
  // ever prefix-sums a whole shard at corpus grain. ──
  private[graft] val SeqCap = 512

  /** Doc-count line above which [[packedOffsets]] swaps the per-source
    * running-sum window for the bucketed two-pass plan (the q156/q169
    * selectable-fallback convention). Generous for local[32]; a cluster
    * deployment tunes it to what one task prefix-sums comfortably. */
  private[graft] val PackWindowMaxDocs = 100000L
  /** Bucket budget of the two-pass plan — bounds the base-offset census
    * at sources × (PackBuckets+1) rows regardless of corpus size. */
  private val PackBuckets = 4096L

  /** Doc-count cap per (source, bucket) of the two-pass plan: no
    * within-bucket running sum may see more rows than the larger of
    * the window line and ~2× the perfectly-balanced bucket mass.
    * RELATIVE, not absolute, past the window line: at 10^11 docs even
    * a full PackBuckets split leaves > PackWindowMaxDocs docs per
    * bucket, so the invariant the plan can actually hold is "no
    * bucket worse than ~2× balanced" — which also bounds the
    * refinement census at O(PackBuckets) non-empty overfull buckets
    * per round (each holds > cap > 2·total/PackBuckets docs, so at
    * most PackBuckets/2 of them exist). */
  private[graft] def packBucketCap(totalDocs: Long): Long =
    math.max(PackWindowMaxDocs, 2L * (totalDocs / PackBuckets + 1L))

  /** Equi-depth doc_id bucketing for the two-pass plan: fixed-width
    * bins from a 2-scalar extent census, then any bucket whose CENSUS
    * count exceeds the cap is recursively re-split inside its own
    * observed [min, max] id range (the dsirSelect refinement pattern —
    * r15 VERDICT #1: fixed-width bins alone degrade to one
    * corpus-sized bucket when most ids crowd a narrow range).
    * Bucket id = the bucket's LOWER EDGE in doc_id value space — a
    * single long that stays monotone in doc_id across refinement
    * rounds (sub-bucket edges lie inside the parent's disjoint range),
    * so ordering by bucket is always ordering by doc range. The
    * re-split factor is min(PackBuckets, 2·cnt/cap) — just enough bins
    * to reach the cap if the bucket's ids are roughly uniform, so the
    * census stays bounded while fractal skew resolves over log rounds
    * (each round at least halves a split bucket's range; width 1 =
    * only equal-id ties remain, which no value-based bucketing can
    * separate — the disclosed floor). NULL doc_id rows form their own
    * unsplittable census group, ordered FIRST (nulls-first) exactly
    * where the window plan's doc order puts them.
    * Returns the bucketed rows plus the final driver-side census
    * (source, __bkt, count, token sum, min/max id) — bucket-grain and
    * bounded by construction, the one collect this plan performs. */
  private[graft] def packBuckets(pd: DataFrame, capOverride: Option[Long])
      : (DataFrame, Seq[Row]) = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val sess = pd.sparkSession
    val ext = pd.agg(min("doc_id").as("lo"), max("doc_id").as("hi")).head
    val (lo, hi) =
      if (ext.isNullAt(0)) (0L, 0L) else (ext.getLong(0), ext.getLong(1))
    val width = math.max((hi - lo) / PackBuckets + 1, 1L)
    var withB = pd.withColumn("__bkt",
      expr(s"${lo}L + ((doc_id - ${lo}L) div ${width}L) * ${width}L"))
    def censusOf(df: DataFrame): Seq[Row] = df.groupBy("source", "__bkt")
      .agg(count(lit(1)).as("__cnt"), sum("n_tok").as("__btok"),
        min("doc_id").as("__mn"), max("doc_id").as("__mx"))
      .collect().toSeq
    var census = censusOf(withB)
    val cap = capOverride
      .getOrElse(packBucketCap(census.map(_.getLong(2)).sum))
    def splittable(rs: Seq[Row]): Seq[Row] = rs.filter(r =>
      !r.isNullAt(1) && r.getLong(2) > cap && r.getLong(4) < r.getLong(5))
    val refSchema = StructType(Seq(
      StructField("__rsrc", pd.schema("source").dataType, nullable = true),
      StructField("__rb", LongType, nullable = false),
      StructField("__rlo", LongType, nullable = false),
      StructField("__rw", LongType, nullable = false)))
    var over = splittable(census)
    var rounds = 0
    while (over.nonEmpty && rounds < 64) {
      val refRows = over.map { r =>
        val (cnt, mn, mx) = (r.getLong(2), r.getLong(4), r.getLong(5))
        val subK = math.min(PackBuckets, math.max(2L, 2L * cnt / cap))
        Row(r.get(0), r.getLong(1), mn, (mx - mn) / subK + 1L)
      }
      val refDF = sess.createDataFrame(refRows.asJava, refSchema)
      withB = withB.join(broadcast(refDF),
          withB("source") <=> refDF("__rsrc") && withB("__bkt") === refDF("__rb"),
          "left")
        .withColumn("__bkt", when(col("__rw").isNotNull,
          expr("__rlo + ((doc_id - __rlo) div __rw) * __rw"))
          .otherwise(col("__bkt")))
        .drop("__rsrc", "__rb", "__rlo", "__rw")
      census = censusOf(withB)
      over = splittable(census)
      rounds += 1
    }
    (withB, census)
  }

  /** Packing start offsets: per (source, doc_id-ordered) running token
    * sum minus the row's own tokens — the layout rule every packing
    * consumer (q58/q68 whitespace grain, q180 trained-tokenizer grain)
    * shares. Two plans behind the doc-count census (`force` pins one
    * for tests, which pin offset equality through BOTH; the input is
    * checkpointed BEFORE the census so plan selection never re-derives
    * the corpus — r15 ADVICE: the census used to count the raw input,
    * re-tokenizing q68's whole corpus just to pick a plan):
    *   - `window` (≤ [[PackWindowMaxDocs]]): one running-sum window per
    *     source — fine while a single task can prefix-sum a shard.
    *   - `twopass` (the 100 TB plan): equi-depth doc_id buckets via
    *     [[packBuckets]] (fixed-width bins + recursive re-split of any
    *     bucket over the [[packBucketCap]] line, monotone in doc_id so
    *     bucket order IS doc order), per-(source, bucket) census token
    *     sums → cumulative BASE offsets computed driver-side over that
    *     bounded census and broadcast back, then a running sum WITHIN
    *     each (source, bucket) — every window input is bounded by the
    *     cap BY CONSTRUCTION (not by a dense-id assumption), down to
    *     the equal-id-tie floor no value bucketing can split.
    *     Offsets are identical to the window plan's by construction
    *     (integer sums regrouped associatively; NULL token counts skip
    *     both plans' sums the same way). Both plans break (source,
    *     doc_id) ORDER TIES by n_tok ascending (r15 ADVICE: a
    *     rows-frame running sum over a nondeterministic tie order made
    *     per-row offsets plan-dependent); rows identical in all three
    *     columns remain interchangeable — their offset MULTISET is
    *     order-invariant, so the equality claim is unconditional. */
  private[graft] def packedOffsets(perDoc: DataFrame,
                                   force: Option[String] = None,
                                   bucketCap: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(force.forall(Set("window", "twopass")),
      s"packed_offsets: force must be window|twopass, got $force")
    // checkpoint once for census + chosen plan; a FORCED plan skips the
    // census, and the forced window plan is single-pass, so only the
    // paths with >1 consumer pay the materialization
    val (pd, useWindow) = force match {
      case Some(f) =>
        (if (f == "twopass") perDoc.localCheckpoint(false) else perDoc,
          f == "window")
      case None =>
        val cp = perDoc.localCheckpoint(false)
        (cp, cp.count() <= PackWindowMaxDocs)
    }
    val shardW = Window.partitionBy("source")
      .orderBy(col("doc_id"), col("n_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if (useWindow)
      pd.withColumn("start_off", sum("n_tok").over(shardW) - col("n_tok"))
    else if (pd.agg(min("doc_id")).head.isNullAt(0))
      // every doc_id NULL: no extent to bucket by — one degenerate
      // "bucket" IS the corpus, so the window plan's shape is the
      // only shape; fall back to it rather than invent offsets
      pd.withColumn("start_off", sum("n_tok").over(shardW) - col("n_tok"))
    else {
      val (withB, census) = packBuckets(pd, bucketCap)
      // base offsets: a per-source cumulative token sum over the final
      // census — the census already sits on the driver (bucket-grain,
      // bounded), so the cumsum is driver arithmetic broadcast back,
      // not another window
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      import scala.jdk.CollectionConverters._
      val baseRows = census.groupBy(_.get(0)).toSeq.flatMap { case (_, rs) =>
        val ordered = rs.sortBy(r =>
          (if (r.isNullAt(1)) 0 else 1, if (r.isNullAt(1)) 0L else r.getLong(1)))
        var acc = 0L
        ordered.map { r =>
          val row = Row(r.get(0),
            if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
            acc)
          acc += (if (r.isNullAt(3)) 0L else r.getLong(3))
          row
        }
      }
      val baseSchema = StructType(Seq(
        StructField("__bsrc", pd.schema("source").dataType, nullable = true),
        StructField("__bb", LongType, nullable = true),
        StructField("__base", LongType, nullable = false)))
      val base = pd.sparkSession.createDataFrame(baseRows.asJava, baseSchema)
      val wIn = Window.partitionBy("source", "__bkt")
        .orderBy(col("doc_id"), col("n_tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // null-SAFE keys: the window plan keeps NULL-source / NULL-id
      // rows (they form window partitions like any value), so the
      // join back must too — a plain === would silently drop every
      // such group past the census line
      withB.join(broadcast(base),
          withB("source") <=> base("__bsrc") && withB("__bkt") <=> base("__bb"))
        .withColumn("start_off",
          col("__base") + sum("n_tok").over(wIn) - col("n_tok"))
        .drop("__bkt", "__bsrc", "__bb", "__base")
    }
  }

  private def q58(spark: SparkSession, dir: String): DataFrame = {
    val d = packedOffsets(Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok")))
    d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tok"),
        (max(expr(s"(start_off + n_tok - 1) div $SeqCap")) + 1).as("n_seqs"),
        sum(when(expr(s"(start_off + n_tok - 1) div $SeqCap > start_off div $SeqCap"),
          1L).otherwise(0L)).as("n_crossing"))
      .orderBy("source")
  }

  private val q58Sql =
    s"""WITH laid AS (
      |  SELECT source, doc_id, n_tok,
      |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_off
      |  FROM (SELECT source, doc_id,
      |          len(string_split(text, ' ')) AS n_tok FROM documents))
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tok,
      |  MAX((start_off + n_tok - 1) // $SeqCap) + 1 AS n_seqs,
      |  CAST(SUM(CASE WHEN (start_off + n_tok - 1) // $SeqCap
      |                     > start_off // $SeqCap THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_crossing
      |FROM laid GROUP BY source ORDER BY source""".stripMargin

  // ── q59: domain mixing — per-source reweighting to hit a target data
  // mixture (the Pile/LLaMA-style "sampling proportions" table): each
  // source gets a deterministic keep-rate (25/50/75/100% by source
  // index mod 4, standing in for a curated mixture spec) applied via
  // KEY-HASHED sampling — md5("source:doc_id") first hex digit against
  // a threshold char — so the same rows are kept on every run, every
  // engine, any partitioning, and re-runs of the pipeline are
  // reproducible (seeded RNG sampling is neither engine- nor
  // partitioning-stable). Scale: a stateless per-row filter fused into
  // the scan — zero shuffles before the per-source rollup. ──
  private def q59(spark: SparkSession, dir: String): DataFrame = {
    val srcIdx = regexp_replace(col("source"), "^src", "").cast("int")
    val thresholdChar = element_at(array(lit("4"), lit("8"), lit("c"), lit("g")),
      (srcIdx % 4) + 1)
    val kept = substring(md5(concat_ws(":", col("source"),
      col("doc_id").cast("string"))), 1, 1) < thresholdChar
    Tables.documents(spark, dir)
      .withColumn("target_pct", ((srcIdx % 4 + 1) * 25).cast("int"))
      .withColumn("is_kept", kept)
      .groupBy("source", "target_pct").agg(
        count(lit(1)).as("n_total"),
        sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("is_kept"), col("doc_id"))).as("first_kept_doc"))
      .orderBy("source")
  }

  private val q59Sql =
    """WITH tagged AS (
      |  SELECT source, doc_id,
      |    CAST((CAST(regexp_replace(source, '^src', '') AS INTEGER) % 4 + 1) * 25
      |      AS INTEGER) AS target_pct,
      |    substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 1) <
      |      (['4', '8', 'c', 'g'])[CAST(regexp_replace(source, '^src', '') AS INTEGER) % 4 + 1]
      |      AS is_kept
      |  FROM documents)
      |SELECT source, target_pct, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  MIN(CASE WHEN is_kept THEN doc_id END) AS first_kept_doc
      |FROM tagged GROUP BY 1, 2 ORDER BY source""".stripMargin

  // ── q60: chunk-level exact dedup — the RefinedWeb/C4 "line dedup"
  // stage: any fixed-size span that repeats ANYWHERE in the corpus is
  // removed from every document except its first occurrence, and the
  // cleaned text is re-assembled. The corpus here is single-line, so the
  // dedup unit is a K-word chunk instead of a newline-delimited line —
  // same algorithm, same shuffle shape. Keeper = smallest (doc_id, pos),
  // encoded as one integer key so MIN picks it portably. Scale: explode
  // chunks → groupBy(md5) → join back is one shuffle pair, linear in
  // corpus size and partitioned by chunk hash — the exact shape RefinedWeb
  // ran at web scale; reconstruction is a per-doc sort of ≤ len/K spans. ──
  private val ChunkK = 16

  private def q60(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docsParallel(spark, dir)
    val occ = d
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(w) - 1) div $ChunkK), " +
          s"i -> array_join(slice(w, i * $ChunkK + 1, $ChunkK), ' '))")))
      .select(col("doc_id"), col("pos"), col("col").as("chunk"),
        md5(col("col")).as("h"))
    // Keeper = first (doc_id, pos) per hash via a windowed row_number —
    // a tuple comparison that cannot alias (an integer doc*C+pos
    // encoding silently collides once a doc exceeds C chunks), and both
    // window functions share ONE shuffle on h, so the chunk explode runs
    // exactly once (no freq-join back onto a recomputed lineage).
    val kept = col("n_occ") === 1 || col("rn") === 1
    occ
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("h")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(kept, 0L).otherwise(1L)).as("n_dup_chunks"),
        array_sort(collect_list(when(kept, struct(col("pos"), col("chunk")))))
          .as("spans"))
      .filter(col("n_dup_chunks") > 0)
      .withColumn("kept_text", when(size(col("spans")) === 0, lit(null))
        .otherwise(array_join(expr("transform(spans, x -> x.chunk)"), " ")))
      .select("doc_id", "n_chunks", "n_dup_chunks", "kept_text")
      .orderBy("doc_id")
      .limit(100)
  }

  private val q60Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ch AS (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(list_slice(w, i * $ChunkK + 1, i * $ChunkK + $ChunkK), ' ') AS chunk
      |  FROM (SELECT doc_id, w,
      |          unnest(range(0, (len(w) - 1) // $ChunkK + 1)) AS i FROM w)),
      |occ AS (SELECT doc_id, pos, chunk, md5(chunk) AS h FROM ch),
      |f AS (SELECT doc_id, pos, chunk,
      |        COUNT(*) OVER (PARTITION BY h) AS n_occ,
      |        ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      |      FROM occ),
      |j AS (SELECT doc_id, pos, chunk,
      |        (n_occ = 1 OR rn = 1) AS kept FROM f)
      |SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_chunks,
      |  string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE kept) AS kept_text
      |FROM j GROUP BY doc_id
      |HAVING SUM(CASE WHEN kept THEN 0 ELSE 1 END) > 0
      |ORDER BY doc_id LIMIT 100""".stripMargin

  // ── q61: temperature-based mixture weights — the UNIMAX/mT5 α=0.5
  // "temperature sampling" table: per-source token mass is raised to α so
  // small sources are up-weighted, then a fixed token budget is allocated
  // proportionally and expressed as epochs over each source. Float
  // discipline (see oracle notes): sqrt is IEEE-identical in both
  // engines, but the cross-source SUM is taken over FIXED-POINT weights
  // (floor(sqrt·1000) as BIGINT) so the reduction is exact integer math —
  // double summation order across partitions would not be reproducible.
  // Scale: one per-source agg (tiny output) + a scalar window — the
  // corpus-side pass is a single shuffle-free partial-agg scan. ──
  private[graft] val MixBudgetTok = 1000000L

  private def q61(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSrc = Tables.documents(spark, dir)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tok"))
      .withColumn("w_fp",
        floor(sqrt(col("n_tok").cast("double")) * 1000).cast("long"))
    perSrc
      .withColumn("share",
        col("w_fp").cast("double") / sum("w_fp").over(Window.partitionBy()).cast("double"))
      .withColumn("alloc_tok",
        floor(col("share") * lit(MixBudgetTok).cast("double")).cast("long"))
      .withColumn("epochs", col("alloc_tok").cast("double") / col("n_tok").cast("double"))
      .orderBy("source")
  }

  private val q61Sql =
    s"""WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      |  FROM documents GROUP BY 1),
      |w AS (SELECT *,
      |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000) AS BIGINT) AS w_fp FROM s),
      |t AS (SELECT *,
      |  CAST(w_fp AS DOUBLE) / CAST(SUM(w_fp) OVER () AS DOUBLE) AS share FROM w),
      |a AS (SELECT *,
      |  CAST(floor(share * $MixBudgetTok) AS BIGINT) AS alloc_tok FROM t)
      |SELECT source, n_docs, n_tok, w_fp, share, alloc_tok,
      |  CAST(alloc_tok AS DOUBLE) / CAST(n_tok AS DOUBLE) AS epochs
      |FROM a ORDER BY source""".stripMargin

  // ── q62: shard planner — deterministic doc→shard assignment for the
  // final training-data write, plus the balance audit an operator reads
  // before launching: per-shard doc/token mass and each shard's share of
  // the total. Shard id = first hex digit of md5(doc_id) (16 shards) —
  // key-hashed like q59, so assignment is stable across engines, runs
  // and partitionings, and a re-run appends to the SAME shards. Scale:
  // the assignment is a stateless per-row expression fused into the scan
  // (it IS the partitionBy key of the eventual writer); the audit is one
  // tiny 16-row agg. ──
  private def q62(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perShard = Tables.documents(spark, dir)
      .withColumn("shard", substring(md5(col("doc_id").cast("string")), 1, 1))
      .groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tok"))
    perShard
      .withColumn("tok_share",
        col("n_tok").cast("double") / sum("n_tok").over(Window.partitionBy()).cast("double"))
      .orderBy("shard")
  }

  private val q62Sql =
    """WITH s AS (
      |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
      |    COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      |  FROM documents GROUP BY 1)
      |SELECT shard, n_docs, n_tok,
      |  CAST(n_tok AS DOUBLE) / CAST(SUM(n_tok) OVER () AS DOUBLE) AS tok_share
      |FROM s ORDER BY shard""".stripMargin

  // ── q63: vocabulary coverage — tokenizer-prep statistics: the top-K
  // corpus words by frequency with each word's cumulative share of all
  // token occurrences (the "how much of the corpus does a K-word vocab
  // cover" curve that sizes a vocabulary). Rank ties break on the word
  // itself so the cumulative window is over a UNIQUE total order —
  // deterministic in both engines; cumulative sums are exact BIGINTs,
  // only the final share divides. Scale: explode → groupBy(word) is the
  // canonical word-count shuffle; the window runs on the top-K slice
  // only after a TakeOrdered. ──
  private def q63(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docsParallel(spark, dir)
    // materialized once (localCheckpoint, GC-scoped — see q21): both the
    // grand total and the top-K slice consume it, and without the cut
    // the full corpus word-count shuffle would run twice.
    val counts = d.select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_occ"))
      .localCheckpoint(false)
    val total = counts.agg(sum("n_occ").cast("long").as("t"))
    val top = counts.orderBy(col("n_occ").desc, col("word")).limit(50)
    val w = Window.orderBy(col("n_occ").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occ").desc, col("word"))))
      .withColumn("cum_occ", sum("n_occ").over(w))
      .withColumn("cum_share", col("cum_occ").cast("double") / col("t").cast("double"))
      .select("rank", "word", "n_occ", "cum_occ", "cum_share")
      .orderBy("rank")
  }

  private val q63Sql =
    """WITH c AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |counts AS (SELECT word, COUNT(*) AS n_occ FROM c GROUP BY 1),
      |top AS (SELECT word, n_occ FROM counts
      |        ORDER BY n_occ DESC, word LIMIT 50),
      |tot AS (SELECT CAST(SUM(n_occ) AS BIGINT) AS t FROM counts)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, word) AS INTEGER) AS rank,
      |  word, n_occ,
      |  CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, word
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_occ,
      |  CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, word
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(t AS DOUBLE) AS cum_share
      |FROM top, tot ORDER BY rank""".stripMargin

  // ── q64: semantic decontamination — the embedding-space analog of
  // q57's n-gram scrub: train vectors whose embedding is near-identical
  // (cosine ≥ 0.95) to any held-out eval vector are flagged as
  // contamination, found via cross-set sign-LSH (AnnLsh.candidatesAcross)
  // so the train side is bucketed in ONE linear pass and the tiny eval
  // bucket table broadcasts — never an all-pairs train×eval join. Like
  // q52, the random synthetic embeddings have no true near-dups (max
  // random cosine ≈0.51), so every 5th eval vector is planted back into
  // the train side as an exact copy at vec_id + max + 1 — identical sign
  // buckets in every table, cosine ≈1.0, far above the 0.95 threshold
  // while every random collision falls far below it. ──
  private val Q64CosMin = 0.95

  private def q64(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // single-row scalar read — the id-space bound, not data movement
    val offset = base.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    val evalV = base.filter(col("vec_id") % 10 === 7)
    val trainV = base.filter(col("vec_id") % 10 =!= 7)
      .unionByName(evalV.filter(col("vec_id") % 50 === 7)
        .select((col("vec_id") + lit(offset)).as("vec_id"), col("embedding")))
      .repartition(spark.sparkContext.defaultParallelism)
    AnnLsh.candidatesAcross(trainV, evalV,
        tables = AnnTables, bits = AnnBits, maxBucket = AnnMaxBucket)
      .join(trainV.select(col("vec_id").as("corpus_id"), col("embedding").as("cv")), "corpus_id")
      .join(evalV.select(col("vec_id").as("probe_id"), col("embedding").as("pv")), "probe_id")
      .withColumn("cosine", cosine(col("cv"), col("pv")))
      .filter(col("cosine") >= Q64CosMin)
      .select(col("corpus_id").as("train_id"), col("probe_id").as("eval_id"),
        col("n_tables"), col("cosine"))
      .orderBy("train_id", "eval_id")
  }

  private val q64Sql =
    s"""WITH eval_v AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 7),
      |train_v AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 != 7
      |  UNION ALL
      |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings), embedding
      |  FROM embeddings WHERE vec_id % 50 = 7),
      |keyed_c AS (
      |  ${annKeyedSql("train_v")}),
      |keyed_p AS (
      |  ${annKeyedSql("eval_v")}),
      |kept_c AS (
      |  SELECT * FROM keyed_c
      |  QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= $AnnMaxBucket),
      |xpairs AS (
      |  SELECT c.vec_id AS train_id, p.vec_id AS eval_id,
      |    COUNT(DISTINCT c.tbl) AS n_tables
      |  FROM kept_c c JOIN keyed_p p ON c.tbl = p.tbl AND c.bucket = p.bucket
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT x.train_id, x.eval_id, x.n_tables,
      |    ${cosineSql("ea", "eb")} AS cosine
      |  FROM xpairs x
      |  JOIN train_v ea ON x.train_id = ea.vec_id
      |  JOIN eval_v eb ON x.eval_id = eb.vec_id)
      |SELECT train_id, eval_id, n_tables, cosine FROM scored
      |WHERE cosine >= $Q64CosMin ORDER BY train_id, eval_id""".stripMargin

  // ── q65: snapshot diff — the between-crawls audit (SnapshotDiff
  // operator): which docs were added / removed / modified / unchanged
  // since the previous corpus version. The "previous" snapshot is
  // derived deterministically from the current one: docs with id ≡ 3
  // (mod 7) didn't exist yet (→ added), id ≡ 0 (mod 5) had different
  // text (→ modified, via an appended marker so the change is
  // length-independent), and planted ids at +max+1 for id ≡ 1 (mod 13)
  // existed then but not now (→ removed). ──
  private def q65(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val offset = d.agg(max("doc_id")).collect()(0).getLong(0) + 1L
    val v1 = d.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" old")))
          .otherwise(col("text")).as("text"))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + lit(offset)).as("doc_id"), col("text")))
    SnapshotDiff(v1, d)
      .groupBy("status").agg(
        count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy("status")
  }

  private val q65Sql =
    """WITH v2 AS (SELECT doc_id, text FROM documents),
      |v1 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' old' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 != 3
      |  UNION ALL
      |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), text
      |  FROM documents WHERE doc_id % 13 = 1),
      |j AS (
      |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |    CASE WHEN a.doc_id IS NULL THEN 'added'
      |         WHEN b.doc_id IS NULL THEN 'removed'
      |         WHEN sha256(a.text) IS DISTINCT FROM sha256(b.text) THEN 'modified'
      |         ELSE 'unchanged' END AS status
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT status, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
      |  MAX(doc_id) AS max_doc
      |FROM j GROUP BY 1 ORDER BY status""".stripMargin

  /** Integer distinct-token quality score (×1000, integral division — no
    * float boundary) shared by q66 keeper selection and q67 sampling:
    * the two stages must agree on what "quality" means, so there is one
    * definition. [[qualityScoreSql]] is its DuckDB mirror. */
  private[graft] val qualityScore: Column = expr(
    "cast(size(array_distinct(split(text, ' '))) as bigint) * 1000" +
      " div cast(size(split(text, ' ')) as bigint)")

  private val qualityScoreSql =
    """len(list_distinct(string_split(text, ' '))) * 1000
      |      // len(string_split(text, ' '))""".stripMargin

  // ── q66: quality-aware keeper selection — production near-dup policy:
  // within each duplicate cluster keep the HIGHEST-QUALITY copy, not the
  // smallest id (crawls re-collect the same page with varying cleanliness;
  // min-id keeps whichever arrived first). Clusters come from the same
  // LSH→components pipeline as q49; quality is an integer distinct-token
  // ratio (×1000, integral division — no float boundary), keeper = first
  // row of each cluster ordered (quality DESC, doc_id) — a unique total
  // order, so both engines pick identically. Scale: adds one broadcast-
  // sized window over cluster members to q49's shape — the expensive
  // stages (signatures, banding, contraction) are unchanged. ──
  private def q66(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = MinHashLsh.signatures(docsParallel(spark, dir)).localCheckpoint(false)
    val pairs = MinHashLsh.candidates(sigs, maxBucket = LshMaxBucket)
      .filter(col("n_sig_match") >= LshStrongMatch)
      .select("doc_a", "doc_b")
    val qual = Tables.documents(spark, dir)
      .select(col("doc_id"), qualityScore.as("quality"))
    ConnectedComponents(pairs, "doc_a", "doc_b")
      .join(qual, col("node") === col("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("comp").orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("comp").as("cluster_min"), col("doc_id").as("keeper_doc"),
        col("quality").as("keeper_quality"))
      .orderBy("cluster_min")
  }

  private val q66Sql =
    s"""WITH RECURSIVE $lshCandidateCtes,
      |pairs AS (SELECT doc_a, doc_b FROM cand WHERE n_sig_match >= $LshStrongMatch),
      |${ccClosureSql("pairs", "doc_a", "doc_b")},
      |qual AS (
      |  SELECT doc_id,
      |    $qualityScoreSql AS quality
      |  FROM documents)
      |SELECT comp AS cluster_min, doc_id AS keeper_doc,
      |  quality AS keeper_quality
      |FROM (
      |  SELECT c.comp, q.doc_id, q.quality,
      |    ROW_NUMBER() OVER (PARTITION BY c.comp
      |      ORDER BY q.quality DESC, q.doc_id) AS rn
      |  FROM comps c JOIN qual q ON c.node = q.doc_id)
      |WHERE rn = 1 ORDER BY cluster_min""".stripMargin

  // ── q67: quality-conditioned sampling — the curation step after
  // scoring: keep-rates depend on the quality tier (all of high, half of
  // mid, 1/8 of low — expressed in 16ths because the hash key is one hex
  // digit), applied with the same key-hashed determinism as q59 so the
  // same rows survive on every run/engine/partitioning. The salt "q67:"
  // decorrelates this filter's hash from q59's. Scale: stateless per-row
  // scoring + filter fused into the scan; one tiny per-tier rollup. ──
  private def q67(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      qualityScore.as("quality"))
      .withColumn("tier", when(col("quality") >= 600, "high")
        .when(col("quality") >= 400, "mid").otherwise("low"))
      .withColumn("rate_x16", when(col("tier") === "high", 16)
        .when(col("tier") === "mid", 8).otherwise(2))
      .withColumn("kept",
        substring(md5(concat(lit("q67:"), col("doc_id").cast("string"))), 1, 1) <
          when(col("tier") === "high", "g")
            .when(col("tier") === "mid", "8").otherwise("2"))
    scored.groupBy("tier", "rate_x16").agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum("n_tok").as("tok_total"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tok_kept"))
      .orderBy("tier")
  }

  private val q67Sql =
    s"""WITH f AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    $qualityScoreSql AS quality
      |  FROM documents),
      |t AS (
      |  SELECT *,
      |    CASE WHEN quality >= 600 THEN 'high'
      |         WHEN quality >= 400 THEN 'mid' ELSE 'low' END AS tier,
      |    CASE WHEN quality >= 600 THEN 16
      |         WHEN quality >= 400 THEN 8 ELSE 2 END AS rate_x16,
      |    substr(md5('q67:' || CAST(doc_id AS VARCHAR)), 1, 1) <
      |      CASE WHEN quality >= 600 THEN 'g'
      |           WHEN quality >= 400 THEN '8' ELSE '2' END AS kept
      |  FROM f)
      |SELECT tier, rate_x16, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(n_tok) AS BIGINT) AS tok_total,
      |  CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept
      |FROM t GROUP BY 1, 2 ORDER BY tier""".stripMargin

  // ── q68: materialized sequence packing — the WRITE side of q58's
  // layout stats: every token gets its global offset within the source
  // shard (doc start offset from the running sum + position in doc), is
  // assigned to sequence goff div cap, and each sequence is re-assembled
  // in offset order — the actual fixed-length training shards a trainer
  // reads. Integer-only assignment; reassembly sorts ≤ cap tokens per
  // group. Scale: one window keyed by source (same as q58) + one
  // explode + one groupBy(source, seq) shuffle — linear in token count,
  // partitioned by output sequence, which is exactly the final writer's
  // partitionBy key. ──
  private def q68(spark: SparkSession, dir: String): DataFrame = {
    // offsets via the shared selectable-plan layout rule (the token
    // array rides packedOffsets' pass-through)
    val off = packedOffsets(Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n_tok", size(col("t")).cast("long")))
    off.select(col("source"), col("doc_id"), col("start_off"),
        posexplode(col("t")))
      .withColumn("goff", col("start_off") + col("pos"))
      .withColumn("seq_id", expr(s"goff div $SeqCap"))
      .groupBy("source", "seq_id").agg(
        count(lit(1)).as("n_tok"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"),
        array_join(expr("transform(array_sort(collect_list(struct(goff, col))), x -> x.col)"),
          " ").as("seq_text"))
      .orderBy("source", "seq_id")
  }

  private val q68Sql =
    s"""WITH toks AS (
      |  SELECT source, doc_id, string_split(text, ' ') AS t FROM documents),
      |off AS (
      |  SELECT source, doc_id, t,
      |    CAST(SUM(len(t)) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - len(t) AS BIGINT) AS start_off
      |  FROM toks),
      |ex AS (
      |  SELECT source, doc_id, start_off + unnest(range(0, len(t))) AS goff,
      |    unnest(t) AS tok
      |  FROM off)
      |SELECT source, goff // $SeqCap AS seq_id, COUNT(*) AS n_tok,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      |  string_agg(tok, ' ' ORDER BY goff) AS seq_text
      |FROM ex GROUP BY 1, 2 ORDER BY source, seq_id""".stripMargin

  // ── q69: k-means refinement of the IVF coarse quantizer — the training
  // step q54 points at: 2 Lloyd iterations ([[IvfFlat.train]]) from the
  // same deterministic seeds, then a final assignment pass; output is the
  // per-cluster census (members, id range, fixed-point cosine mass) that
  // an index build would persist next to the centroids. Determinism
  // across engines AND partitionings comes from train()'s fixed-point
  // centroid accumulation (see IvfFlat.scala) and from argmax ties →
  // lowest centroid id. Scale: per iteration one zero-shuffle assignment
  // + one k×dim partial-aggregated rollup (model state to the driver,
  // MLlib k-means shape) — the corpus is scanned iters+1 times, never
  // shuffled. ──
  private val KmK = 4
  private val KmIters = 2

  /** The shared training recipe of q69 and q76: K seed rows collected as
    * model state (same as q54 — not data movement), then KmIters Lloyd
    * refinements over the spread corpus. Memoized per data directory
    * ([[FrozenModels]]): training is a pure function of the table and
    * the pinned seeds, so every consumer (q54/q64/q69/q76/q80/q151/
    * q153/q162) shares ONE training pass per process. */
  private[graft] def trainedCentroids(spark: SparkSession, dir: String): Seq[Array[Float]] =
    trainedCentroidsK(spark, dir, KmK)

  /** The same training recipe at caller-chosen quantizer size `k` (seed
    * rows vec_id < k, KmIters Lloyd refinements) — q177's nprobe Pareto
    * sweep needs a finer quantizer (k=16) than the q69/q76 family's
    * KmK=4 so nprobe has a range worth sweeping. Memoized per (k, dir):
    * the two models coexist in the cache under distinct prefixes. */
  private[graft] def trainedCentroidsK(spark: SparkSession, dir: String,
                                       k: Int): Seq[Array[Float]] =
    FrozenModels.memoGen(s"ivf-centroids-$k|$dir",
        FrozenModels.fingerprint(s"$dir/embeddings.parquet")) {
      val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val init: Seq[Array[Float]] = e.filter(col("vec_id") < k)
        .orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray).toSeq
      IvfFlat.train(embParallel(spark, dir).select(col("vec_id"), col("embedding")),
        init, iters = KmIters)
    }

  private def q69(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embParallel(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = trainedCentroids(spark, dir)
    // cosine to the assigned centroid = the max over all centroids (that
    // is what argmax assignment means), so no second model pass is needed
    val cosBest = greatest(cents.map(c => cosine(col("embedding"), typedLit(c))): _*)
    IvfFlat.assign(corpus, cents)
      .withColumn("cos", cosBest)
      .groupBy("cluster").agg(
        count(lit(1)).as("n_members"),
        min("vec_id").as("min_vec"),
        max("vec_id").as("max_vec"),
        // fixed-point so the sum is exact and order-independent
        sum(round(col("cos") * 1e6).cast("long")).as("cos_sum_e6"))
      .orderBy("cluster")
  }

  /** DuckDB cosine over two fully-qualified list refs (the `$a.embedding`
    * form in [[cosineSql]] generalized to arbitrary expressions). */
  private[queries] def cosExprSql(a: String, b: String): String =
    s"""list_aggregate(list_transform(range(1, len($a) + 1),
      |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')
      |    / (sqrt(list_aggregate(list_transform(range(1, len($a) + 1),
      |         i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), 'sum'))
      |       * sqrt(list_aggregate(list_transform(range(1, len($b) + 1),
      |           i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')))""".stripMargin

  /** One Lloyd assignment over centroid CTE `cents(cid, cv)`: argmax
    * cosine, ties → lowest cid — mirrors [[IvfFlat.assign]]'s
    * `array_position(…, greatest(…))`. */
  private def kmAssignSql(cents: String): String =
    s"""SELECT vec_id, embedding, cid, cos FROM (
      |    SELECT e.vec_id, e.embedding, c.cid,
      |      ${cosExprSql("e.embedding", "c.cv")} AS cos
      |    FROM embeddings e CROSS JOIN $cents c)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY cos DESC, cid) = 1""".stripMargin

  /** One Lloyd update from assignment CTE `asg`: per-(cluster, dim)
    * fixed-point mean, emptied clusters keep `prev`'s centroid — mirrors
    * [[IvfFlat.train]]'s accumulate step exactly. */
  private def kmUpdateSql(asg: String, prev: String): String =
    s"""SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
      |  FROM $prev p LEFT JOIN (
      |    SELECT cid, list(CAST((s / 1e6) / n AS FLOAT) ORDER BY pos) AS cv
      |    FROM (
      |      -- 1e6 (DOUBLE literal), not 1000000.0: DuckDB demotes a
      |      -- DECIMAL literal next to FLOAT to FLOAT arithmetic, which
      |      -- rounds differently from Spark's double math
      |      SELECT cid, z[2] AS pos,
      |        SUM(CAST(round(CAST(z[1] AS DOUBLE) * 1e6) AS BIGINT)) AS s, COUNT(*) AS n
      |      FROM (SELECT cid,
      |              unnest(list_zip(embedding, range(1, len(embedding) + 1))) AS z
      |            FROM $asg)
      |      GROUP BY 1, 2)
      |    GROUP BY cid) n ON p.cid = n.cid""".stripMargin

  /** The c0 → a3 training unroll (seeds, KmIters assign/update rounds,
    * final assignment) at quantizer size `k` — the assign/update CTEs
    * are k-agnostic, only the seed filter changes, so the q177 sweep's
    * k=16 unroll is the same recipe as the q69/q76 k=4 one. */
  private[queries] def kmTrainCtesSqlK(k: Int): String =
    s"""c0 AS (
      |  SELECT CAST(vec_id + 1 AS INT) AS cid, embedding AS cv
      |  FROM embeddings WHERE vec_id < $k),
      |a1 AS (
      |  ${kmAssignSql("c0")}),
      |c1 AS (
      |  ${kmUpdateSql("a1", "c0")}),
      |a2 AS (
      |  ${kmAssignSql("c1")}),
      |c2 AS (
      |  ${kmUpdateSql("a2", "c1")}),
      |a3 AS (
      |  ${kmAssignSql("c2")})""".stripMargin

  /** The KmK-sized unroll shared by q69 and q76 — one recipe, two gates. */
  private[queries] val kmTrainCtesSql: String = kmTrainCtesSqlK(KmK)

  private val q69Sql =
    s"""WITH $kmTrainCtesSql
      |SELECT CAST(cid AS INT) AS cluster, COUNT(*) AS n_members,
      |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec,
      |  CAST(SUM(CAST(round(cos * 1e6) AS BIGINT)) AS BIGINT) AS cos_sum_e6
      |FROM a3 GROUP BY 1 ORDER BY cluster""".stripMargin

  // ── q76: IVF search over the TRAINED quantizer — the production
  // composition of q69 (training) and q54 (probing): centroids refined
  // by two Lloyd iterations, corpus re-assigned, probes search their
  // nprobe nearest refined clusters with exact-cosine re-rank. The
  // oracle replays the training unroll then the probe ranking, so a
  // drift anywhere in train→assign→probe breaks the gate. Scale is
  // q54's (zero-shuffle assignment, partition-pruned probe) plus
  // q69's training passes. ──
  private def q76(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val corpus = embParallel(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = trainedCentroids(spark, dir)
    // the trained model round-trips through a TABLE, and BOTH sides of
    // the index lifecycle consume it from there: corpus assignment
    // (assignByTable) and probe ranking (probeByTable) — the shape a
    // persisted-at-rest, versioned quantizer has (q54's rationale); no
    // plan node ever embeds the k×dim literals
    val centTable = cents.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toDF("cent_id", "cvec")
    val probes = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    IvfFlat.probeByTable(IvfFlat.assignByTable(corpus, centTable), probes,
        centTable, nprobe = IvfNprobe, k = IvfTopK)
      .orderBy("probe_id", "rk")
  }

  private val q76Sql =
    s"""WITH $kmTrainCtesSql,
      |assigned AS (SELECT vec_id, cid AS cluster FROM a3),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding
      |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
      |pc AS (
      |  SELECT p.probe_id, c.cid,
      |    ${cosExprSql("p.embedding", "c.cv")} AS pc_cos
      |  FROM probes p CROSS JOIN c2 c),
      |probed AS (
      |  SELECT probe_id, cid FROM pc
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY pc_cos DESC, cid) <= $IvfNprobe),
      |cand AS (
      |  SELECT pr.probe_id, a.vec_id AS cand_id, a.cluster
      |  FROM probed pr JOIN assigned a ON a.cluster = pr.cid
      |  WHERE a.vec_id != pr.probe_id),
      |scored AS (
      |  SELECT c.probe_id, c.cand_id, c.cluster,
      |    ${cosExprSql("pe.embedding", "ce.embedding")} AS cosine
      |  FROM cand c
      |  JOIN embeddings pe ON c.probe_id = pe.vec_id
      |  JOIN embeddings ce ON c.cand_id = ce.vec_id)
      |SELECT probe_id, cand_id, cluster, cosine, CAST(rk AS INT) AS rk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      |            ORDER BY cosine DESC, cand_id) AS rk
      |  FROM scored)
      |WHERE rk <= $IvfTopK ORDER BY probe_id, rk""".stripMargin

  // ── q70: int8 scalar quantization — the storage path for embeddings at
  // 100 TB (4 bytes → 1 byte/dim): per-vector symmetric scale
  // maxabs/127, per-vector relative reconstruction error
  // ‖v − dequant(quant(v))‖/‖v‖, rolled up per label. All per-row math is
  // left-to-right double folds (bit-identical in both engines); the
  // cross-row rollup carries the error as an exact fixed-point integer so
  // partitioning/row order can't move the sum. Scale: stateless map +
  // one partial-aggregated groupBy — fused into the scan. ──
  private def q70(spark: SparkSession, dir: String): DataFrame = {
    val diff = "cast(x as double) - round(cast(x as double) / scale) * scale"
    embParallel(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        expr("array_max(transform(embedding, x -> abs(cast(x as double)))) / 127.0")
          .as("scale"))
      .withColumn("rel_err",
        when(col("scale") === 0d, lit(0d)).otherwise(
          sqrt(expr(s"aggregate(embedding, cast(0 as double), (acc, x) -> acc + ($diff) * ($diff))")) /
            sqrt(expr("aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))"))))
      .groupBy("label").agg(
        count(lit(1)).as("n_vecs"),
        sum(round(col("rel_err") * 1e9).cast("long")).as("err_e9_sum"),
        max("rel_err").as("max_err"))
      .orderBy("label")
  }

  private val q70Sql = {
    val diff = "CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale"
    s"""WITH scaled AS (
      |  SELECT vec_id, label, embedding,
      |    list_aggregate(list_transform(embedding,
      |      x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale
      |  FROM embeddings),
      |err AS (
      |  SELECT label,
      |    CASE WHEN scale = 0 THEN 0.0 ELSE
      |      sqrt(list_aggregate(list_transform(embedding,
      |        x -> ($diff) * ($diff)), 'sum'))
      |      / sqrt(list_aggregate(list_transform(embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |    END AS rel_err
      |  FROM scaled)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(CAST(round(rel_err * 1e9) AS BIGINT)) AS BIGINT)
      |    AS err_e9_sum,
      |  MAX(rel_err) AS max_err
      |FROM err GROUP BY 1 ORDER BY label""".stripMargin
  }

  // ── q72: asymmetric containment dedup — the quote/expansion duplicate
  // class Jaccard misses: a short doc embedded verbatim in a longer one
  // has tiny |A∩B|/|A∪B| but containment |A∩B|/min(|A|,|B|) ≈ 1. Same
  // LSH-bounded candidate set and exact shingle intersection as q23 —
  // only the final ratio and threshold differ, so the 100 TB shape
  // (capped banded candidates, pruned corpus, two hash joins) is
  // identical. contained_doc names the smaller-set side (ties → doc_a,
  // the production "drop the fragment" policy). ──
  private val ContainMin = 0.5

  private def q72(spark: SparkSession, dir: String): DataFrame =
    shingleOverlap(spark, dir)
      .withColumn("containment", col("n_inter") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= ContainMin)
      .withColumn("contained_doc",
        when(col("n_a") <= col("n_b"), col("doc_a")).otherwise(col("doc_b")))
      .select("doc_a", "doc_b", "contained_doc", "n_inter", "containment")
      .orderBy("doc_a", "doc_b")
      .limit(200)

  private val q72Sql =
    s"""WITH $shingleOverlapCtes
      |SELECT i.doc_a, i.doc_b,
      |  CASE WHEN a.n_sg <= b.n_sg THEN i.doc_a ELSE i.doc_b END AS contained_doc,
      |  i.n_inter,
      |  i.n_inter / CAST(least(a.n_sg, b.n_sg) AS DOUBLE) AS containment
      |FROM inter i
      |JOIN sizes a ON i.doc_a = a.doc_id
      |JOIN sizes b ON i.doc_b = b.doc_id
      |WHERE i.n_inter / CAST(least(a.n_sg, b.n_sg) AS DOUBLE) >= $ContainMin
      |ORDER BY doc_a, doc_b LIMIT 200""".stripMargin

  // ── q73: incremental LSH index update — the daily-crawl path: a new
  // batch (doc_id ≡ 0 mod 4 stands in for today's crawl) is screened
  // against the EXISTING corpus's stored signatures without ever
  // re-pairing old-vs-old: new signatures probe the index's banded
  // buckets (new-old) plus one capped self-join within the batch
  // (new-new). At 100 TB this is the difference between re-LSHing the
  // whole corpus per day and touching |batch| + the collided index
  // slice; per-probe fan-out is bounded by bands × the index bucket cap.
  // In production idxSigs is a stored table — here it is derived so the
  // oracle can rebuild it. ──
  private def q73(spark: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(spark, dir)
    val newSigs = MinHashLsh.signatures(d.filter(col("doc_id") % 4 === 0))
      .localCheckpoint(false)
    val idxSigs = MinHashLsh.signatures(d.filter(col("doc_id") % 4 =!= 0))
    val acrossPairs = MinHashLsh
      .candidatesAcross(newSigs, idxSigs, maxBucket = LshMaxBucket)
      .select(col("probe_id").as("doc_a"), col("index_id").as("doc_b"),
        col("n_sig_match"), lit("new-old").as("pair_kind"))
    val withinBatch = MinHashLsh.candidates(newSigs, maxBucket = LshMaxBucket)
      .withColumn("pair_kind", lit("new-new"))
    acrossPairs.unionByName(withinBatch)
      .orderBy("pair_kind", "doc_a", "doc_b")
      .limit(300)
  }

  /** Banded-signature CTEs over the `documents` slice matching `pred` —
    * the per-side building block of q73's split-corpus oracle. */
  private def lshBandedSql(name: String, pred: String): String =
    s"""${name}_sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS sg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE $pred)),
      |${name}_sigs AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 1, 8)), 'min') AS mh1,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 9, 8)), 'min') AS mh2,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 17, 8)), 'min') AS mh3,
      |    list_aggregate(list_transform(sg, s -> substr(md5(s), 25, 8)), 'min') AS mh4
      |  FROM ${name}_sh WHERE len(sg) > 0),
      |${name}_banded AS (
      |  SELECT doc_id, mh1, mh2, mh3, mh4, 1 AS band, mh1 || mh2 AS bk FROM ${name}_sigs
      |  UNION ALL
      |  SELECT doc_id, mh1, mh2, mh3, mh4, 2 AS band, mh3 || mh4 AS bk FROM ${name}_sigs)""".stripMargin

  private val lshMatchSql =
    """(CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END
      |     + CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END
      |     + CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END
      |     + CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END)""".stripMargin

  private val q73Sql =
    s"""WITH ${lshBandedSql("nw", "doc_id % 4 = 0")},
      |${lshBandedSql("ix", "doc_id % 4 != 0")},
      |ix_kept AS (
      |  ${lshKeptSql("ix_banded")}),
      |nw_kept AS (
      |  ${lshKeptSql("nw_banded")}),
      |across AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    $lshMatchSql AS n_sig_match, 'new-old' AS pair_kind
      |  FROM nw_banded a JOIN ix_kept b ON a.band = b.band AND a.bk = b.bk),
      |within AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    $lshMatchSql AS n_sig_match, 'new-new' AS pair_kind
      |  FROM nw_kept a JOIN nw_kept b
      |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
      |SELECT * FROM (SELECT * FROM across UNION ALL SELECT * FROM within)
      |ORDER BY pair_kind, doc_a, doc_b LIMIT 300""".stripMargin

  // ── q74: deterministic corpus shuffle — the training-order write: a
  // global ORDER BY rand() is a full sort of the corpus AND
  // irreproducible; ordering by a salted per-doc hash gives the same
  // statistical decorrelation as a one-time random permutation while
  // being a pure function of the data. Physically: hash → shard prefix
  // (the writer's partitionBy key) + WITHIN-shard hash order, so the
  // "shuffle" is one hash partitioning plus per-shard local sorts —
  // no global exchange. Gated output: per-shard census + the first
  // three docs in shuffle order (proving the order itself, not just
  // the assignment). Salt "q74:" decorrelates from q45/q59/q62/q67. ──
  private def q74(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("q74:"), col("doc_id").cast("string")))
    val ranked = Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("hh"), substring(h, 1, 1).as("shard"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("shard").orderBy(col("hh"), col("doc_id"))))
    ranked.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        array_join(expr("transform(array_sort(collect_list(" +
          "CASE WHEN rn <= 3 THEN struct(rn, cast(doc_id AS string) AS d) END" +
          ")), x -> x.d)"), ",").as("head_docs"))
      .orderBy("shard")
  }

  private val q74Sql =
    """WITH r AS (
      |  SELECT doc_id, substr(hh, 1, 1) AS shard,
      |    ROW_NUMBER() OVER (PARTITION BY substr(hh, 1, 1)
      |      ORDER BY hh, doc_id) AS rn
      |  FROM (SELECT doc_id, md5('q74:' || CAST(doc_id AS VARCHAR)) AS hh
      |        FROM documents))
      |SELECT shard, COUNT(*) AS n_docs,
      |  string_agg(CASE WHEN rn <= 3 THEN CAST(doc_id AS VARCHAR) END,
      |    ',' ORDER BY rn) AS head_docs
      |FROM r GROUP BY 1 ORDER BY shard""".stripMargin

  // ── q75: curation funnel — the capstone composition: the whole
  // corpus-curation DAG (exact dedup → near-dup clusters → quality
  // filter → benchmark decontamination) in one pass with per-stage drop
  // accounting, the funnel report every training-data pipeline publishes
  // next to its final corpus. A doc is attributed to the FIRST stage
  // that drops it, so stage counts sum exactly to the corpus. Every
  // stage reuses the suite's machinery (q20's hash groups, q49's
  // components, q66/q67's quality score, q57's gram probe); the eval
  // slice (doc_id ≡ 7 mod 10) is the held-out side and not funneled.
  // Scale: the flags are one window + one LSH/CC pipeline + one
  // broadcast gram probe — each individually bounded as documented at
  // its home query; composition adds two left joins on doc_id. ──
  private def q75(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    funnelStages(spark, dir)
      .groupBy("stage").agg(
        count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy("stage")
  }

  /** Shared staged-funnel core (q75 totals, q107 per-source attribution):
    * every train-slice doc with its first-firing drop stage —
    * `(doc_id, source, n_tok, stage)`. */
  private[graft] def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    // ONE materialized base for the four consumers below (flags,
    // exact-dup keepers, near-dup signatures, contamination grams):
    // un-checkpointed, each consumer re-ran the scan AND the round-robin
    // spread exchange — the r16 steady-state census showed 4 corpus
    // scans behind 3 separate RoundRobin exchanges in this one query
    // the exact-dup hash rides IN the materialized base: keepers and
    // flags each referenced the sha2 expression, so every train row was
    // hashed twice per execution; hashed once here, both consumers read
    // the stored column (NULL text → sentinel, see the keeper note below)
    val d = docsParallel(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        coalesce(sha2(col("text"), 256), lit("__null_text__")).as("__h"))
      .localCheckpoint(false)
    val train = d.filter(col("doc_id") % 10 =!= 7)
    // exact-dup keeper via groupBy-and-join-back, NOT a window over
    // partitionBy(hash): the window form has no partial aggregation, so
    // a pathological mega-duplicate corpus would funnel every copy of
    // the hot text into ONE task's sort. The groupBy gets map-side
    // combine (each map task forwards one (hash, min) row per distinct
    // text) and the join back is an AQE-skew-splittable equi-join —
    // the 100 TB-safe shape. NULL text hashes to a sentinel (not a hex
    // string, collision-free) so the join keeps the window form's
    // "all NULLs share one keeper" semantics instead of null-key-dropping.
    val keepers = train.groupBy(col("__h")).agg(min("doc_id").as("__keeper"))
    val flags = train
      .join(keepers, Seq("__h"))
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        (col("doc_id") =!= col("__keeper")).as("ex_drop"),
        (qualityScore < 400).as("lowq"))
    // near-dup components over the train slice (q49's shape)
    val sigs = MinHashLsh.signatures(train).localCheckpoint(false)
    val comps = ConnectedComponents(
      MinHashLsh.candidates(sigs, maxBucket = LshMaxBucket)
        .filter(col("n_sig_match") >= LshStrongMatch).select("doc_a", "doc_b"),
      "doc_a", "doc_b")
    // contamination probe (q57's shape — tiny eval gram set broadcasts)
    val grams = d.select(col("doc_id"), explode(spanGrams).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 10 === 7).select("g").distinct()
    val contam = grams.filter(col("doc_id") % 10 =!= 7)
      .join(broadcast(evalGrams), Seq("g"))
      .select("doc_id").distinct().withColumn("ct", lit(true))
    flags
      .join(comps.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("ex_drop"), "1_exact_dup")
          .when(col("comp").isNotNull && col("comp") =!= col("doc_id"), "2_near_dup")
          .when(col("lowq"), "3_low_quality")
          .when(col("ct").isNotNull, "4_contaminated")
          .otherwise("5_kept"))
      .select("doc_id", "source", "n_tok", "stage")
  }

  // ── q107: curation funnel BY SOURCE — the sourcing report a data team
  // actually reads: q75's first-firing-stage attribution at (source,
  // stage) grain with doc AND token mass, so per-source survival and
  // where each source's losses concentrate (dup-heavy vs low-quality vs
  // contaminated) read straight off the result. Same machinery, one
  // extra grouping column — the per-doc stage assignment is computed
  // once and shared with q75. ──
  private def q107(spark: SparkSession, dir: String): DataFrame =
    funnelStages(spark, dir)
      .groupBy("source", "stage")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"))
      .orderBy("source", "stage")

  /** Oracle twin of [[funnelStages]] — CTEs ending in
    * `staged(doc_id, source, n_tok, stage)`, shared by q75 and q107. */
  private lazy val funnelStagedCtes =
    s"""${lshBandedSql("tr", "doc_id % 10 != 7")},
      |tr_kept AS (
      |  ${lshKeptSql("tr_banded")}),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM tr_kept a JOIN tr_kept b
      |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
      |  WHERE $lshMatchSql >= $LshStrongMatch),
      |${ccClosureSql("pairs", "doc_a", "doc_b")},
      |g AS (
      |  SELECT doc_id, unnest($ngramListSql) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |eval_grams AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 7),
      |contam AS (
      |  SELECT DISTINCT doc_id FROM g
      |  WHERE doc_id % 10 != 7 AND g IN (SELECT g FROM eval_grams)),
      |flags AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    doc_id != MIN(doc_id) OVER (PARTITION BY sha256(text)) AS ex_drop,
      |    ($qualityScoreSql) < 400 AS lowq
      |  FROM documents WHERE doc_id % 10 != 7),
      |staged AS (
      |  SELECT f.doc_id, f.source, f.n_tok,
      |    CASE WHEN f.ex_drop THEN '1_exact_dup'
      |         WHEN c.comp IS NOT NULL AND c.comp != f.doc_id THEN '2_near_dup'
      |         WHEN f.lowq THEN '3_low_quality'
      |         WHEN ct.doc_id IS NOT NULL THEN '4_contaminated'
      |         ELSE '5_kept' END AS stage
      |  FROM flags f
      |  LEFT JOIN comps c ON f.doc_id = c.node
      |  LEFT JOIN contam ct ON f.doc_id = ct.doc_id)""".stripMargin

  private lazy val q75Sql =
    s"""WITH RECURSIVE $funnelStagedCtes
      |SELECT stage, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
      |  MAX(doc_id) AS max_doc
      |FROM staged GROUP BY 1 ORDER BY stage""".stripMargin

  private lazy val q107Sql =
    s"""WITH RECURSIVE $funnelStagedCtes
      |SELECT source, stage, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tok
      |FROM staged GROUP BY 1, 2 ORDER BY source, stage""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q20_exact_dedup", q20, Some(q20Sql)),
    QueryDef("q21_minhash_lsh", q21, Some(q21Sql)),
    QueryDef("q22_simhash", q22, Some(q22Sql)),
    QueryDef("q23_ngram_jaccard", q23, Some(q23Sql)),
    QueryDef("q24_embedding_knn", q24, Some(q24Sql)),
    QueryDef("q25_embedding_lsh", q25, Some(q25Sql)),
    QueryDef("q26_lang_id", q26, Some(q26Sql)),
    QueryDef("q27_quality_score", q27, Some(q27Sql)),
    QueryDef("q28_token_count", q28, Some(q28Sql)),
    QueryDef("q29_fingerprint", q29, Some(q29Sql)),
    QueryDef("q44_pii_scrub", q44, Some(q44Sql)),
    QueryDef("q45_hash_sample", q45, Some(q45Sql)),
    QueryDef("q49_neardup_clusters", q49, Some(q49Sql)),
    QueryDef("q51_simhash_neardup", q51, Some(q51Sql)),
    QueryDef("q52_embedding_clusters", q52, Some(q52Sql)),
    QueryDef("q53_incremental_dedup", q53, Some(q53Sql)),
    QueryDef("q54_ivf_ann", q54, Some(q54Sql)),
    QueryDef("q55_doc_quality", q55, Some(q55Sql)),
    QueryDef("q56_boilerplate", q56, Some(q56Sql)),
    QueryDef("q57_decontaminate", q57, Some(q57Sql)),
    QueryDef("q58_seq_packing", q58, Some(q58Sql)),
    QueryDef("q59_domain_mix", q59, Some(q59Sql)),
    QueryDef("q60_chunk_dedup", q60, Some(q60Sql)),
    QueryDef("q61_temperature_mix", q61, Some(q61Sql)),
    QueryDef("q62_shard_plan", q62, Some(q62Sql)),
    QueryDef("q63_vocab_coverage", q63, Some(q63Sql)),
    QueryDef("q64_semantic_decontam", q64, Some(q64Sql)),
    QueryDef("q65_snapshot_diff", q65, Some(q65Sql)),
    QueryDef("q66_quality_keeper", q66, Some(q66Sql)),
    QueryDef("q67_quality_sample", q67, Some(q67Sql)),
    QueryDef("q68_packed_write", q68, Some(q68Sql)),
    QueryDef("q69_kmeans_train", q69, Some(q69Sql)),
    QueryDef("q70_embedding_quantize", q70, Some(q70Sql)),
    QueryDef("q72_containment_dedup", q72, Some(q72Sql)),
    QueryDef("q73_incremental_lsh", q73, Some(q73Sql)),
    QueryDef("q74_corpus_shuffle", q74, Some(q74Sql)),
    QueryDef("q75_curation_funnel", q75, Some(q75Sql)),
    QueryDef("q76_ivf_trained", q76, Some(q76Sql)),
    QueryDef("q107_funnel_by_source", q107, Some(q107Sql)))
}
