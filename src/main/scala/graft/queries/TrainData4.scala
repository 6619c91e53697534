package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.CosineSimilarity
import graft.operators.{IvfFlat, PqAdc}

/** Round-14 frontier queries.
  *
  * q177: the IVF nprobe↔recall PARETO SWEEP as a gated query — the
  * measurement an index operator actually reads before picking nprobe.
  * q80/q151/q153 certify recall at ONE operating point (nprobe=2 on the
  * 4-cluster quantizer, 38/50); this query trains a FINER quantizer
  * (k=16, same Lloyd recipe — [[TrainData.trainedCentroidsK]]) and
  * gates the whole curve: for each nprobe in {1,2,4,8,12}, the number
  * of candidates scanned (the probe cost an IVF index exists to bound)
  * and recall@10 against brute-force ground truth over the 5-probe set.
  *
  * Honesty note, mirrored in SCALE.md: the driver's synthetic
  * embeddings are near-uniform, so measured recall tracks the scanned
  * corpus fraction almost linearly (nprobe=8 of 16 ≈ half the corpus ≈
  * 0.7–0.76 recall) — cluster pruning cannot beat that on unclusterable
  * data. What the gate certifies is the MECHANISM and the MEASUREMENT:
  * the recall≥0.9 operating point (nprobe=12: 45–47/50 at every gated
  * SF) with its exact candidate cost, reproduced end-to-end by both
  * engines. On real (clustered) embeddings the same sweep finds the
  * knee at much smaller nprobe; the code path is identical.
  *
  * Scale design (q80's shape, swept): the corpus is assigned ONCE
  * (zero-shuffle codegen'd argmax against plan-literal centroids); the
  * candidate fetch happens ONCE at the widest sweep point (cr ≤ 12 —
  * one broadcast join of the (probe, cluster, rank) list against the
  * corpus, never re-fetched per nprobe); exact cosines are computed
  * once per candidate and each row then fans out row-locally to the
  * sweep points that include it (nprobe ≥ its cluster's rank). The
  * brute-force ground-truth leg is the 5-probe × corpus broadcast
  * kernel — affordable on a probe SAMPLE, which is exactly what a
  * production recall audit runs. Output is 5 rows.
  */
object TrainData4 {

  /** Sweep points; the widest bounds the one-time candidate fetch. */
  private val ParetoNps = Seq(1, 2, 4, 8, 12)
  private val ParetoK = 16

  private def q177(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val corpus = TrainData.embParallel(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = TrainData.trainedCentroidsK(spark, dir, ParetoK)
    val assigned = IvfFlat.assign(corpus, cents)
    val probes = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    // probe → centroid rank cr (1..K), kept to the widest sweep point —
    // the family's ONE coarse-prune contract (IvfFlat.probedClusters)
    val probeClusters = IvfFlat
      .probedClusters(probes, cents, maxRank = ParetoNps.max)
      .withColumnRenamed("__cr", "cr")
    // one candidate fetch + one exact cosine per candidate, then a
    // row-local fan-out to every sweep point that includes the row
    val scored = assigned
      .join(broadcast(probeClusters), col("cluster") === col("__cent_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", TrainData.cosine(col("pv"), col("embedding")))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        col("cr"), col("cosine"))
    val fanned = scored.withColumn("nprobe",
      explode(filter(typedLit(ParetoNps), n => n >= col("cr"))))
    val wk = Window.partitionBy("nprobe", "probe_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    val ivf = fanned
      .withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= TrainData.IvfTopK)
      .select(col("nprobe"), col("probe_id"), col("cand_id"))
    // brute-force ground truth — nprobe-independent (q80's kernel)
    val wb = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    val brute = probes
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv")), col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", TrainData.cosine(col("pv"), col("cv")))
      .withColumn("rk", row_number().over(wb))
      .filter(col("rk") <= TrainData.IvfTopK)
      .select(col("probe_id"), col("cand_id"))
    val hits = brute.join(ivf, Seq("probe_id", "cand_id"))
      .groupBy("nprobe").agg(count(lit(1)).as("n_hits"))
    val denom = 5 * TrainData.IvfTopK // 5 probes × top-10
    fanned.groupBy("nprobe").agg(count(lit(1)).as("n_cand"))
      .join(hits, Seq("nprobe"), "left")
      .select(col("nprobe"), col("n_cand"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / denom)
          .as("recall_at_k"))
      .orderBy("nprobe")
  }

  private val q177Sql = {
    val npsList = ParetoNps.mkString("[", ",", "]")
    s"""WITH ${TrainData.kmTrainCtesSqlK(ParetoK)},
      |assigned AS (SELECT vec_id, cid AS cluster FROM a3),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding
      |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
      |pc AS (
      |  SELECT p.probe_id, c.cid,
      |    ${TrainData.cosExprSql("p.embedding", "c.cv")} AS pc_cos
      |  FROM probes p CROSS JOIN c2 c),
      |ranked AS (
      |  SELECT probe_id, cid,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY pc_cos DESC, cid) AS INT) AS cr
      |  FROM pc),
      |cand AS (
      |  SELECT r.probe_id, a.vec_id AS cand_id, r.cr
      |  FROM ranked r JOIN assigned a ON a.cluster = r.cid
      |  WHERE r.cr <= ${ParetoNps.max} AND a.vec_id != r.probe_id),
      |scored AS (
      |  SELECT c.probe_id, c.cand_id, c.cr,
      |    ${TrainData.cosExprSql("pe.embedding", "ce.embedding")} AS cosine
      |  FROM cand c
      |  JOIN embeddings pe ON c.probe_id = pe.vec_id
      |  JOIN embeddings ce ON c.cand_id = ce.vec_id),
      |nps AS (SELECT CAST(unnest($npsList) AS INT) AS nprobe),
      |x AS (
      |  SELECT n.nprobe, s.probe_id, s.cand_id, s.cosine
      |  FROM nps n JOIN scored s ON s.cr <= n.nprobe),
      |ivf AS (
      |  SELECT nprobe, probe_id, cand_id FROM x
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY nprobe, probe_id
      |    ORDER BY cosine DESC, cand_id) <= ${TrainData.IvfTopK}),
      |bscored AS (
      |  SELECT p.probe_id, e.vec_id AS cand_id,
      |    ${TrainData.cosExprSql("p.embedding", "e.embedding")} AS cosine
      |  FROM probes p JOIN embeddings e ON e.vec_id != p.probe_id),
      |brute AS (
      |  SELECT probe_id, cand_id FROM bscored
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY cosine DESC, cand_id) <= ${TrainData.IvfTopK}),
      |hits AS (
      |  SELECT i.nprobe, COUNT(*) AS n_hits
      |  FROM brute b JOIN ivf i
      |    ON b.probe_id = i.probe_id AND b.cand_id = i.cand_id
      |  GROUP BY 1),
      |cost AS (SELECT nprobe, COUNT(*) AS n_cand FROM x GROUP BY 1)
      |SELECT c.nprobe, c.n_cand, COALESCE(h.n_hits, 0) AS n_hits,
      |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / ${5 * TrainData.IvfTopK}
      |    AS recall_at_k
      |FROM cost c LEFT JOIN hits h ON c.nprobe = h.nprobe
      |ORDER BY c.nprobe""".stripMargin
  }

  // ── q178: MULTI-TARGET DSIR mixture weights — the composition q169
  // (distribution-matching selection) and q61 (temperature mixing) each
  // exercise half of: score every doc under the frozen DSIR importance
  // model, select the top quarter (q169's rule — the 100 TB plan swaps
  // the rank for q170's histogram threshold, census unchanged), roll
  // the SELECTED corpus up per SOURCE, and turn each source's selected
  // token mass into a temperature-flattened training-mixture allocation
  // (Xie et al. 2023 §3.3 / DoReMi-style domain reweighting at τ=2:
  // w_s ∝ share_s^(1/2)). The flattening is deliberate policy: a
  // minority domain that survives importance selection gets MORE than
  // its proportional share (√p/Σ√ > p for p < 1/2), which is what keeps
  // rare-but-matching domains represented in the final mixture.
  //
  // Determinism: selected token/logit masses are exact integers; share
  // is one IEEE division; the τ=2 weight uses sqrt (correctly rounded
  // by IEEE-754, unlike pow/exp — why τ is pinned to 2 rather than a
  // free parameter) and lands in fixed point via floor(·×1e6); the
  // allocation replays q61's floor(share × budget) in the w_fp space.
  // Both engines execute the identical op sequence, so the doubles are
  // bit-equal and the gate hashes them directly.
  //
  // Scale: ONE scoring scan (row-local logits under the plan-literal
  // model), then the SELECTION runs through [[TrainData3.dsirSelect]] —
  // the engine's one top-quarter rule, whose doc census swaps the
  // global rank for the histogram-threshold plan past DsRankMaxDocs
  // (q170's gated contract: identical selected set by construction).
  // Round 14 hard-coded a global single-partition row_number here —
  // correct at every gated SF, one-task at corpus grain; `force` pins
  // a plan for tests exactly as q169/q170 do. The tail is a
  // source-grain census — sources are few, the share/allocation
  // windows run over a handful of post-aggregation rows. ──
  private[graft] def mixtureAllocation(
      docs: DataFrame, budget: Long,
      model: Option[(IndexedSeq[Long], Long)] = None,
      force: Option[String] = None): DataFrame = {
    // n_tok rides dsirSelect's pass-through (text itself is consumed
    // by the selector's scoring column and dropped)
    val withTok = docs.withColumn("n_tok",
      coalesce(size(TrainData.tokens(col("text"))).cast("long"), lit(0L)))
    val tot = Window.partitionBy()
    TrainData3.dsirSelect(withTok, force = force, model = model)
      .filter(col("sel"))
      .groupBy("source").agg(
        count(lit(1)).as("n_sel"),
        sum("n_tok").as("sel_tok"),
        sum("logit").as("sel_logit_sum"))
      .withColumn("share", col("sel_tok").cast("double") /
        sum("sel_tok").over(tot).cast("double"))
      .withColumn("w_fp", floor(sqrt(col("share")) * 1e6).cast("long"))
      .withColumn("alloc_tok",
        floor(col("w_fp").cast("double") / sum("w_fp").over(tot).cast("double")
          * lit(budget).cast("double")).cast("long"))
      .orderBy("source")
  }

  private def q178(spark: SparkSession, dir: String): DataFrame =
    mixtureAllocation(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("lang"), col("text")),
      TrainData.MixBudgetTok,
      model = Some(TrainData3.dsModelDir(spark, dir)))

  private val q178Sql =
    s"""WITH ${TrainData3.dsirLogitCtesSql},
      |sel AS (
      |  SELECT doc_id, logit FROM dslogit
      |  QUALIFY ROW_NUMBER() OVER (ORDER BY logit DESC, doc_id) <=
      |    ((SELECT COUNT(*) FROM documents) + 3) // 4),
      |cen AS (
      |  SELECT d.source, COUNT(*) AS n_sel,
      |    CAST(SUM(COALESCE(len(string_split(d.text, ' ')), 0)) AS BIGINT)
      |      AS sel_tok,
      |    CAST(SUM(s.logit) AS BIGINT) AS sel_logit_sum
      |  FROM sel s JOIN documents d ON s.doc_id = d.doc_id
      |  GROUP BY 1),
      |sh AS (SELECT *, CAST(sel_tok AS DOUBLE) /
      |    CAST(SUM(sel_tok) OVER () AS DOUBLE) AS share FROM cen),
      |w AS (SELECT *,
      |    CAST(floor(sqrt(share) * 1e6) AS BIGINT) AS w_fp FROM sh)
      |SELECT source, n_sel, sel_tok, sel_logit_sum, share, w_fp,
      |  CAST(floor(CAST(w_fp AS DOUBLE) / CAST(SUM(w_fp) OVER () AS DOUBLE)
      |    * ${TrainData.MixBudgetTok}) AS BIGINT) AS alloc_tok
      |FROM w ORDER BY source""".stripMargin

  // ── q180: sequence packing under the TRAINED tokenizer — the
  // composition q58 (concat-and-split packing) and q163 (trained-BPE
  // per-doc counts) each exercise half of: real pipelines size training
  // sequences by TOKENIZER length, not whitespace words (the two differ
  // by the fertility ratio, so whitespace packing over- or under-fills
  // every sequence). Per source shard: docs laid end-to-end in doc_id
  // order, offsets by running sum of the trained-BPE doc length, cut at
  // SeqCap — sequences produced + boundary-crossing docs, q58's exact
  // integer shapes. Docs whose words never tokenize (NULL/empty text)
  // have no trained length and drop from the layout in BOTH engines
  // (q163's join semantics).
  //
  // Scale: the per-word trained lengths ride a vocab-sized broadcast
  // onto ONE tokenize scan (q163's transport, the BpeTokLen codegen'd
  // kernel); offsets come from [[TrainData.packedOffsets]] (census-
  // selected window vs bucketed two-pass) — composition adds nothing
  // beyond the two parents' shapes. ──
  private def q180(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("text"))
    val merges = TrainData2.trainedMerges(spark, dir)
    val vlen = docs
      .select(explode(TrainData.tokens(col("text"))).as("w")).distinct()
      .select(col("w"), TrainData2.bpeTokLenCol(col("w"), merges).as("n_sym"))
    val perDoc = docs
      .select(col("source"), col("doc_id"),
        explode(TrainData.tokens(col("text"))).as("w"))
      .join(broadcast(vlen), "w")
      .groupBy("source", "doc_id").agg(sum("n_sym").as("n_tok"))
    val cap = TrainData.SeqCap
    TrainData.packedOffsets(perDoc)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tok"),
        (max(expr(s"(start_off + n_tok - 1) div $cap")) + 1).as("n_seqs"),
        sum(when(
          expr(s"(start_off + n_tok - 1) div $cap > start_off div $cap"),
          1L).otherwise(0L)).as("n_crossing"))
      .orderBy("source")
  }

  private val q180Sql = {
    val cap = TrainData.SeqCap
    s"""WITH ${TrainData2.bpeDocCtesSql},
      |src AS (
      |  SELECT d.source, p.doc_id, p.bpe_tok AS n_tok
      |  FROM per p JOIN documents d ON p.doc_id = d.doc_id),
      |laid AS (
      |  SELECT source, doc_id, n_tok,
      |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_off
      |  FROM src)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tok,
      |  MAX((start_off + n_tok - 1) // $cap) + 1 AS n_seqs,
      |  CAST(SUM(CASE WHEN (start_off + n_tok - 1) // $cap
      |                     > start_off // $cap THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_crossing
      |FROM laid GROUP BY source ORDER BY source""".stripMargin
  }

  // ── q181: the PRODUCTION IVFADC gate at the q177-adopted operating
  // point — q151/q153 certify the ADC mechanism end-to-end but gate at
  // the k=4/nprobe=2 exploration config (recall 0.76, the coarse
  // ceiling q177 proved is a parameter, not physics). This query runs
  // BOTH ADC variants (direct + residual codes) under the k=16
  // quantizer at nprobe=12 — the measured recall≥0.9 knee — and emits,
  // per (variant, probe): the ADC candidate cost (the rows the index
  // actually scanned — the number an operator trades against recall)
  // and recall@10 vs brute force. The recall contract is
  // SELF-ENFORCING like q179's plan contract: the query raises unless
  // every variant clears 0.9 aggregate recall, so a config drift can
  // never silently re-gate the family at a toy operating point.
  //
  // Scale: identical shapes to q151/q153 (one assignment scan, one
  // candidate fetch against the broadcast probe list, ADC = M integer
  // lookups/candidate, exact cosine only for shortlist survivors) —
  // only the model constants change. Cost and recall ride the same
  // candidate relation, so the jump from nprobe=2 to 12 is priced in
  // the gated output itself.
  //
  // The RERANK BUDGET is the operating point's second knob, and on
  // this data it is corpus-relative (the q177 honesty note again: ADC
  // ordering over near-uniform embeddings is weakly informative, so
  // the exact top-10 concentrates in the ADC top ~70% of candidates,
  // not the top few hundred — measured at sf0.1: SL=320 → 35/50,
  // 640 → 42/50, 1024 → 46/50 = the nprobe=12 IVF ceiling; clustered
  // real data reaches its ceiling at FAISS-typical fixed budgets, same
  // code path). The adopted rule is exact integer math both engines
  // replay bit-equally: SL = max(AdcShortlist, ceil(0.7 · n·12/16)) =
  // max(320, (84n+159) div 160), emitted as n_rerank so the gated
  // artifact carries the full cost story: n_cand ADC lookups + n_rerank
  // exact distances per probe, ~30% of exact work saved at ZERO recall
  // loss vs rescoring every candidate. ──
  private val OpNprobe = 12

  /** The corpus-relative rerank budget (see the q181 design note). */
  private def opShortlist(n: Long): Int =
    math.max(TrainData2.AdcShortlist.toLong, (84L * n + 159L) / 160L).toInt

  private def q181(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val corpus = TrainData.embParallel(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = TrainData.trainedCentroidsK(spark, dir, ParetoK)
    val cbD = TrainData2.frozenCodebooks(spark, dir)
    val cbR = TrainData2.frozenCodebooksResidualK(spark, dir, ParetoK)
    val probes = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val assigned = IvfFlat.assign(corpus, cents).localCheckpoint(false)
    val sl = opShortlist(assigned.count())
    // both code sets ride ONE row-local projection of the assignment,
    // and both variants (plus the cost census below) are served from
    // PqAdc.searchDual's single candidate fetch — the r16 rewire of the
    // previous shape, which fetched the same candidates three times
    // (direct search, residual search, probedClusters cost join); every
    // ADC/re-rank expression is unchanged, so the gated rows are
    // identical (PqAdcSpec-pinned leg-for-leg vs the single-variant
    // searches)
    val encBoth = PqAdc.encodeResidual(
        PqAdc.encode(assigned, cbD, TrainData2.PqSub)
          .withColumnRenamed("codes", "codes_d"),
        cents, cbR, TrainData2.PqSub)
      .withColumnRenamed("codes", "codes_r")
    val (topD0, topR0, candRel) = PqAdc.searchDual(encBoth, probes, cents,
      cbD, cbR, TrainData2.PqSub,
      nprobe = OpNprobe, shortlist = sl, k = TrainData.IvfTopK)
    val topD = topD0.select(col("probe_id"), col("cand_id"))
    val topR = topR0.select(col("probe_id"), col("cand_id"))
    // candidate cost, shared by both variants — counted off the very
    // fetch the searches consumed (same coarse-prune ranking as
    // IvfFlat.probedClusters, stated once in PqAdc.searchDual)
    val cost = candRel
      .groupBy("probe_id").agg(count(lit(1)).as("n_cand"))
    val wk = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    val brute = probes
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv")), col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", TrainData.cosine(col("pv"), col("cv")))
      .withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= TrainData.IvfTopK)
      .select(col("probe_id"), col("cand_id"))
    def leg(tops: DataFrame, variant: String): DataFrame =
      probes.select("probe_id")
        .join(brute.join(tops, Seq("probe_id", "cand_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("n_hits")),
          Seq("probe_id"), "left")
        .join(cost, Seq("probe_id"))
        .select(lit(variant).as("variant"), col("probe_id"), col("n_cand"),
          lit(sl.toLong).as("n_rerank"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / TrainData.IvfTopK)
            .as("recall_at_k"))
    val out = leg(topD, "direct").unionByName(leg(topR, "residual"))
      .orderBy("variant", "probe_id")
      .localCheckpoint(false) // 10 rows; reused by the gate below and the result
    // the self-enforcing operating-point contract: aggregate recall@10
    // must clear 0.9 for BOTH variants (bounded collect — 2 rows)
    out.groupBy("variant").agg(sum("n_hits").as("h")).collect().foreach { r =>
      val denom = 5 * TrainData.IvfTopK
      require(r.getLong(1) >= math.ceil(0.9 * denom).toLong,
        s"q181: ${r.getString(0)} ADC recall ${r.getLong(1)}/$denom fell " +
          "below the 0.9 operating-point contract")
    }
    out
  }

  /** The q181 oracle: the q151 (direct) and q153 (residual) lifecycles
    * replayed verbatim — Lloyd coarse training at k=16, PQ training,
    * encode, probe LUT, integer ADC, corpus-relative shortlist, exact
    * re-rank, recall — under the single shared nprobe=12 prune. */
  private val q181Sql = {
    val M = TrainData2.PqM
    val S = TrainData2.PqSub
    val I = TrainData2.PqIters
    val k = TrainData.IvfTopK
    s"""WITH ${TrainData.kmTrainCtesSqlK(ParetoK)},
      |assigned AS (SELECT vec_id, cid AS cluster FROM a3),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding
      |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 105),
      |ms AS (SELECT CAST(unnest(range(0, $M)) AS INT) AS m),
      |slq AS (
      |  SELECT GREATEST(${TrainData2.AdcShortlist},
      |    (84 * COUNT(*) + 159) // 160) AS v FROM embeddings),
      |psrc AS (
      |  SELECT e.vec_id, ms.m,
      |    list_transform(
      |      list_slice(e.embedding, ms.m * $S + 1, ms.m * $S + $S),
      |      x -> CAST(x AS DOUBLE)) AS sv
      |  FROM embeddings e CROSS JOIN ms),
      |${TrainData2.pqTrainCtes("psrc", "pq")},
      |d AS (
      |  SELECT s.vec_id, s.m, c.code,
      |    list_aggregate(list_transform(range(1, ${S + 1}),
      |      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])), 'sum') AS d2
      |  FROM psrc s JOIN pqcb$I c ON s.m = c.m),
      |codes AS (
      |  SELECT vec_id, m, code FROM d
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) = 1),
      |rsub AS (
      |  SELECT e.vec_id, ms.m,
      |    list_transform(range(1, ${S + 1}), i ->
      |      CAST(e.embedding[ms.m * $S + i] AS DOUBLE)
      |        - CAST(c.cv[ms.m * $S + i] AS DOUBLE)) AS sv
      |  FROM embeddings e
      |  JOIN assigned a ON e.vec_id = a.vec_id
      |  JOIN c2 c ON a.cluster = c.cid
      |  CROSS JOIN ms),
      |${TrainData2.pqTrainCtes("rsub", "rq")},
      |rd AS (
      |  SELECT s.vec_id, s.m, cb.code,
      |    list_aggregate(list_transform(range(1, ${S + 1}),
      |      i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])), 'sum') AS d2
      |  FROM rsub s JOIN rqcb$I cb ON s.m = cb.m),
      |rcodes AS (
      |  SELECT vec_id, m, code FROM rd
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, code) = 1),
      |pc AS (
      |  SELECT p.probe_id, c.cid,
      |    ${TrainData.cosExprSql("p.embedding", "c.cv")} AS pc_cos
      |  FROM probes p CROSS JOIN c2 c),
      |probed AS (
      |  SELECT probe_id, cid FROM pc
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY pc_cos DESC, cid) <= $OpNprobe),
      |cand AS (
      |  SELECT pr.probe_id, pr.cid, a.vec_id AS cand_id
      |  FROM probed pr JOIN assigned a ON a.cluster = pr.cid
      |  WHERE a.vec_id != pr.probe_id),
      |cost AS (SELECT probe_id, COUNT(*) AS n_cand FROM cand GROUP BY 1),
      |psub AS (
      |  SELECT p.probe_id, ms.m,
      |    list_slice(p.embedding, ms.m * $S + 1, ms.m * $S + $S) AS sv
      |  FROM probes p CROSS JOIN ms),
      |plut AS (
      |  SELECT s.probe_id, s.m, c.code,
      |    CAST(round(list_aggregate(list_transform(range(1, ${S + 1}),
      |      i -> (CAST(s.sv[i] AS DOUBLE) - c.cv[i])
      |         * (CAST(s.sv[i] AS DOUBLE) - c.cv[i])), 'sum')
      |      * 1e9) AS BIGINT) AS d2e9
      |  FROM psub s JOIN pqcb$I c ON s.m = c.m),
      |adc AS (
      |  SELECT cd.probe_id, cd.cand_id, CAST(SUM(l.d2e9) AS BIGINT) AS adc_e9
      |  FROM cand cd
      |  JOIN codes co ON co.vec_id = cd.cand_id
      |  JOIN plut l ON l.probe_id = cd.probe_id AND l.m = co.m AND l.code = co.code
      |  GROUP BY 1, 2),
      |short AS (
      |  SELECT probe_id, cand_id FROM adc
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY adc_e9, cand_id) <= (SELECT v FROM slq)),
      |rescored AS (
      |  SELECT s.probe_id, s.cand_id,
      |    ${TrainData.cosExprSql("pe.embedding", "ce.embedding")} AS cosine
      |  FROM short s
      |  JOIN embeddings pe ON s.probe_id = pe.vec_id
      |  JOIN embeddings ce ON s.cand_id = ce.vec_id),
      |ivfadc AS (
      |  SELECT probe_id, cand_id FROM rescored
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY cosine DESC, cand_id) <= $k),
      |prsub AS (
      |  SELECT p.probe_id, pr.cid, ms.m,
      |    list_transform(range(1, ${S + 1}), i ->
      |      CAST(p.embedding[ms.m * $S + i] AS DOUBLE)
      |        - CAST(c.cv[ms.m * $S + i] AS DOUBLE)) AS sv
      |  FROM probes p
      |  JOIN probed pr ON p.probe_id = pr.probe_id
      |  JOIN c2 c ON pr.cid = c.cid
      |  CROSS JOIN ms),
      |rlut AS (
      |  SELECT s.probe_id, s.cid, s.m, cb.code,
      |    CAST(round(list_aggregate(list_transform(range(1, ${S + 1}),
      |      i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])), 'sum')
      |      * 1e9) AS BIGINT) AS d2e9
      |  FROM prsub s JOIN rqcb$I cb ON s.m = cb.m),
      |radc AS (
      |  SELECT cd.probe_id, cd.cand_id, CAST(SUM(l.d2e9) AS BIGINT) AS adc_e9
      |  FROM cand cd
      |  JOIN rcodes co ON co.vec_id = cd.cand_id
      |  JOIN rlut l ON l.probe_id = cd.probe_id AND l.cid = cd.cid
      |    AND l.m = co.m AND l.code = co.code
      |  GROUP BY 1, 2),
      |rshort AS (
      |  SELECT probe_id, cand_id FROM radc
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY adc_e9, cand_id) <= (SELECT v FROM slq)),
      |rrescored AS (
      |  SELECT s.probe_id, s.cand_id,
      |    ${TrainData.cosExprSql("pe.embedding", "ce.embedding")} AS cosine
      |  FROM rshort s
      |  JOIN embeddings pe ON s.probe_id = pe.vec_id
      |  JOIN embeddings ce ON s.cand_id = ce.vec_id),
      |rivfadc AS (
      |  SELECT probe_id, cand_id FROM rrescored
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY cosine DESC, cand_id) <= $k),
      |bscored AS (
      |  SELECT p.probe_id, e.vec_id AS cand_id,
      |    ${TrainData.cosExprSql("p.embedding", "e.embedding")} AS cosine
      |  FROM probes p JOIN embeddings e ON e.vec_id != p.probe_id),
      |brute AS (
      |  SELECT probe_id, cand_id FROM bscored
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
      |    ORDER BY cosine DESC, cand_id) <= $k),
      |dh AS (
      |  SELECT b.probe_id, COUNT(*) AS n
      |  FROM brute b JOIN ivfadc i
      |    ON b.probe_id = i.probe_id AND b.cand_id = i.cand_id
      |  GROUP BY 1),
      |rh AS (
      |  SELECT b.probe_id, COUNT(*) AS n
      |  FROM brute b JOIN rivfadc i
      |    ON b.probe_id = i.probe_id AND b.cand_id = i.cand_id
      |  GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 'direct' AS variant, p.probe_id, c.n_cand,
      |    (SELECT v FROM slq) AS n_rerank, COALESCE(dh.n, 0) AS n_hits,
      |    CAST(COALESCE(dh.n, 0) AS DOUBLE) / $k AS recall_at_k
      |  FROM probes p JOIN cost c ON p.probe_id = c.probe_id
      |  LEFT JOIN dh ON p.probe_id = dh.probe_id
      |  UNION ALL
      |  SELECT 'residual', p.probe_id, c.n_cand,
      |    (SELECT v FROM slq), COALESCE(rh.n, 0),
      |    CAST(COALESCE(rh.n, 0) AS DOUBLE) / $k
      |  FROM probes p JOIN cost c ON p.probe_id = c.probe_id
      |  LEFT JOIN rh ON p.probe_id = rh.probe_id)
      |ORDER BY variant, probe_id""".stripMargin
  }

  /** Deterministic CLUSTERED-embedding fixture (r15 VERDICT #4): the
    * driver's synthetic embeddings are near-uniform, so q177/q181
    * honestly gate the ADC rerank budget CORPUS-RELATIVE — which means
    * no gated artifact ever demonstrates the FAISS-typical regime
    * where a FIXED budget reaches the recall ceiling. This transform
    * manufactures that regime from the real table with zero synthetic
    * data generation: vector i is pulled 90% toward center (i mod k) —
    * the centers being real embeddings — yielding k tight clusters
    * while keeping per-vector diversity from the 10% residue. A
    * deterministic ±0.002 per-(vector, dim) micro-jitter is then
    * applied, so id-replicated copies of one base vector become a
    * TIGHT FAMILY instead of exact duplicates — the two-level
    * structure real corpora show (macro clusters + local
    * neighborhoods/near-dup families), which is precisely the regime
    * where a fixed shortlist contains the true neighbors. Used by the
    * TrainData4Spec fixed-budget pin and ScaleProbe's
    * SPARK_GRAFT_ANN_CORPUS=clustered leg (SCALE.md). Row-local
    * (centers ride as a k×dim plan literal — bounded model state). */
  private[graft] def clusterMix(vecs: DataFrame,
                                centers: Seq[Array[Float]]): DataFrame = {
    val k = centers.size
    val centArr = array(centers.map(c => typedLit(c.toSeq)): _*)
    vecs.withColumn("__c",
        element_at(centArr, (col("vec_id") % k + 1).cast("int")))
      .withColumn("embedding",
        zip_with(col("__c"), col("embedding"),
          (a, b) => (a * lit(0.9f) + b * lit(0.1f)).cast("float")))
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => (x + (pmod(xxhash64(col("vec_id"), i), lit(1001L))
          .cast("float") - lit(500f)) / lit(250000f)).cast("float")))
      .drop("__c")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q177_nprobe_pareto", q177, Some(q177Sql)),
    QueryDef("q178_dsir_mixture", q178, Some(q178Sql)),
    QueryDef("q180_bpe_packing", q180, Some(q180Sql)),
    QueryDef("q181_adc_operating_point", q181, Some(q181Sql)))
}

