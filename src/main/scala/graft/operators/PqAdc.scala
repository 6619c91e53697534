package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** Product-quantization encode + asymmetric-distance-computation (ADC)
  * search — the fine-quantizer half of the FAISS-style IVFADC design
  * (reference capability: similarity search over an embedding column;
  * [[IvfFlat]] is the coarse half, this composes with it). Two variants:
  * DIRECT (codes over the raw vectors, [[encode]]/[[search]]) and
  * RESIDUAL (codes over vector − assigned-centroid,
  * [[encodeResidual]]/[[searchResidual]] — the classic IVFADC layout:
  * residuals are centered near zero, so the same codebook budget spends
  * its precision where the vectors actually are).
  *
  * Scale design:
  *   - Codebooks (M subspaces × K codewords × subDim doubles) are
  *     driver-side model state embedded as plan literals — the same
  *     contract as [[IvfFlat.assign]]'s centroids. Encoding is a
  *     ZERO-SHUFFLE row-local projection: M·K squared-L2 folds per row,
  *     argmin per subspace — the corpus is touched once, map-side, and
  *     at rest each vector is M small codes instead of dim floats.
  *   - Search never brings full vectors to the distance loop: per probe
  *     (per probed CLUSTER in the residual variant) a LOOKUP TABLE of
  *     M×K probe→codeword distances is computed ONCE on the (tiny)
  *     probe side, and the candidate scan is M integer array lookups +
  *     an integer sum per candidate — no per-candidate float fold until
  *     the exact re-rank, which touches only the `shortlist` survivors.
  *     That asymmetry (probe pays M·K folds once, candidates pay O(M)
  *     lookups each) is what makes a 100 TB corpus scannable: the scan
  *     cost per row is independent of `dim`.
  *   - Determinism: per-subspace distances are left-to-right double
  *     folds (bit-identical across engines — the q112 contract), then
  *     quantized to e9 fixed-point BEFORE the cross-subspace sum, so the
  *     ADC total is an exact integer — partitioning and row order cannot
  *     move it, and ranking ties break to the lowest candidate id.
  *     Residuals subtract float32 values under exact double arithmetic,
  *     so they too are pure functions of the stored model.
  */
object PqAdc {

  /** Squared L2 between a subvector slice and one codeword, as a
    * deterministic left-to-right `subDim`-term double fold. */
  private def d2(sub: Column, cw: Array[Double]): Column =
    aggregate(
      zip_with(sub, typedLit(cw), (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Element-wise vector − centroid under exact double arithmetic. */
  private def residualOf(vec: Column, cent: Column): Column =
    zip_with(vec, cent, (x, c) => x.cast("double") - c.cast("double"))

  /** Loud failure for a dim-mismatched PROBE vector — without it the
    * probe's LUT entries and re-rank cosines all go NULL and the caller
    * silently receives k lowest-id rows with cosine = NULL (the corpus
    * side gets the same guard inside [[encode]]). */
  private def guardProbes(probes: DataFrame, probeVecCol: String, dim: Int): DataFrame =
    probes.withColumn(probeVecCol,
      when(size(col(probeVecCol)) === dim, col(probeVecCol))
        .otherwise(raise_error(concat(
          lit(s"pq_adc: probe vector must have $dim dims (M*subDim), got "),
          coalesce(size(col(probeVecCol)).cast("string"), lit("NULL"))))))

  /** Lloyd-train the per-subspace codebooks on `vecs` — the q76/IvfFlat
    * training recipe transposed to (subspace, code) grain: `iters`
    * rounds of row-local argmin-L2² assignment (ties → lowest code,
    * like [[encode]]) + per-(m, code, dim) FIXED-POINT mean update
    * (sums of round(x·1e6) longs — order-independent, so the trained
    * model is a pure function of the data and the seeds, never of
    * partitioning or row order). Emptied codewords keep their previous
    * value. Each iteration is one corpus scan + one M·K·subDim
    * partial-aggregated rollup collected as driver-side model state
    * (the MLlib k-means shape); the corpus never shuffles wider than
    * the rollup. The oracle replays this exactly (TrainData2's
    * pqTrainCtes unroll). */
  def trainCodebooks(vecs: DataFrame, init: Seq[Seq[Array[Double]]], subDim: Int,
                     iters: Int, vecCol: String = "embedding"): Seq[Seq[Array[Double]]] = {
    require(init.nonEmpty && init.forall(_.size >= 2),
      "pq_adc: need >= 1 subspace with >= 2 seed codewords each")
    require(iters >= 0, s"pq_adc: iters=$iters must be >= 0")
    val mCnt = init.size
    val dim = mCnt * subDim
    // one materialization: every Lloyd round re-reads this relation
    // (assign + rollup), so paying the N×M-row checkpoint once beats
    // re-scanning and re-slicing the source per iteration. The source
    // vector's size rides along (one int per row) so the dim guard
    // below reads the ALREADY-materialized checkpoint — a per-row
    // when/raise_error wrap on the vector column would re-evaluate and
    // copy the array per explode entry (measured +1.3 s per consumer),
    // and a separate pre-scan would recompute the residual transform
    // on the residual path.
    val sub = vecs.select(size(col(vecCol)).as("vsz"),
        explode(array((0 until mCnt).map { mi =>
        struct(lit(mi).as("m"),
          transform(slice(col(vecCol), mi * subDim + 1, subDim),
            x => x.cast("double")).as("sv"))
      }: _*)).as("e"))
      .select(col("vsz"), col("e.m").as("m"), col("e.sv").as("sv"))
      .localCheckpoint(false)
    // the same loud-failure policy as encode/guardProbes: a short
    // vector would otherwise null every distance and NPE at the rollup
    // collect; a long one would silently train on a prefix
    val bad = sub.filter(col("vsz") =!= dim).limit(1).collect()
    require(bad.isEmpty,
      s"pq_adc: every training vector must have $dim dims (M*subDim), " +
        s"got ${if (bad.isEmpty) "" else bad(0).get(0)}")
    var cbs: IndexedSeq[IndexedSeq[Array[Double]]] =
      init.map(_.toIndexedSeq).toIndexedSeq
    for (_ <- 0 until iters) {
      // the per-subspace distance vector, dispatched on the row's m —
      // a when-chain over M branches, each an array of K folds
      val dists = (0 until mCnt).map(mi =>
        (mi, array(cbs(mi).map(cw => d2(col("sv"), cw)): _*)))
      val distArr = dists.tail.foldLeft(
        when(col("m") === dists.head._1, dists.head._2)) {
        case (acc, (mi, arr)) => acc.when(col("m") === mi, arr)
      }
      val rolled = sub
        .withColumn("code", array_position(distArr, array_min(distArr)).cast("int"))
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("m", "code", "pos")
        .agg(sum(round(col("x") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          (r.getLong(3), r.getLong(4)))).toMap
      cbs = IndexedSeq.tabulate(mCnt) { mi =>
        IndexedSeq.tabulate(cbs(mi).size) { code =>
          if (rolled.contains((mi, code + 1, 0)))
            Array.tabulate(subDim) { p =>
              val (s, cnt) = rolled((mi, code + 1, p))
              (s / 1e6) / cnt // exactly the oracle's (s / 1e6) / cnt
            }
          else cbs(mi)(code) // emptied codeword keeps its previous value
        }
      }
    }
    cbs
  }

  /** RESIDUAL-variant training: Lloyd over (vector − assigned coarse
    * centroid) — `assigned` must already carry `cluster` from
    * [[IvfFlat.assign]]; the residual is computed in-plan exactly as
    * [[encodeResidual]] computes it, so train and encode see the same
    * doubles. */
  def trainCodebooksResidual(assigned: DataFrame, centroids: Seq[Array[Float]],
                             init: Seq[Seq[Array[Double]]], subDim: Int, iters: Int,
                             vecCol: String = "embedding"): Seq[Seq[Array[Double]]] = {
    val dim = init.size * subDim
    require(centroids.forall(_.length == dim),
      s"pq_adc: every centroid must have $dim dims (M*subDim)")
    val cent = element_at(typedLit(centroids.toArray), col("cluster"))
    trainCodebooks(
      assigned.withColumn("__tres", residualOf(col(vecCol), cent)),
      init, subDim, iters, "__tres")
  }

  /** PQ encode: adds `codes` — ARRAY<INT> of length M where codes(m) is
    * the 1-based argmin-L2² codeword of subspace m (ties → lowest code).
    * `codebooks(m)(k)` is codeword k of subspace m, each of `subDim`
    * doubles; the input vector must have M·subDim dimensions. */
  def encode(vecs: DataFrame, codebooks: Seq[Seq[Array[Double]]], subDim: Int,
             vecCol: String = "embedding"): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.size >= 2),
      "pq_adc: need >= 1 subspace with >= 2 codewords each")
    val dim = codebooks.size * subDim
    // one native codegen'd M·K·subDim loop per row ([[graft.functions
    // .PqEncode]]) — arithmetic and tie-break are bit-identical to the
    // previous per-codeword `aggregate(zip_with(...))` folds, which were
    // interpreted per element and dominated the encode scan at M=8/K=8
    val codes = graft.functions.PqEncode(col(vecCol), codebooks, subDim)
    // loud failure on a dim-mismatched vector (same policy as
    // IvfFlat.assign): a short vector would otherwise fold over
    // null-padded slices and silently take code NULL — which the ADC
    // lookup then ranks FIRST (nulls sort ahead ascending), poisoning
    // the shortlist with exactly the rows that should have failed.
    // A NULL ELEMENT passes the size guard but makes the kernel return
    // NULL codes (PqEncode's NULL-out rule) — the coalesce raises on
    // that too, so no corrupted vector ever reaches the ADC scan.
    vecs.withColumn("codes",
      when(size(col(vecCol)) === dim,
        coalesce(codes, raise_error(lit(
          "pq_adc: vector contains a NULL element - cannot encode"))))
        .otherwise(raise_error(concat(
          lit(s"pq_adc: vector must have $dim dims (M*subDim), got "),
          coalesce(size(col(vecCol)).cast("string"), lit("NULL"))))))
  }

  /** RESIDUAL PQ encode: codes over (vector − centroid of the row's
    * `cluster`) — `assigned` must already carry `cluster` from
    * [[IvfFlat.assign]]. The residual is computed in-plan (row-local,
    * exact double subtraction of the float32 model values) and never
    * materialized beyond this projection. */
  def encodeResidual(assigned: DataFrame, centroids: Seq[Array[Float]],
                     codebooks: Seq[Seq[Array[Double]]], subDim: Int,
                     vecCol: String = "embedding"): DataFrame = {
    val dim = codebooks.size * subDim
    require(centroids.forall(_.length == dim),
      s"pq_adc: every centroid must have $dim dims (M*subDim)")
    val cent = element_at(typedLit(centroids.toArray), col("cluster"))
    // guard the RAW vector here, not just inside encode: zip_with in
    // residualOf null-pads a short vector to the centroid's length, so
    // the residual would pass encode's own size check with NULL elements
    // and silently emit NULL codes
    val resid = when(size(col(vecCol)) === dim, residualOf(col(vecCol), cent))
      .otherwise(raise_error(concat(
        lit(s"pq_adc: vector must have $dim dims (M*subDim), got "),
        coalesce(size(col(vecCol)).cast("string"), lit("NULL")))))
    encode(assigned.withColumn("__resid", resid), codebooks, subDim, "__resid")
      .drop("__resid")
  }

  /** Shared ADC tail: candidate fetch from the probed clusters
    * (broadcast probe list, corpus never shuffles), M integer lookups +
    * integer sum per candidate, shortlist by ascending adc_e9 (ties →
    * lowest id), exact-cosine re-rank of the shortlist only, top-k. */
  private def adcTail(assigned: DataFrame, probeClusters: DataFrame, m: Int,
                      shortlist: Int, k: Int, idCol: String, vecCol: String,
                      probeIdCol: String, probeVecCol: String): DataFrame = {
    val adcE9 = (0 until m)
      .map(mi => element_at(col(s"__lut$mi"), element_at(col("codes"), mi + 1)))
      .reduce(_ + _)
    val sRank = Window.partitionBy(probeIdCol)
      .orderBy(col("adc_e9").asc, col(idCol))
    val kRank = Window.partitionBy(probeIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    assigned
      .join(broadcast(probeClusters), col("cluster") === col("__cent_id"))
      .filter(col(idCol) =!= col(probeIdCol))
      .withColumn("adc_e9", adcE9)
      .withColumn("__sr", row_number().over(sRank))
      .filter(col("__sr") <= shortlist)
      // exact distance only for shortlist survivors
      .withColumn("cosine", CosineSimilarity(col(probeVecCol), col(vecCol)))
      .withColumn("rk", row_number().over(kRank).cast("int"))
      .filter(col("rk") <= k)
      .select(col(probeIdCol), col(idCol).as("cand_id"), col("cluster"),
        col("adc_e9"), col("cosine"), col("rk"))
  }

  /** IVFADC search over DIRECT codes: IVF-prune candidate clusters
    * (nprobe nearest centroids per probe, [[IvfFlat.probe]]'s ranking),
    * ADC-scan the candidates' PQ codes against the probe's lookup
    * table, shortlist, exact-cosine re-rank to the final top `k`.
    *
    * `assigned` must carry `idCol`, `vecCol`, `cluster` (from
    * [[IvfFlat.assign]]) and `codes` (from [[encode]], built with the
    * same `codebooks`/`subDim`). Probes present in the corpus are
    * excluded from their own results. */
  def search(assigned: DataFrame, probes: DataFrame,
             centroids: Seq[Array[Float]], codebooks: Seq[Seq[Array[Double]]],
             subDim: Int, nprobe: Int, shortlist: Int, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             probeIdCol: String = "probe_id", probeVecCol: String = "pv"): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size, s"pq_adc: nprobe=$nprobe out of range")
    require(shortlist >= k, s"pq_adc: shortlist=$shortlist must cover k=$k")
    val m = codebooks.size
    require(centroids.forall(_.length == m * subDim),
      s"pq_adc: every centroid must have ${m * subDim} dims (M*subDim)")
    val guarded = guardProbes(probes, probeVecCol, m * subDim)
    // probe → nprobe nearest centroids, with the probe's ADC lookup
    // table (M arrays of K e9-quantized distances) computed in the same
    // tiny projection — P×nprobe rows, broadcast-sized
    val centRank = Window.partitionBy(probeIdCol)
      .orderBy(col("__pc_cos").desc, col("__cent_id"))
    val luts = codebooks.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(col(probeVecCol), mi * subDim + 1, subDim)
      array(cb.map(cw => round(d2(sub, cw) * 1e9).cast("long")): _*).as(s"__lut$mi")
    }
    val probeClusters = guarded
      .select(Seq(col(probeIdCol), col(probeVecCol),
        posexplode(typedLit(centroids.toArray)).as(Seq("__pos", "__cv"))) ++ luts: _*)
      .select(Seq(col(probeIdCol), col(probeVecCol),
        (col("__pos") + 1).cast("int").as("__cent_id"),
        CosineSimilarity(col(probeVecCol), col("__cv")).as("__pc_cos")) ++
        (0 until m).map(mi => col(s"__lut$mi")): _*)
      .withColumn("__cr", row_number().over(centRank))
      .filter(col("__cr") <= nprobe)
      .drop("__cr", "__pc_cos")
    adcTail(assigned, probeClusters, m, shortlist, k,
      idCol, vecCol, probeIdCol, probeVecCol)
  }

  /** DUAL-variant IVFADC search — direct and residual codes served from
    * ONE candidate fetch. [[search]] + [[searchResidual]] run the same
    * coarse prune over the same corpus, so calling them side by side
    * (the q181 operating-point gate) pays the broadcast candidate join
    * twice; here the probe side carries BOTH lookup-table sets (direct
    * per probe, residual per probed cluster — each bounded by
    * P×nprobe×M×K longs), both integer ADC totals are computed in the
    * single fetch pass, and the fetched relation is checkpointed once
    * for the two shortlist/re-rank tails plus the caller's candidate
    * cost census. Every expression is the one [[search]] /
    * [[searchResidual]] evaluate — same folds, same e9 quantization,
    * same tie-breaks — so each returned leg is row-identical to its
    * single-variant twin (spec-pinned).
    *
    * `assigned` must carry `idCol`, `vecCol`, `cluster` and BOTH code
    * columns (`codesDCol` from [[encode]], `codesRCol` from
    * [[encodeResidual]], built with cbD/cbR respectively). Returns
    * (direct top-k, residual top-k, fetched candidates) — the third
    * relation is (probeIdCol, idCol, cluster) at candidate grain, for
    * cost accounting without a third fetch. */
  def searchDual(assigned: DataFrame, probes: DataFrame,
                 centroids: Seq[Array[Float]],
                 cbD: Seq[Seq[Array[Double]]], cbR: Seq[Seq[Array[Double]]],
                 subDim: Int, nprobe: Int, shortlist: Int, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 probeIdCol: String = "probe_id", probeVecCol: String = "pv",
                 codesDCol: String = "codes_d", codesRCol: String = "codes_r")
      : (DataFrame, DataFrame, DataFrame) = {
    require(nprobe >= 1 && nprobe <= centroids.size, s"pq_adc: nprobe=$nprobe out of range")
    require(shortlist >= k, s"pq_adc: shortlist=$shortlist must cover k=$k")
    require(cbD.size == cbR.size,
      s"pq_adc: direct (${cbD.size}) and residual (${cbR.size}) subspace counts differ")
    val m = cbD.size
    require(centroids.forall(_.length == m * subDim),
      s"pq_adc: every centroid must have ${m * subDim} dims (M*subDim)")
    val guarded = guardProbes(probes, probeVecCol, m * subDim)
    val centRank = Window.partitionBy(probeIdCol)
      .orderBy(col("__pc_cos").desc, col("__cent_id"))
    val lutsD = cbD.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(col(probeVecCol), mi * subDim + 1, subDim)
      array(cb.map(cw => round(d2(sub, cw) * 1e9).cast("long")): _*).as(s"__lutD$mi")
    }
    val lutsR = cbR.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(col("__presid"), mi * subDim + 1, subDim)
      array(cb.map(cw => round(d2(sub, cw) * 1e9).cast("long")): _*).as(s"__lutR$mi")
    }
    val probeClusters = guarded
      .select(Seq(col(probeIdCol), col(probeVecCol),
        posexplode(typedLit(centroids.toArray)).as(Seq("__pos", "__cv"))) ++ lutsD: _*)
      .select(Seq(col(probeIdCol), col(probeVecCol),
        (col("__pos") + 1).cast("int").as("__cent_id"),
        CosineSimilarity(col(probeVecCol), col("__cv")).as("__pc_cos"),
        residualOf(col(probeVecCol), col("__cv")).as("__presid")) ++
        (0 until m).map(mi => col(s"__lutD$mi")): _*)
      .withColumn("__cr", row_number().over(centRank))
      .filter(col("__cr") <= nprobe)
      .select(Seq(col(probeIdCol), col(probeVecCol), col("__cent_id")) ++
        (0 until m).map(mi => col(s"__lutD$mi")) ++ lutsR: _*)
    def adcOf(lutPrefix: String, codesCol: String) = (0 until m)
      .map(mi => element_at(col(s"$lutPrefix$mi"), element_at(col(codesCol), mi + 1)))
      .reduce(_ + _)
    // ONE fetch: both ADC totals ride the join pass; the checkpoint is
    // consumed by the two tails and the caller's cost census
    val cand = assigned
      .join(broadcast(probeClusters), col("cluster") === col("__cent_id"))
      .filter(col(idCol) =!= col(probeIdCol))
      .withColumn("__adc_d", adcOf("__lutD", codesDCol))
      .withColumn("__adc_r", adcOf("__lutR", codesRCol))
      .select(col(probeIdCol), col(probeVecCol), col(idCol), col(vecCol),
        col("cluster"), col("__adc_d"), col("__adc_r"))
      .localCheckpoint(false)
    def tail(adcCol: String): DataFrame = {
      val sRank = Window.partitionBy(probeIdCol)
        .orderBy(col(adcCol).asc, col(idCol))
      val kRank = Window.partitionBy(probeIdCol)
        .orderBy(col("cosine").desc, col(idCol))
      cand
        .withColumn("__sr", row_number().over(sRank))
        .filter(col("__sr") <= shortlist)
        .withColumn("cosine", CosineSimilarity(col(probeVecCol), col(vecCol)))
        .withColumn("rk", row_number().over(kRank).cast("int"))
        .filter(col("rk") <= k)
        .select(col(probeIdCol), col(idCol).as("cand_id"), col("cluster"),
          col(adcCol).as("adc_e9"), col("cosine"), col("rk"))
    }
    (tail("__adc_d"), tail("__adc_r"),
      cand.select(col(probeIdCol), col(idCol), col("cluster")))
  }

  /** IVFADC search over RESIDUAL codes: identical pruning and tail, but
    * the lookup table is computed PER PROBED CLUSTER from the probe's
    * residual against that cluster's centroid — the asymmetric twin of
    * [[encodeResidual]]'s layout (FAISS's IVFADC scan). Still P×nprobe
    * LUT computations total: the residual trick costs nothing extra at
    * scan time. */
  def searchResidual(assigned: DataFrame, probes: DataFrame,
                     centroids: Seq[Array[Float]], codebooks: Seq[Seq[Array[Double]]],
                     subDim: Int, nprobe: Int, shortlist: Int, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     probeIdCol: String = "probe_id", probeVecCol: String = "pv"): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size, s"pq_adc: nprobe=$nprobe out of range")
    require(shortlist >= k, s"pq_adc: shortlist=$shortlist must cover k=$k")
    val m = codebooks.size
    require(centroids.forall(_.length == m * subDim),
      s"pq_adc: every centroid must have ${m * subDim} dims (M*subDim)")
    val guarded = guardProbes(probes, probeVecCol, m * subDim)
    val centRank = Window.partitionBy(probeIdCol)
      .orderBy(col("__pc_cos").desc, col("__cent_id"))
    val luts = codebooks.zipWithIndex.map { case (cb, mi) =>
      val sub = slice(col("__presid"), mi * subDim + 1, subDim)
      array(cb.map(cw => round(d2(sub, cw) * 1e9).cast("long")): _*).as(s"__lut$mi")
    }
    val probeClusters = guarded
      .select(col(probeIdCol), col(probeVecCol),
        posexplode(typedLit(centroids.toArray)).as(Seq("__pos", "__cv")))
      .select(col(probeIdCol), col(probeVecCol),
        (col("__pos") + 1).cast("int").as("__cent_id"),
        CosineSimilarity(col(probeVecCol), col("__cv")).as("__pc_cos"),
        residualOf(col(probeVecCol), col("__cv")).as("__presid"))
      .withColumn("__cr", row_number().over(centRank))
      .filter(col("__cr") <= nprobe)
      .select(Seq(col(probeIdCol), col(probeVecCol), col("__cent_id")) ++ luts: _*)
    adcTail(assigned, probeClusters, m, shortlist, k,
      idCol, vecCol, probeIdCol, probeVecCol)
  }
}
