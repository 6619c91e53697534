package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** IVF-Flat approximate-nearest-neighbor search — the inverted-file
  * counterpart to the sign-LSH path in [[AnnLsh]] (reference capability:
  * similarity search over an embedding column; IVF is the standard
  * coarse-quantizer design from the FAISS/IVFADC literature).
  *
  * Scale design:
  *   - The coarse quantizer (k centroids, k ≈ √N in production) is
  *     driver-side model state — a few MB at worst — exactly like Spark
  *     MLlib broadcasting k-means centers. Assignment is therefore a
  *     ZERO-SHUFFLE codegen'd projection: k [[CosineSimilarity]] calls
  *     per row against literal centroid arrays, argmax via
  *     `array_position(…, greatest(…))` (ties → lowest centroid id).
  *     No join, no aggregation — the corpus is touched once, map-side.
  *   - At rest the assigned table would be written partitioned by
  *     `cluster`, so a probe reads only `nprobe/k` of the corpus —
  *     partition pruning does the candidate cut before any compute.
  *   - Probing: the probe set is small by definition (queries, not the
  *     corpus). Probe→centroid ranking is a broadcast cross of P×k rows;
  *     the candidate fetch is a broadcast hash join of the (probe,
  *     cluster) list against the assigned corpus — the corpus-side scan
  *     never shuffles. Exact-cosine re-rank + per-probe top-k bounds
  *     output at P×k rows.
  *
  * Centroid choice is the caller's: production would run k-means
  * (Lloyd iterations are groupBy-average passes over the same assign
  * step); the oracle-gated query pins deterministic seed centroids so
  * both engines reproduce the index byte-for-byte.
  */
object IvfFlat {

  /** Nearest-centroid assignment (argmax cosine, ties → lowest centroid
    * id, 1-based `cluster` = position in `centroids`). A vector with no
    * defined cosine against any centroid (zero norm / dim mismatch)
    * raises rather than silently landing in a junk cluster — same
    * loud-failure policy as [[AnnLsh.signBucket]]. */
  def assign(vecs: DataFrame, centroids: Seq[Array[Float]],
             vecCol: String = "embedding"): DataFrame = {
    require(centroids.size >= 2, s"ivf_flat: need >= 2 centroids, got ${centroids.size}")
    val cos: Seq[Column] = centroids.map(c => CosineSimilarity(col(vecCol), typedLit(c)))
    val best = array_position(array(cos: _*), greatest(cos: _*))
    vecs.withColumn("cluster",
      when(best.isNotNull && best > 0, best.cast("int"))
        .otherwise(raise_error(concat(
          lit("ivf_flat: no centroid comparable to vector (zero norm or dim mismatch), size="),
          coalesce(size(col(vecCol)).cast("string"), lit("NULL"))))))
  }

  /** Table-backed assignment — the distributed-model variant of
    * [[assign]]: centroids live in a small DataFrame (`cent_id` INT,
    * 1-based; `cvec` ARRAY<FLOAT>) instead of literal plan nodes.
    *
    * Why a second shape exists: [[assign]] embeds k×dim floats into the
    * plan as `typedLit` arrays — ideal while the model is driver-held
    * and small (codegen'd flat projection), but the plan tree grows
    * LINEARLY in k·dim, so a 65k-centroid production quantizer would
    * mean a multi-hundred-MB plan recompiled per job. Here the model
    * stays a table (loadable from parquet at rest, versioned with the
    * index), is folded into ONE array-of-structs row, and reaches every
    * corpus row via a broadcast hash join on a constant key — the plan
    * is O(1) in k and the model ships executor-side as a broadcast
    * relation, exactly like MLlib broadcasting k-means centers. The
    * corpus still never shuffles. The trade: the per-row argmax runs
    * through higher-order functions (interpreted, not codegen'd) — for
    * big-k models the plan-size/compile win dominates; for tiny literal
    * models [[assign]] stays the faster hot loop (which is why
    * [[train]] keeps it).
    *
    * Semantics are identical to [[assign]] (argmax cosine, ties →
    * lowest cent_id via the sorted struct array, loud failure when no
    * centroid is comparable) — gated by the same q54/q76 oracles. */
  def assignByTable(vecs: DataFrame, centroids: DataFrame,
                    vecCol: String = "embedding"): DataFrame = {
    // one row: [(cent_id, cvec)…] sorted by cent_id — collect_list order
    // is nondeterministic, the sort restores it; determinism of the tie
    // break depends on it
    //
    // The join key is ALWAYS 0 but must be computed FROM DATA on both
    // sides: a literal key constant-folds out of the join condition and
    // Catalyst degrades the join to BroadcastNestedLoopJoin — the exact
    // operator the dedup/ANN suite's PlanSpec build-fails on (and
    // `size(c)*0` falls to the same arithmetic simplification). pmod of
    // a data hash is non-foldable and never-null, so the planner keeps a
    // BroadcastHashJoin with the 1-row model as build side.
    def one(c: Column): Column = pmod(hash(c), lit(1))
    val model = centroids
      .agg(array_sort(collect_list(struct(col("cent_id"), col("cvec"))))
        .as("__cents"))
      .withColumn("__one", one(col("__cents")))
    val cosArr = transform(col("__cents"),
      c => CosineSimilarity(col(vecCol), c.getField("cvec")))
    val bestPos = array_position(cosArr, array_max(cosArr))
    vecs.withColumn("__one", one(col(vecCol)))
      .join(broadcast(model), Seq("__one"))
      .withColumn("cluster",
        when(bestPos.isNotNull && bestPos > 0,
          element_at(col("__cents"), bestPos.cast("int")).getField("cent_id"))
          .otherwise(raise_error(concat(
            lit("ivf_flat: no centroid comparable to vector (zero norm or dim mismatch), size="),
            coalesce(size(col(vecCol)).cast("string"), lit("NULL"))))))
      .drop("__one", "__cents")
  }

  /** Lloyd iterations for the coarse quantizer — spherical k-means:
    * cosine assignment (via [[assign]]) + per-dimension mean update.
    * Because cosine is scale-invariant in the centroid, the mean needs
    * no re-normalization to preserve argmax semantics.
    *
    * Each iteration is one zero-shuffle assignment pass plus one
    * groupBy(cluster, dim) partial-aggregated sum — k×dim result rows
    * collected as the next model state (the Spark MLlib k-means shape:
    * broadcast centers out, treeAggregate sums back). An emptied cluster
    * keeps its previous centroid rather than collapsing to zeros.
    *
    * The per-dimension accumulator is FIXED-POINT (1e-6 resolution,
    * exact integer sum) rather than a double sum: float addition is
    * non-associative, so a double accumulator makes the trained
    * centroids depend on partition count and row arrival order — the
    * same corpus would build a different index on a different cluster
    * layout. Quantizing each contribution first costs ≤ 5e-7 per
    * coordinate (three orders below float32 resolution near 1.0) and
    * makes the model a pure function of the data. */
  def train(vecs: DataFrame, init: Seq[Array[Float]], iters: Int,
            vecCol: String = "embedding"): Seq[Array[Float]] = {
    require(iters >= 0, s"ivf_flat: iters=$iters must be >= 0")
    var cents = init
    for (_ <- 0 until iters) {
      // k×dim aggregate rows — model state, not data movement
      val sums = assign(vecs, cents, vecCol)
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("__pos", "__x")))
        .groupBy("cluster", "__pos")
        .agg(sum(round(col("__x") * 1e6).cast("long")).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCluster.get(i + 1).map { rows =>
          val next = new Array[Float](old.length)
          rows.foreach(r =>
            next(r.getInt(1)) = ((r.getLong(2) / 1e6) / r.getLong(3)).toFloat)
          next
        }.getOrElse(old)
      }
    }
    cents
  }

  /** Search: rank centroids per probe, keep the `nprobe` nearest, fetch
    * candidates from exactly those clusters, exact-cosine re-rank, top
    * `k` per probe (ties → lowest candidate id).
    *
    * `assigned` must carry `idCol`, `vecCol` and `cluster` (from
    * [[assign]]); `probes` carries `probeIdCol` + `probeVecCol`. Probes
    * present in the corpus are excluded from their own results.
    */
  /** Probe → centroid rank: every centroid with its cosine rank `__cr`
    * (1 = nearest; argmax cosine, ties → lowest centroid id), kept to
    * `maxRank`. THE coarse-prune contract of the IVF family, stated
    * once: [[probe]] consumes it directly, q177's Pareto sweep fans out
    * over `__cr`, and q181's candidate-cost census joins it against the
    * assignment — so the COST those queries report is derived from the
    * same ranking the search executes, by construction.
    * [[graft.operators.PqAdc.search]]/`searchResidual` fuse the
    * identical ranking with their per-probe LUT projection (kept fused
    * — the LUT must ride the same tiny P×K projection); any change to
    * this ordering must change those two in lockstep, which the
    * q151/q153/q181 oracles would catch. P×maxRank rows,
    * broadcast-sized. */
  def probedClusters(probes: DataFrame, centroids: Seq[Array[Float]],
                     maxRank: Int,
                     probeIdCol: String = "probe_id",
                     probeVecCol: String = "pv"): DataFrame = {
    require(maxRank >= 1 && maxRank <= centroids.size,
      s"ivf_flat: maxRank=$maxRank out of range")
    val centRank = Window.partitionBy(probeIdCol)
      .orderBy(col("__pc_cos").desc, col("__cent_id"))
    probes
      .select(col(probeIdCol), col(probeVecCol),
        posexplode(typedLit(centroids.toArray)).as(Seq("__pos", "__cv")))
      .select(col(probeIdCol), col(probeVecCol),
        (col("__pos") + 1).cast("int").as("__cent_id"),
        CosineSimilarity(col(probeVecCol), col("__cv")).as("__pc_cos"))
      .withColumn("__cr", row_number().over(centRank))
      .filter(col("__cr") <= maxRank)
      .select(col(probeIdCol), col(probeVecCol), col("__cent_id"), col("__cr"))
  }

  def probe(assigned: DataFrame, probes: DataFrame,
            centroids: Seq[Array[Float]], nprobe: Int, k: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            probeIdCol: String = "probe_id", probeVecCol: String = "pv"): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size, s"ivf_flat: nprobe=$nprobe out of range")
    // probe → nprobe nearest centroids; P×k rows, broadcast-sized
    val probeClusters =
      probedClusters(probes, centroids, nprobe, probeIdCol, probeVecCol)
        .drop("__cr")
    // candidate fetch: broadcast the (probe, cluster) list into the
    // corpus side — with a cluster-partitioned corpus this is partition
    // pruning + a map-side join, zero corpus shuffle
    val kRank = Window.partitionBy(probeIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    assigned
      .join(broadcast(probeClusters), col("cluster") === col("__cent_id"))
      .filter(col(idCol) =!= col(probeIdCol))
      .withColumn("cosine", CosineSimilarity(col(probeVecCol), col(vecCol)))
      .withColumn("rk", row_number().over(kRank).cast("int"))
      .filter(col("rk") <= k)
      .select(col(probeIdCol), col(idCol).as("cand_id"), col("cluster"),
        col("cosine"), col("rk"))
  }

  /** Table-backed search — the distributed-model variant of [[probe]],
    * completing the story [[assignByTable]] starts: index build AND
    * search run against the same versioned centroid table (`cent_id`
    * INT, 1-based; `cvec` ARRAY<FLOAT>), so neither side of the index
    * lifecycle embeds the model into the plan. The centroid relation is
    * folded into one array-of-structs row and broadcast-hash-joined to
    * the probe set on the same non-foldable pmod(hash) key trick as
    * [[assignByTable]] (a literal key would constant-fold and degrade
    * the join to the BroadcastNestedLoopJoin PlanSpec build-fails on);
    * a posexplode then yields the P×k (probe, centroid) ranking rows.
    * The candidate fetch and exact-cosine top-k re-rank are identical
    * to [[probe]] — the corpus side still never shuffles.
    *
    * Semantics are identical to [[probe]] (nprobe nearest centroids by
    * cosine, ties → lowest cent_id; per-probe top-k, ties → lowest
    * candidate id) — gated by the same q76 oracle. */
  def probeByTable(assigned: DataFrame, probes: DataFrame,
                   centroids: DataFrame, nprobe: Int, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   probeIdCol: String = "probe_id", probeVecCol: String = "pv"): DataFrame = {
    // centroid count lives in the table, so the nprobe upper bound can't
    // be require()d without an action; out-of-range nprobe degrades to
    // "all clusters" (the brute-force limit), which is safe
    require(nprobe >= 1, s"ivf_flat: nprobe=$nprobe must be >= 1")
    require(k >= 1, s"ivf_flat: k=$k must be >= 1")
    def one(c: Column): Column = pmod(hash(c), lit(1))
    val model = centroids
      .agg(array_sort(collect_list(struct(col("cent_id"), col("cvec"))))
        .as("__cents"))
      .withColumn("__one", one(col("__cents")))
    val centRank = Window.partitionBy(probeIdCol)
      .orderBy(col("__pc_cos").desc, col("__cent_id"))
    val probeClusters = probes
      .withColumn("__one", one(col(probeVecCol)))
      .join(broadcast(model), Seq("__one"))
      .select(col(probeIdCol), col(probeVecCol),
        posexplode(col("__cents")).as(Seq("__pos", "__c")))
      .select(col(probeIdCol), col(probeVecCol),
        col("__c").getField("cent_id").as("__cent_id"),
        CosineSimilarity(col(probeVecCol), col("__c").getField("cvec")).as("__pc_cos"))
      .withColumn("__cr", row_number().over(centRank))
      .filter(col("__cr") <= nprobe)
      .select(col(probeIdCol), col(probeVecCol), col("__cent_id"))
    val kRank = Window.partitionBy(probeIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    assigned
      .join(broadcast(probeClusters), col("cluster") === col("__cent_id"))
      .filter(col(idCol) =!= col(probeIdCol))
      .withColumn("cosine", CosineSimilarity(col(probeVecCol), col(vecCol)))
      .withColumn("rk", row_number().over(kRank).cast("int"))
      .filter(col("rk") <= k)
      .select(col(probeIdCol), col(idCol).as("cand_id"), col("cluster"),
        col("cosine"), col("rk"))
  }
}
