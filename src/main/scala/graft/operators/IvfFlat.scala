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
  def probe(assigned: DataFrame, probes: DataFrame,
            centroids: Seq[Array[Float]], nprobe: Int, k: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            probeIdCol: String = "probe_id", probeVecCol: String = "pv"): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size, s"ivf_flat: nprobe=$nprobe out of range")
    // probe → nprobe nearest centroids; P×k rows, broadcast-sized
    val centRank = Window.partitionBy(probeIdCol)
      .orderBy(col("__pc_cos").desc, col("__cent_id"))
    val probeClusters = probes
      .select(col(probeIdCol), col(probeVecCol),
        posexplode(typedLit(centroids.toArray)).as(Seq("__pos", "__cv")))
      .select(col(probeIdCol), col(probeVecCol),
        (col("__pos") + 1).cast("int").as("__cent_id"),
        CosineSimilarity(col(probeVecCol), col("__cv")).as("__pc_cos"))
      .withColumn("__cr", row_number().over(centRank))
      .filter(col("__cr") <= nprobe)
      .select(col(probeIdCol), col(probeVecCol), col("__cent_id"))
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
}
