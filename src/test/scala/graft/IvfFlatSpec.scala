package graft

import org.apache.spark.sql.functions._
import graft.operators.IvfFlat

class IvfFlatSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random vectors (fixed seed — reruns identical). */
  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Array.fill(dim)(rng.nextFloat() * 2f - 1f))
  }

  /** Reference cosine with the expression's exact accumulation order. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val dim = 16
  private val corpus = randVecs(60, dim, seed = 7)
  private val cents: Seq[Array[Float]] = corpus.take(8).map(_._2)

  private def corpusDf = corpus.toDF("vec_id", "embedding")

  /** Brute-force nearest centroid (argmax cosine, ties → lowest id). */
  private def bruteAssign(v: Array[Float]): Int =
    cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
      .reduceLeft((a, b) => if (b._1 > a._1) b else a)._2 + 1

  test("assign matches brute-force argmax for every vector") {
    val got = IvfFlat.assign(corpusDf, cents)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    corpus.foreach { case (id, v) =>
      assert(got(id) == bruteAssign(v), s"vec $id")
    }
  }

  test("assignment ties break to the lowest centroid id") {
    // duplicate centroids: cosine to #1 and #2 is bit-identical
    val dup = Seq(cents.head, cents.head, cents(1))
    val got = IvfFlat.assign(corpusDf, dup)
      .select("vec_id", "cluster").as[(Long, Int)].collect()
    assert(got.forall(_._2 != 2), "tie must resolve to centroid 1, never 2")
    assert(got.exists(_._2 == 1) && got.exists(_._2 == 3))
  }

  test("zero-norm vectors fail loudly instead of landing in a junk cluster") {
    val withZero = corpusDf.unionByName(
      Seq((999L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding"))
    // consume the cluster column — a bare count() would prune the
    // projection (and with it the guard) away entirely
    val e = intercept[Exception](
      IvfFlat.assign(withZero, cents).select("cluster").collect())
    assert(e.getMessage.contains("ivf_flat") ||
      Option(e.getCause).exists(_.getMessage.contains("ivf_flat")), e.getMessage)
  }

  private def centTableDf(cs: Seq[Array[Float]]) =
    cs.zipWithIndex.map { case (v, i) => (i + 1, v) }.toDF("cent_id", "cvec")

  test("assignByTable agrees with assign on every vector, including ties") {
    val literal = IvfFlat.assign(corpusDf, cents)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val tabled = IvfFlat.assignByTable(corpusDf, centTableDf(cents))
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(tabled == literal)
    // duplicate centroids: the sorted struct array must break ties to the
    // lowest cent_id exactly like the literal path
    val dup = Seq(cents.head, cents.head, cents(1))
    val tiedTab = IvfFlat.assignByTable(corpusDf, centTableDf(dup))
      .select("vec_id", "cluster").as[(Long, Int)].collect()
    assert(tiedTab.forall(_._2 != 2), "tie must resolve to centroid 1, never 2")
  }

  test("assignByTable fails loudly on zero-norm vectors and plans no nested loop") {
    val withZero = corpusDf.unionByName(
      Seq((999L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding"))
    val e = intercept[Exception](
      IvfFlat.assignByTable(withZero, centTableDf(cents)).select("cluster").collect())
    assert(e.getMessage.contains("ivf_flat") ||
      Option(e.getCause).exists(_.getMessage.contains("ivf_flat")), e.getMessage)
    // the model reaches the corpus via a 1-row broadcast HASH join (const
    // key) — the nested-loop operator the plan pins forbid must not appear
    val plan = IvfFlat.assignByTable(corpusDf, centTableDf(cents))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }

  test("probe returns exactly the brute-force top-k within the probed clusters") {
    val nprobe = 3; val k = 5
    val assigned = IvfFlat.assign(corpusDf, cents)
    val probeIds = Seq(50L, 55L)
    val probes = corpusDf.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val got = IvfFlat.probe(assigned, probes, cents, nprobe, k)
      .select("probe_id", "cand_id", "rk").as[(Long, Long, Int)]
      .collect().groupBy(_._1).map { case (p, rows) =>
        p -> rows.sortBy(_._3).map(_._2).toSeq
      }

    val byId = corpus.toMap
    val clusterOf = corpus.map { case (id, v) => id -> bruteAssign(v) }.toMap
    probeIds.foreach { p =>
      val pv = byId(p)
      // nprobe nearest centroids, ties → lowest id — mirrors the operator
      val probed = cents.zipWithIndex
        .map { case (c, i) => (cos(pv, c), i + 1) }
        .sortBy { case (c, i) => (-c, i) }.take(nprobe).map(_._2).toSet
      val expect = corpus
        .filter { case (id, _) => id != p && probed.contains(clusterOf(id)) }
        .map { case (id, v) => (cos(pv, v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(k).map(_._2)
      assert(got(p) == expect, s"probe $p")
    }
  }

  /** 3 planted direction clusters in 8 dims: axis + deterministic jitter. */
  private def planted(perCluster: Int, jitter: Float, seed: Long): Seq[(Long, Int, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    val axes = Seq(0, 3, 6)
    for {
      (axis, g) <- axes.zipWithIndex
      j <- 0 until perCluster
    } yield {
      val v = Array.fill(8)(rng.nextFloat() * 2f - 1f).map(_ * jitter)
      v(axis) += 1.0f
      ((g * perCluster + j).toLong, g, v)
    }
  }

  test("train refines centroids: fit to planted clusters improves, partition preserved") {
    val pts = planted(perCluster = 20, jitter = 0.3f, seed = 11)
    val df = pts.map(p => (p._1, p._3)).toDF("vec_id", "embedding")
    // init = one (jittered, off-axis) member of each planted group
    val init = Seq(pts(0)._3, pts(20)._3, pts(40)._3)
    val trained = IvfFlat.train(df, init, iters = 5)

    def meanFit(cs: Seq[Array[Float]]): Double = {
      val asg = IvfFlat.assign(df, cs).select("vec_id", "cluster")
        .as[(Long, Int)].collect().toMap
      pts.map(p => cos(p._3, cs(asg(p._1) - 1))).sum / pts.size
    }
    assert(meanFit(trained) > meanFit(init) + 1e-4,
      s"training must tighten the mean member→centroid cosine: " +
        s"init=${meanFit(init)} trained=${meanFit(trained)}")

    // members of each planted group all land in one cluster, groups apart
    val asg = IvfFlat.assign(df, trained).select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap
    val byGroup = pts.groupBy(_._2).map { case (g, ps) =>
      g -> ps.map(p => asg(p._1)).toSet
    }
    assert(byGroup.values.forall(_.size == 1), s"split groups: $byGroup")
    assert(byGroup.values.flatten.toSet.size == 3, s"merged groups: $byGroup")
  }

  test("train is a pure function of the data — identical centroids under any partitioning") {
    val pts = planted(perCluster = 20, jitter = 0.3f, seed = 17)
    val df = pts.map(p => (p._1, p._3)).toDF("vec_id", "embedding")
    val init = Seq(pts(0)._3, pts(20)._3, pts(40)._3)
    // double accumulation would make these differ (non-associative float
    // adds meet different partition/row orders); fixed-point must not
    val a = IvfFlat.train(df.repartition(2), init, iters = 3)
    val b = IvfFlat.train(df.repartition(13), init, iters = 3)
    assert(a.map(_.toSeq) == b.map(_.toSeq),
      "trained centroids depend on the partition layout")
  }

  test("train keeps an emptied cluster's previous centroid verbatim") {
    val pts = planted(perCluster = 10, jitter = 0.1f, seed = 13).filter(_._2 < 2)
    val df = pts.map(p => (p._1, p._3)).toDF("vec_id", "embedding")
    val dead = Array.fill(8)(-1.0f) // opposite every planted direction
    val init = Seq(pts(0)._3, pts(10)._3, dead)
    val trained = IvfFlat.train(df, init, iters = 3)
    assert(trained(2).toSeq == dead.toSeq,
      "a cluster that captures no vectors must keep its centroid, not zero out")
  }

  test("probe plan broadcasts the probe side — no corpus shuffle join, no cartesian") {
    val assigned = IvfFlat.assign(corpusDf, cents)
    val probes = corpusDf.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val plan = IvfFlat.probe(assigned, probes, cents, nprobe = 2, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("probeByTable agrees with probe row-for-row, including centroid ties") {
    val nprobe = 3; val k = 5
    val assigned = IvfFlat.assign(corpusDf, cents)
    val probes = corpusDf.filter(col("vec_id").isin(50L, 55L))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "cand_id", "cluster", "cosine", "rk")
      .as[(Long, Long, Int, Double, Int)].collect().sortBy(r => (r._1, r._5)).toSeq
    val literal = rows(IvfFlat.probe(assigned, probes, cents, nprobe, k))
    val tabled = rows(IvfFlat.probeByTable(assigned, probes, centTableDf(cents), nprobe, k))
    assert(tabled == literal)
    // duplicate centroids: the nprobe ranking must break the cosine tie
    // to the lowest cent_id exactly like the literal path
    val dup = Seq(cents.head, cents.head, cents(1))
    val asgDup = IvfFlat.assign(corpusDf, dup)
    val litDup = rows(IvfFlat.probe(asgDup, probes, dup, nprobe = 2, k))
    val tabDup = rows(IvfFlat.probeByTable(asgDup, probes, centTableDf(dup), nprobe = 2, k))
    assert(tabDup == litDup)
  }

  test("probeByTable plans broadcast hash joins only — model and probe list") {
    val assigned = IvfFlat.assign(corpusDf, cents)
    val probes = corpusDf.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val plan = IvfFlat.probeByTable(assigned, probes, centTableDf(cents),
        nprobe = 2, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("IVFADC with a full-coverage shortlist equals IVF-Flat exactly") {
    // when the ADC shortlist covers every candidate, the exact re-rank
    // sees the same set IvfFlat.probe scores — results must be identical
    val subDim = 4 // 16-dim vectors → M=4 subspaces
    val codebooks = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    val assigned = IvfFlat.assign(corpusDf, cents)
    val encoded = graft.operators.PqAdc.encode(assigned, codebooks, subDim)
    val probes = corpusDf.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val adc = graft.operators.PqAdc.search(encoded, probes, cents, codebooks,
        subDim, nprobe = 3, shortlist = corpus.size, k = 5)
      .select("probe_id", "cand_id", "cluster", "cosine", "rk")
      .collect().map(_.toSeq).toSet
    val flat = IvfFlat.probe(assigned, probes, cents, nprobe = 3, k = 5)
      .select("probe_id", "cand_id", "cluster", "cosine", "rk")
      .collect().map(_.toSeq).toSet
    assert(flat.nonEmpty)
    assert(adc == flat, s"adc=$adc\nflat=$flat")
  }

  test("residual IVFADC with a full-coverage shortlist equals IVF-Flat exactly") {
    // residual codes change the SHORTLIST ranking only; with every
    // candidate surviving it, the exact re-rank must reproduce IVF-Flat
    val subDim = 4
    val codebooks = (0 until dim / subDim).map { m =>
      // residual codebooks: codeword = (seed - its nearest centroid) slice
      cents.take(4).map { c =>
        val cl = bruteAssign(c) - 1
        Array.tabulate(subDim)(i =>
          c(m * subDim + i).toDouble - cents(cl)(m * subDim + i).toDouble)
      }.toSeq
    }
    val assigned = IvfFlat.assign(corpusDf, cents)
    val encoded = graft.operators.PqAdc.encodeResidual(assigned, cents, codebooks, subDim)
    val probes = corpusDf.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val adc = graft.operators.PqAdc.searchResidual(encoded, probes, cents, codebooks,
        subDim, nprobe = 3, shortlist = corpus.size, k = 5)
      .select("probe_id", "cand_id", "cluster", "cosine", "rk")
      .collect().map(_.toSeq).toSet
    val flat = IvfFlat.probe(assigned, probes, cents, nprobe = 3, k = 5)
      .select("probe_id", "cand_id", "cluster", "cosine", "rk")
      .collect().map(_.toSeq).toSet
    assert(flat.nonEmpty)
    assert(adc == flat, s"adc=$adc\nflat=$flat")
  }

  test("searchDual legs are row-identical to search/searchResidual; fetch matches probedClusters") {
    // the r16 one-fetch rewire (q181): both variants and the candidate
    // census must be EXACTLY what the single-variant searches produce
    val subDim = 4
    val cbD = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    val cbR = (0 until dim / subDim).map { m =>
      cents.take(4).map { c =>
        val cl = bruteAssign(c) - 1
        Array.tabulate(subDim)(i =>
          c(m * subDim + i).toDouble - cents(cl)(m * subDim + i).toDouble)
      }.toSeq
    }
    val assigned = IvfFlat.assign(corpusDf, cents)
    val encD = graft.operators.PqAdc.encode(assigned, cbD, subDim)
    val encR = graft.operators.PqAdc.encodeResidual(assigned, cents, cbR, subDim)
    val encBoth = graft.operators.PqAdc.encodeResidual(
        graft.operators.PqAdc.encode(assigned, cbD, subDim)
          .withColumnRenamed("codes", "codes_d"),
        cents, cbR, subDim)
      .withColumnRenamed("codes", "codes_r")
    val probes = corpusDf.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val (np, sl, k) = (3, 7, 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "cand_id", "cluster", "adc_e9", "cosine", "rk")
      .as[(Long, Long, Int, Long, Double, Int)]
      .collect().sortBy(r => (r._1, r._6)).toSeq
    val (dualD, dualR, cand) = graft.operators.PqAdc.searchDual(
      encBoth, probes, cents, cbD, cbR, subDim, np, sl, k)
    assert(rows(dualD) ==
      rows(graft.operators.PqAdc.search(encD, probes, cents, cbD, subDim, np, sl, k)))
    assert(rows(dualR) ==
      rows(graft.operators.PqAdc.searchResidual(encR, probes, cents, cbR, subDim, np, sl, k)))
    // the cost relation = the probedClusters-derived fetch q181 used to
    // pay a third broadcast join for
    val probed = IvfFlat.probedClusters(probes, cents, maxRank = np)
      .select(col("probe_id"), col("__cent_id"))
    val expected = assigned
      .join(org.apache.spark.sql.functions.broadcast(probed),
        col("cluster") === col("__cent_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id", "cluster")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(cand.select("probe_id", "vec_id", "cluster")
      .as[(Long, Long, Int)].collect().sorted.toSeq == expected)
    assert(expected.nonEmpty)
  }

  test("PQ encode fails loudly on dim-mismatched vectors") {
    val subDim = 4
    val codebooks = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    val short = corpusDf.unionByName(
      Seq((999L, Array.fill(dim - 3)(0.5f))).toDF("vec_id", "embedding"))
    // consume codes — pruning the projection would prune the guard too
    val e = intercept[Exception](
      graft.operators.PqAdc.encode(short, codebooks, subDim)
        .select("codes").collect())
    assert(e.getMessage.contains("pq_adc") ||
      Option(e.getCause).exists(_.getMessage.contains("pq_adc")), e.getMessage)
  }

  test("PQ encode fails loudly on a vector with a NULL element, never fabricating a code") {
    val subDim = 4
    val codebooks = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    // correctly-SIZED vector with one null slot: the size guard passes
    // (the kernel NULLs the codes — ArrayData would read a null float
    // slot as 0.0 and encode a corrupted vector with plausible codes),
    // and encode's coalesce must turn that NULL into a raise: NULL
    // codes downstream sort FIRST in the ascending ADC scan, poisoning
    // the shortlist with exactly the rows that should have failed
    val holed = Seq((998L,
      (0 until dim).map(i => if (i == 5) null
        else java.lang.Float.valueOf(0.25f)))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      graft.operators.PqAdc.encode(
          corpusDf.limit(1).unionByName(holed), codebooks, subDim)
        .select("vec_id", "codes").collect())
    assert(e.getMessage.contains("NULL element") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL element")), e.getMessage)
    // intact vectors still encode (the coalesce is pass-through for them)
    val ok = graft.operators.PqAdc.encode(corpusDf, codebooks, subDim)
      .select("codes").collect()
    assert(ok.nonEmpty && ok.forall(!_.isNullAt(0)), "intact vectors must encode")
  }

  test("residual PQ encode fails loudly on dim-mismatched vectors") {
    val subDim = 4
    val codebooks = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    // cluster supplied by hand — an index re-loaded from parquet, so
    // IvfFlat.assign's own guard never ran; the residual zip_with would
    // null-pad the short vector to full centroid length, which slips
    // past encode's size check unless encodeResidual guards the RAW vec
    val shortAssigned = Seq((999L, Array.fill(dim - 3)(0.5f), 1))
      .toDF("vec_id", "embedding", "cluster")
    val e = intercept[Exception](
      graft.operators.PqAdc.encodeResidual(shortAssigned, cents, codebooks, subDim)
        .select("codes").collect())
    assert(e.getMessage.contains("pq_adc") ||
      Option(e.getCause).exists(_.getMessage.contains("pq_adc")), e.getMessage)
  }

  test("IVFADC search fails loudly on a dim-mismatched probe vector") {
    // without the probe guard every LUT entry and re-rank cosine goes
    // NULL and the caller silently receives k lowest-id rows
    val subDim = 4
    val codebooks = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    val assigned = IvfFlat.assign(corpusDf, cents)
    val direct = graft.operators.PqAdc.encode(assigned, codebooks, subDim)
    val badProbes = Seq((7L, Array.fill(dim - 1)(0.1f))).toDF("probe_id", "pv")
    val e1 = intercept[Exception](
      graft.operators.PqAdc.search(direct, badProbes, cents, codebooks,
        subDim, nprobe = 2, shortlist = 5, k = 5).collect())
    assert(e1.getMessage.contains("pq_adc") ||
      Option(e1.getCause).exists(_.getMessage.contains("pq_adc")), e1.getMessage)
    val residual = graft.operators.PqAdc.encodeResidual(assigned, cents, codebooks, subDim)
    val e2 = intercept[Exception](
      graft.operators.PqAdc.searchResidual(residual, badProbes, cents, codebooks,
        subDim, nprobe = 2, shortlist = 5, k = 5).collect())
    assert(e2.getMessage.contains("pq_adc") ||
      Option(e2.getCause).exists(_.getMessage.contains("pq_adc")), e2.getMessage)
  }

  test("IVFADC shortlist prunes by ADC distance but never below k results") {
    val subDim = 4
    val codebooks = (0 until dim / subDim).map(m =>
      cents.take(4).map(c => c.slice(m * subDim, (m + 1) * subDim).map(_.toDouble)).toSeq)
    val assigned = IvfFlat.assign(corpusDf, cents)
    val encoded = graft.operators.PqAdc.encode(assigned, codebooks, subDim)
    val probes = corpusDf.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val res = graft.operators.PqAdc.search(encoded, probes, cents, codebooks,
        subDim, nprobe = 8, shortlist = 5, k = 5).collect()
    val byProbe = res.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 3)
    byProbe.foreach { case (p, rs) =>
      assert(rs.length == 5, s"probe $p returned ${rs.length} of k=5")
      val rks = rs.map(_.getAs[Int]("rk")).sorted.toSeq
      assert(rks == (1 to 5), s"probe $p ranks $rks")
    }
  }
}
