package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step that turns near-dup candidate PAIRS ([[MinHashLsh]]/[[AnnLsh]])
  * into duplicate GROUPS with a canonical keeper per group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log n) rounds on any graph — unlike plain min-label
  * propagation whose round count is the graph DIAMETER (a 100M-node
  * chain would need 100M shuffles; boilerplate near-dup clusters can
  * chain badly). Each round is two groupBy-min + join passes over the
  * edge list: no driver-side graph state, nothing collected, edge count
  * never grows beyond O(E).
  *
  *   large-star: every node links its LARGER neighbors to its smallest
  *   neighbor-or-self — long tails fold toward local minima.
  *   small-star: edges oriented big→small; every node links its smaller
  *   neighbors and itself to the minimum — stars flatten to depth 1.
  *
  * Convergence is the star-forest test: the alternation's fixpoints are
  * exactly single-parent depth-1 forests (every edge child→root, one
  * root per child, roots = component minima — Kiveris et al. §3), so
  * "no node on both sides AND no child with two parents" detects the
  * fixpoint ON the round the stars form — one round earlier than
  * comparing successive edge sets for stability, which can only notice
  * a fixpoint by re-running a full (unchanged) round. Depth-1 alone is
  * NOT sufficient: a child bridging two roots still merges them next
  * round. `maxIter` bounds the worst case.
  */
object ConnectedComponents {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Returns `(node, comp)` for every node appearing in `edges`, where
    * `comp` is the smallest node id in the node's component. Self-loops
    * are ignored; edges may appear in any orientation or multiplicity.
    *
    * Two-level execution: distributed star rounds contract the edge set
    * (each round shrinks it toward one edge per non-root node); the
    * moment the CURRENT edge set fits `localSolveMaxEdges` (a fixed
    * driver budget — 4M edges ≈ 64 MB of longs, NOT data-proportional)
    * the remainder is collected and finished with union-find in O(E·α).
    * Rationale: the tail rounds of any O(log n) contraction run on tiny
    * data where per-round shuffle+checkpoint latency dominates — at 100
    * TB the first rounds do the real work and still run distributed;
    * the hybrid only replaces the last few latency-bound rounds. The
    * same trick is standard in MapReduce CC practice (finish small
    * residual graphs in one reducer, cf. Kiveris et al. §6 scaling
    * discussion). `localSolveMaxEdges = 0` forces the pure distributed
    * path (specs pin both paths to identical output).
    *
    * Telemetry: rounds-to-converge and the per-round edge count are
    * logged at INFO (`connected-components round k: n edges`) — on a
    * real cluster a round count creeping toward `maxIter`, or an edge
    * count that stops shrinking, is the first sign of a pathological
    * component long before the loud non-convergence failure fires. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
            maxIter: Int = 25, localSolveMaxEdges: Long = 4000000L): DataFrame = {
    // localCheckpoint (not persist): each round derives from the last, so
    // an uncut LINEAGE doubles per iteration and the planner itself OOMs
    // long before the data does — truncating the plan per round is the
    // standard contract for iterative DataFrame algorithms.
    var e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)

    val spark = e.sparkSession

    /** Finish a ≤`localSolveMaxEdges` edge set with union-find (attach
      * the larger root under the smaller, so every tree root IS the
      * component minimum; path compression on `find`). The collect is
      * bounded by the fixed budget — it never grows with input size,
      * because the caller only routes here once the (contracting) edge
      * set is provably under the cap. */
    def localSolve(df: DataFrame): DataFrame = {
      val es = df.select(col("u"), col("v")).collect()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(a: Long): Long = {
        var x = a
        var p = parent.getOrElse(x, x)
        while (p != x) {
          val gp = parent.getOrElse(p, p)
          parent.update(x, gp)
          x = gp
          p = parent.getOrElse(x, x)
        }
        x
      }
      es.foreach { r =>
        val u = r.getLong(0); val v = r.getLong(1)
        val ru = find(u); val rv = find(v)
        if (ru != rv) {
          if (ru < rv) parent.update(rv, ru) else parent.update(ru, rv)
        }
      }
      val nodes = scala.collection.mutable.LongMap.empty[Boolean]
      es.foreach { r => nodes.update(r.getLong(0), true); nodes.update(r.getLong(1), true) }
      val out = nodes.keysIterator.map(n => (n, find(n))).toSeq
      if (log.isInfoEnabled)
        log.info(s"connected-components local finish: ${es.length} edges, ${out.size} nodes")
      spark.createDataFrame(out).toDF("node", "comp")
    }

    /** Fixpoint ⟺ star forest, which needs BOTH properties: (a) no node
      * appears as child and parent (depth 1), and (b) every child has
      * exactly ONE parent — {(3,1),(3,2)} is depth-1 but one more round
      * merges roots 1 and 2, so testing (a) alone declares victory on a
      * still-splittable component. Returns (converged, edgeCount) from a
      * SINGLE aggregation job over the just-checkpointed round output —
      * Σ __nc counts every edge's child-side row, so the telemetry edge
      * count rides on the probe for free instead of a second count() job
      * per round. */
    def starForestProbe(df: DataFrame): (Boolean, Long) = {
      val row = df.select(col("u"), lit(1L).as("__c"))
        .unionByName(df.select(col("v").as("u"), lit(0L).as("__c")))
        .groupBy("u")
        .agg(sum("__c").as("__nc"), count(lit(1)).as("__nt"))
        .agg(
          // __nc > 1: child with two parents; 0 < __nc < __nt: both sides
          coalesce(sum(when(
            col("__nc") > 1 || (col("__nc") >= 1 && col("__nt") > col("__nc")),
            1L).otherwise(0L)), lit(0L)).as("__viol"),
          coalesce(sum(col("__nc")), lit(0L)).as("__edges"))
        .head()
      (row.getLong(0) == 0L, row.getLong(1))
    }

    // Route small inputs straight to the local finish: one count on the
    // just-checkpointed normalized edges replaces the whole round loop.
    if (localSolveMaxEdges > 0 && e.count() <= localSolveMaxEdges)
      return localSolve(e)

    var iter = 0
    var converged = starForestProbe(e)._1
    while (iter < maxIter && !converged) {
      // ── large-star: symmetrize; m(u) = min(N(u) ∪ {u}); for every
      // neighbor v > u emit (v, m). ──
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // checkpointed: consumed twice below (small-star min + emit join)
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)

      // ── small-star: edges already oriented u > v; m(u) = min(N(u) ∪
      // {u}) over the smaller neighbors; link every smaller neighbor and
      // u itself to m. ──
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ss = ls.join(mins2, "u")
        .select(col("v").as("n"), col("m"))
        .unionByName(mins2.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
        .distinct()
        .localCheckpoint(false)

      val (conv, edgeCount) = starForestProbe(ss)
      converged = conv
      e = ss
      iter += 1
      if (log.isInfoEnabled)
        log.info(s"connected-components round $iter: $edgeCount edges" +
          (if (converged) " (converged)" else ""))
      // Contraction shrinks the edge set round over round; the moment it
      // fits the driver budget, the remaining latency-bound tail rounds
      // are one union-find. (The star rounds preserve the node set — a
      // node is either a local minimum or someone's larger neighbor — so
      // the residual graph still carries every original node.)
      if (!converged && localSolveMaxEdges > 0 && edgeCount <= localSolveMaxEdges)
        return localSolve(e)
    }
    // a silently-unconverged result would mislabel components downstream
    // (dedup would keep multiple "keepers" per true group) — fail loudly.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds " +
        "(alternating stars need ~2·log2(n); raise maxIter)")

    // At the fixpoint every edge is (node → its component minimum); the
    // minima themselves are their own component.
    val roots = e.select(col("v").as("node")).distinct()
      .join(e.select(col("u").as("node")).distinct(), Seq("node"), "left_anti")
    e.select(col("u").as("node"), col("v").as("comp"))
      .unionByName(roots.select(col("node"), col("node").as("comp")))
      .distinct()
  }
}
