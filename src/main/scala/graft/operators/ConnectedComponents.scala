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
    * Telemetry: rounds-to-converge and the per-round edge count are
    * logged at INFO (`connected-components round k: n edges`) — on a
    * real cluster a round count creeping toward `maxIter`, or an edge
    * count that stops shrinking, is the first sign of a pathological
    * component long before the loud non-convergence failure fires. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
            maxIter: Int = 25): DataFrame = {
    // localCheckpoint (not persist): each round derives from the last, so
    // an uncut LINEAGE doubles per iteration and the planner itself OOMs
    // long before the data does — truncating the plan per round is the
    // standard contract for iterative DataFrame algorithms.
    var e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

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
        .localCheckpoint(true)

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
        .localCheckpoint(true)

      val (conv, edgeCount) = starForestProbe(ss)
      converged = conv
      e = ss
      iter += 1
      if (log.isInfoEnabled)
        log.info(s"connected-components round $iter: $edgeCount edges" +
          (if (converged) " (converged)" else ""))
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
