package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point distributed PageRank — link analysis over a document
  * graph (crawl-frontier prioritization, duplicate-cluster authority
  * selection: when a near-dup cluster must pick a canonical copy, the
  * most-linked one usually is the original).
  *
  * All arithmetic is INTEGER fixed-point in millionths: ranks start at
  * 1_000_000, each iteration assigns
  * `base + (dampNum × Σ_in (rank div outdeg)) div 100` — integer sums
  * are order-independent, so the result is deterministic at any
  * partitioning AND bit-identical across engines (a float PageRank
  * differs in ulps by partial-agg merge order, which would break the
  * oracle hash gate; truncating `div` matches DuckDB's `//` on
  * non-negative operands).
  *
  * Scale design: the canonical iterative-join formulation — each
  * iteration is one equi-join of the edge table with the current ranks
  * on src (shuffle keyed by src) and one partial-aggregated groupBy on
  * dst. The rank relation is node-sized, localCheckpointed per
  * iteration so lineage stays flat (the same GC-scoped pattern as the
  * LSH/CC operators); edges are re-scanned per iteration, which at
  * 100 TB is what a pre-bucketed edge layout (bucketBy src) makes
  * shuffle-free. Dangling-mass redistribution is deliberately omitted:
  * the synthetic corpus graph gives every node out-links, and at
  * production scale the standard fix (one scalar aggregate per
  * iteration) composes without changing the join shape.
  */
object PageRank {

  /** Ranks in millionths after `iters` iterations over `edges(src, dst)`.
    * `nodes(node)` fixes the vertex set (nodes with no in-links keep the
    * base rank; nodes absent from `edges.src` contribute nothing). */
  def ranks(edges: DataFrame, nodes: DataFrame, iters: Int,
            dampNum: Long = 85L, baseU: Long = 150000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // LAZY checkpoints here and per iteration below: no action runs inside
    // the loop, so the final job materializes each iteration's RDD as it
    // is first computed. Lineage DEPTH therefore grows with `iters` until
    // that first action — fine for the small fixed iteration counts this
    // engine uses (≤ ~10); a caller looping hundreds of iterations should
    // eagerly checkpoint every N rounds to bound scheduler/lineage cost.
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false) // node-sized, reused every iteration
    var r = nodes.select(col("node"), lit(1000000L).as("rank"))
      .localCheckpoint(false)
    (1 to iters).foreach { _ =>
      // rank div outdeg is a per-NODE value: computing it on the
      // node-sized (rank ⋈ outdeg) relation first means the edge-sized
      // relation crosses ONE join, not two — the previous shape pushed
      // the edge-sized (e ⋈ r) intermediate through a second join with
      // outdeg (same integer result, one full edge-width pass more)
      val rates = r.join(outdeg, r("node") === outdeg("src"))
        .select(col("src"), expr("rank div outdeg").as("c"))
      val contrib = e
        .join(rates, "src")
        .groupBy("dst").agg(sum("c").as("s"))
      r = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(baseU) + expr(s"($dampNum * coalesce(s, 0L)) div 100"))
            .as("rank"))
        .localCheckpoint(false)
    }
    r
  }
}
