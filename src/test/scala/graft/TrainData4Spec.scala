package graft

/** Semantic pins for the q177 nprobe↔recall Pareto sweep — the
  * invariants the DuckDB hash gate can't state directly. */
class TrainData4Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val rows = SparkEntry.queries("q177_nprobe_pareto")(spark, dir)
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

  test("q177: the adopted operating point (nprobe=12) clears recall >= 0.9") {
    val (np, _, hits) = rows.last
    assert(np == 12, s"widest sweep point is $np, expected 12")
    assert(hits >= 45, s"recall ${hits}/50 at nprobe=12 is below the 0.9 gate")
  }

  test("q177: recall and probe cost are both monotone in nprobe") {
    // recall can only grow as more clusters are scanned (candidate sets
    // are nested), and the candidate cost must strictly grow — a
    // violation means the fan-out or the rank cut is wrong
    val hits = rows.map(_._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${hits.toSeq}")
    val cost = rows.map(_._2)
    assert(cost.zip(cost.tail).forall { case (a, b) => a < b },
      s"cost not strictly increasing: ${cost.toSeq}")
  }

  test("q177: the nprobe=2 point confirms the coarse ceiling is a parameter, not physics") {
    // the q80 family's 'ceiling' was nprobe=2 on a 4-cluster quantizer
    // (half the corpus); nprobe=2 of 16 scans ~1/8 and recalls LESS —
    // the sweep shows recall is bought with scanned candidates, which
    // is exactly the tradeoff the gated table exists to measure
    val byNp = rows.map(t => t._1 -> t._3).toMap
    assert(byNp(2) < byNp(12), s"sweep shows no recall/cost tradeoff: $byNp")
  }

  test("q177: candidate cost never exceeds the full-corpus bound") {
    // candidates at the widest point are at most probes × (corpus − 1)
    val corpus = graft.engine.Tables.embeddings(spark, dir).count()
    val (_, widestCost, _) = rows.last
    assert(widestCost <= 5 * (corpus - 1),
      s"cost $widestCost exceeds 5×(${corpus}−1)")
  }
}
