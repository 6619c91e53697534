package graft

import org.apache.spark.sql.functions._
import graft.operators.AnnLsh

class AnnLshSpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim vector from 4 sign blocks of 16 ('A' = +1s, 'B' = -1s). */
  private def vec(blocks: String): Array[Float] =
    blocks.toSeq.flatMap {
      case 'A' => Array.fill(16)(1.0f).toSeq
      case _   => Array.fill(16)(-1.0f).toSeq
    }.toArray

  private def emb(rows: Seq[(Long, String)]) =
    rows.map { case (id, b) => (id, vec(b)) }.toDF("vec_id", "embedding")

  test("pairs collide per-table on disjoint dim blocks; n_tables counts tables") {
    val e = emb(Seq(1L -> "AAAA", 2L -> "AAAA", 3L -> "BABB", 4L -> "BBBB"))
    val got = AnnLsh.candidates(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,2): all four blocks equal; (1,3)/(2,3): block 2 only;
    // (3,4): blocks 1,3,4; (1,4)/(2,4): none.
    assert(got == Set((1L, 2L, 4L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 3L)))
  }

  test("oversized buckets are dropped before pairing") {
    // 10 identical-sign vectors → every table has one 10-member bucket.
    val e = emb((1L to 10L).map(_ -> "AAAA"))
    assert(AnnLsh.candidates(e, maxBucket = 5).count() == 0)
    assert(AnnLsh.candidates(e, maxBucket = 10).count() == 45)
  }

  test("short or NULL embeddings fail loudly instead of corrupting buckets") {
    val short = Seq((1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](AnnLsh.candidates(short).count())
    assert(e.getMessage.contains("ann_lsh") ||
      Option(e.getCause).exists(_.getMessage.contains("ann_lsh")), e.getMessage)
    val withNull = emb(Seq(1L -> "AAAA", 2L -> "AAAA"))
      .unionByName(Seq((3L, null: Array[Float])).toDF("vec_id", "embedding"))
    intercept[Exception](AnnLsh.candidates(withNull).count())
  }

  test("cross-set candidates: probe side uncapped, corpus cap enforced") {
    val corpus = emb(Seq(1L -> "AAAA", 2L -> "AAAA", 3L -> "BBBB", 4L -> "ABBB"))
    val probes = emb(Seq(100L -> "AAAA", 101L -> "BBBB"))
    val got = AnnLsh.candidatesAcross(corpus, probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1,2 match probe 100 in all 4 tables; 3 matches 101 in all 4;
    // 4 matches 101 on blocks 2-4 and 100 on block 1.
    assert(got == Set((1L, 100L, 4L), (2L, 100L, 4L), (3L, 101L, 4L),
      (4L, 101L, 3L), (4L, 100L, 1L)))
    // corpus-side hub bucket dropped: 10 identical corpus vecs over cap…
    val hub = emb((1L to 10L).map(_ -> "AAAA"))
    assert(AnnLsh.candidatesAcross(hub, probes, maxBucket = 5).count() == 0)
    // …but a "hub" on the probe side never drops the callers' queries
    val probeHub = emb((100L to 109L).map(_ -> "AAAA"))
    assert(AnnLsh.candidatesAcross(emb(Seq(1L -> "AAAA")), probeHub,
      maxBucket = 5).count() == 10)
  }

  test("cross-set candidates drop self-pairs on overlapping id spaces") {
    // screening a corpus slice against itself (overlapping ids) must not
    // report (x, x) as a perfect 4-table hit
    val both = emb(Seq(1L -> "AAAA", 2L -> "AAAA"))
    val got = AnnLsh.candidatesAcross(both, both)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L)), s"self-pairs must be gone: $got")
  }

  test("candidate plan has no cartesian product") {
    val e = emb(Seq(1L -> "AAAA", 2L -> "ABAB"))
    val plan = AnnLsh.candidates(e).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }
}
