package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHashLsh

class MinHashLshSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built signature rows: (id, mh1, mh2, mh3, mh4). */
  private def sigsDf(rows: Seq[(Long, String, String, String, String)]) =
    rows.toDF("doc_id", "mh1", "mh2", "mh3", "mh4")

  test("boilerplate mega-bucket is dropped before pairing (bounded fan-out)") {
    // 100 docs share band 1 (identical mh1+mh2 — one common boilerplate
    // min-shingle pair); docs 0 and 1 additionally share band 2.
    val rows = (0L until 100L).map { i =>
      val (m3, m4) = if (i <= 1) ("cafe0003", "cafe0004") else (f"u$i%07d", f"v$i%07d")
      (i, "boilerpl", "atehash1", m3, m4)
    }
    val cand = MinHashLsh.candidates(sigsDf(rows), maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // band-1 bucket has 100 members > cap → contributes ZERO pairs; the
    // only candidate comes from the small band-2 bucket, and its score
    // counts all four component agreements.
    assert(cand.toSeq == Seq((0L, 1L, 4)))
  }

  test("uncapped, the same bucket pairs quadratically — the cap is load-bearing") {
    val rows = (0L until 100L).map { i =>
      val (m3, m4) = if (i <= 1) ("cafe0003", "cafe0004") else (f"u$i%07d", f"v$i%07d")
      (i, "boilerpl", "atehash1", m3, m4)
    }
    val n = MinHashLsh.candidates(sigsDf(rows), maxBucket = 1000).count()
    assert(n == 100L * 99 / 2) // pair (0,1) dedups across its two bands
  }

  test("pairs agreeing on either band are found and deduped across bands") {
    val rows = Seq(
      (1L, "aaaaaaaa", "bbbbbbbb", "cccccccc", "dddddddd"),
      (2L, "aaaaaaaa", "bbbbbbbb", "eeeeeeee", "ffffffff"), // band 1 only
      (3L, "gggggggg", "hhhhhhhh", "cccccccc", "dddddddd"), // band 2 with 1
      (4L, "zzzzzzzz", "yyyyyyyy", "xxxxxxxx", "wwwwwwww")) // isolated
    val cand = MinHashLsh.candidates(sigsDf(rows), maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cand == Set((1L, 2L, 2), (1L, 3L, 2)))
  }

  test("candidatesAcross = full candidates restricted to cross pairs (uncapped)") {
    // split a corpus: even ids are the "new batch", odd the stored index;
    // with no cap interference, probing the index must find exactly the
    // cross-set slice of what a full re-pair would
    val rows = (0L until 30L).map { i =>
      val bucket = i % 5 // 6 docs per band-1 bucket → cross + within pairs
      (i, f"aa$bucket%06d", f"bb$bucket%06d", f"u$i%07d", f"v$i%07d")
    }
    val all = sigsDf(rows)
    val newS = all.filter($"doc_id" % 2 === 0)
    val idxS = all.filter($"doc_id" % 2 =!= 0)
    val across = MinHashLsh.candidatesAcross(newS, idxS, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = MinHashLsh.candidates(all, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) }
      // reorient (doc_a < doc_b) → (probe=even, index=odd)
      .map { case (a, b, s) => if (a % 2 == 0) (a, b, s) else (b, a, s) }.toSet
    assert(across == full, s"across=$across full=$full")
    assert(across.nonEmpty)
  }

  test("candidatesAcross caps index buckets only — the probe batch is never dropped") {
    // one index bucket over the cap, one under; every probe shares both
    val idx = (0L until 20L).map(i => (100L + i, "hothothh", "bucketaa", f"u$i%07d", f"v$i%07d")) ++
      (0L until 3L).map(i => (200L + i, "coolcool", "bucketbb", f"w$i%07d", f"x$i%07d"))
    val probe = Seq(
      (1L, "hothothh", "bucketaa", "cccccccc", "dddddddd"), // hot bucket → dropped
      (2L, "coolcool", "bucketbb", "eeeeeeee", "ffffffff")) // cool bucket → kept
    val got = MinHashLsh.candidatesAcross(sigsDf(probe), sigsDf(idx), maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 200L), (2L, 201L), (2L, 202L)),
      s"hot-bucket probe must yield nothing, cool-bucket probe everything: $got")
  }

  test("candidatesAcross drops self-pairs when probe/index id spaces overlap") {
    // re-screening a batch against an index it was already merged into is
    // a real operational mistake; the guard keeps (x, x) "perfect dups"
    // from reaching downstream dedup, while true cross pairs survive
    val shared = Seq(
      (1L, "aaaaaaaa", "bbbbbbbb", "cccccccc", "dddddddd"),
      (2L, "aaaaaaaa", "bbbbbbbb", "eeeeeeee", "ffffffff"))
    val got = MinHashLsh.candidatesAcross(sigsDf(shared), sigsDf(shared))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L)), s"self-pairs must be gone: $got")
  }

  test("signatures skip empty and single-token docs without crashing") {
    val docs = Seq(
      (1L, "one"),                 // single token → sequence guard path
      (2L, ""),                    // empty text
      (3L, "two words here"),
      (4L, "two words here")).toDF("doc_id", "text")
    val sigs = MinHashLsh.signatures(docs)
    assert(sigs.select("doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    val cand = MinHashLsh.candidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(cand.toSeq == Seq((3L, 4L, 4)))
  }

  test("candidate plan has no cartesian product and no single-component band join") {
    val sigs = sigsDf(Seq((1L, "a1a1a1a1", "b2b2b2b2", "c3c3c3c3", "d4d4d4d4")))
    val plan = MinHashLsh.candidates(sigs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }
}
