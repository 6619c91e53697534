package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{AsofJoin, IntervalJoin}

/** Randomized equivalence: the scalable as-of and interval join operators
  * must agree with brute-force reference implementations on arbitrary
  * key/time layouts (duplicate left timestamps, empty keys, boundary
  * collisions included). */
class OperatorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(1234L + i)))

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private val asofGen = for {
    lefts <- Gen.listOfN(25, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 100L)
    } yield (k, t))
    rights <- Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      t <- Gen.choose(0L, 100L)
    } yield (k, t))
  } yield (lefts, rights)

  test("asof join equals brute force on random layouts") {
    samples(asofGen, 8).foreach { case (lefts, rights) =>
      // dedup right per (key, time) as the operator contract requires
      val rightsD = rights.groupBy(identity).keys.toSeq
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "t", "lid")
      val r = rightsD.map { case (k, t, rid) => (k, ts(t), rid) }
        .toDF("k", "rt", "rid")
      val got = AsofJoin(l, r, "k", "t", "rt", Seq("rid"))
        .collect()
        .map(row => row.getLong(row.fieldIndex("lid")) ->
          (if (row.isNullAt(row.fieldIndex("rid"))) None
           else Some(row.getLong(row.fieldIndex("rid"))))).toMap
      val want = lefts.zipWithIndex.map { case ((k, t), i) =>
        val cands = rightsD.filter(x => x._1 == k && x._2 <= t)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(x => (x._2, x._3))._3))
      }.toMap
      // where several right rows share the max time the operator may pick
      // any of them (contract: caller pre-dedups per key+time); compare on
      // the matched TIME instead of id for those
      val timeOf = rightsD.map(x => x._3 -> x._2).toMap
      got.keys.foreach { lid =>
        (got(lid), want(lid)) match {
          case (None, None) =>
          case (Some(g), Some(w)) => assert(timeOf(g) == timeOf(w),
            s"lid=$lid got rid=$g@${timeOf(g)} want rid=$w@${timeOf(w)}")
          case other => fail(s"lid=$lid mismatch: $other")
        }
      }
    }
  }

  private val intervalGen = for {
    points <- Gen.listOfN(20, for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0L, 200L)
    } yield (k, t))
    wins <- Gen.listOfN(8, for {
      k <- Gen.oneOf("a", "b", "c")
      s <- Gen.choose(0L, 180L)
      len <- Gen.choose(1L, 60L)
    } yield (k, s, s + len))
  } yield (points, wins)

  test("interval join equals brute force on random layouts") {
    samples(intervalGen, 8).foreach { case (points, wins) =>
      val l = points.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "t", "pid")
      val r = wins.zipWithIndex.map { case ((k, s, e), i) => (k, ts(s), ts(e), i.toLong) }
        .toDF("k", "s", "e", "wid")
      // deliberately small bins so intervals span several buckets
      val got = IntervalJoin(l, r, "k", "t", "s", "e", binSeconds = 600)
        .select("pid", "wid").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      val want = (for {
        ((pk, pt), pi) <- points.zipWithIndex
        ((wk, ws, we), wi) <- wins.zipWithIndex
        if pk == wk && pt >= ws && pt < we
      } yield (pi.toLong, wi.toLong)).toSet
      assert(got == want)
    }
  }

  // signature components from a tiny alphabet so band collisions (and
  // oversized buckets at small caps) actually occur
  private val sigGen = Gen.listOfN(30, for {
    m1 <- Gen.oneOf("x1", "x2", "x3")
    m2 <- Gen.oneOf("y1", "y2")
    m3 <- Gen.oneOf("z1", "z2", "z3")
    m4 <- Gen.oneOf("w1", "w2")
  } yield (m1, m2, m3, m4))

  test("LSH candidates equal brute-force banded pairing, capped and uncapped") {
    import graft.operators.MinHashLsh
    samples(sigGen, 6).foreach { sigs =>
      val rows = sigs.zipWithIndex.map { case ((m1, m2, m3, m4), i) =>
        (i.toLong, m1, m2, m3, m4)
      }
      val df = rows.toDF("doc_id", "mh1", "mh2", "mh3", "mh4")
      val sigOf = rows.map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
      def brute(maxBucket: Int): Set[(Long, Long, Int)] = {
        val banded = rows.flatMap { case (id, m1, m2, m3, m4) =>
          Seq((1, m1 + m2, id), (2, m3 + m4, id)) }
        banded.groupBy(b => (b._1, b._2)).values
          .filter(_.size <= maxBucket)
          .flatMap { members =>
            val ids = members.map(_._3).sorted
            for { a <- ids; b <- ids if a < b } yield (a, b)
          }.toSet[(Long, Long)]
          .map { case (a, b) =>
            (a, b, sigOf(a).zip(sigOf(b)).count { case (x, y) => x == y })
          }
      }
      Seq(5, 1000).foreach { cap =>
        val got = MinHashLsh.candidates(df, maxBucket = cap).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == brute(cap), s"maxBucket=$cap")
      }
    }
  }

  // sparse random graphs over few nodes → a mix of chains, small cliques
  // and isolated pairs; dense enough that multi-hop components form
  private val edgeGen = Gen.listOfN(18, for {
    a <- Gen.choose(0L, 14L)
    b <- Gen.choose(0L, 14L)
  } yield (a, b))

  test("connected components: a child bridging two roots still merges them") {
    import graft.operators.ConnectedComponents
    // regression: {(1,3),(2,3)} normalizes to {(3,1),(3,2)} — depth-1
    // with disjoint child/parent sides, but NOT a fixpoint (3 has two
    // parents; roots 1 and 2 are one true component). A convergence
    // test missing the unique-parent condition returns node 3 with TWO
    // labels and splits the component.
    val got = ConnectedComponents(Seq((1L, 3L), (2L, 3L)).toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.groupBy(_._1).forall(_._2.length == 1),
      s"a node carries two component labels: ${got.toSeq}")
    assert(got.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), got.toSeq)
    // the mid-run deceptive shape: two bridged stars collapse to one
    val got2 = ConnectedComponents(
      Seq((5L, 1L), (5L, 2L), (10L, 1L), (11L, 2L)).toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L), got2)
  }

  test("connected components: a 200-node chain converges within the default budget") {
    import graft.operators.ConnectedComponents
    // the worst case for min-label propagation (O(diameter)); alternating
    // stars must close it in O(log n) rounds — well inside maxIter = 25
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = ConnectedComponents(chain.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 200 && got.forall(_._2 == 0L),
      "every chain node must label to component 0")
  }

  test("connected components equal brute-force union-find on random graphs") {
    import graft.operators.ConnectedComponents
    samples(edgeGen, 6).foreach { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      whenever(edges.nonEmpty) {
        val rows = ConnectedComponents(edges.toDF("a", "b"), "a", "b")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        // one label per node — toMap would silently collapse duplicates
        assert(rows.groupBy(_._1).forall(_._2.length == 1),
          s"duplicate component labels in ${rows.toSeq}")
        val got = rows.toMap
        // brute force union-find with min-id roots
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map(n => n -> find(n)).toMap
        assert(got == want)
      }
    }
  }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body
}
