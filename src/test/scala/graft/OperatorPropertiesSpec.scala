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
    // stars must close it in O(log n) rounds — well inside maxIter = 25.
    // localSolveMaxEdges = 0 forces the pure distributed path (the
    // default budget would route a 199-edge graph to the local finish).
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = ConnectedComponents(chain.toDF("a", "b"), "a", "b",
        localSolveMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 200 && got.forall(_._2 == 0L),
      "every chain node must label to component 0")
  }

  test("connected components: hybrid local finish equals the pure distributed path") {
    import graft.operators.ConnectedComponents
    samples(edgeGen, 4).foreach { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      whenever(edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val hybrid = ConnectedComponents(df, "a", "b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val dist = ConnectedComponents(df, "a", "b", localSolveMaxEdges = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(hybrid == dist, s"hybrid/distributed disagree on ${edges}")
      }
    }
    // mid-loop handoff: a budget below the input size runs distributed
    // rounds until contraction fits, then finishes locally — labels must
    // be identical to the full solve either way
    val chain = (0L until 60L).map(i => (i, i + 1))
    val mid = ConnectedComponents(chain.toDF("a", "b"), "a", "b",
        localSolveMaxEdges = 59L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mid.length == 61 && mid.forall(_._2 == 0L),
      s"mid-loop handoff mislabeled the chain: ${mid.toSeq.sorted.take(10)}")
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

  // ── BPE round: the relational greedy merge (gaps-and-islands) must
  // equal the textbook sequential left-to-right scan on arbitrary
  // words, including overlapping-run pathologies ("aaaa") and ties. ──

  private val bpeGen: Gen[List[(String, Long)]] = Gen.listOfN(12, for {
    len <- Gen.choose(1, 8)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    f <- Gen.choose(1L, 5L)
  } yield (cs.mkString, f)).map(_.groupBy(_._1).map {
    case (w, fs) => (w, fs.map(_._2).sum) }.toList)

  test("bpeRound equals a sequential reference BPE step on random vocabularies") {
    samples(bpeGen, 8).foreach { vocab =>
      whenever(vocab.exists(_._1.length >= 2)) {
        val syms = graft.queries.TrainData2.bpeCharSyms(vocab.toDF("w", "f"))
        val (merged, rec) = graft.queries.TrainData2.bpeRound(syms, 1)

        // reference: pair weights with overlap counting, total tie-break
        val pairW = scala.collection.mutable.Map[(String, String), Long]()
        val pairDocs = scala.collection.mutable.Map[(String, String), Set[String]]()
        vocab.foreach { case (w, f) =>
          w.sliding(2).filter(_.length == 2).foreach { p =>
            val k = (p(0).toString, p(1).toString)
            pairW(k) = pairW.getOrElse(k, 0L) + f
            pairDocs(k) = pairDocs.getOrElse(k, Set.empty) + w
          }
        }
        val (bl, br) = pairW.keys.toSeq.minBy { case (l, r) =>
          (-pairW((l, r)), l, r) }
        val r0 = rec.head
        assert((r0.getString(1), r0.getString(2)) == (bl, br))
        assert(r0.getLong(3) == pairW((bl, br)))
        assert(r0.getLong(4) == pairDocs((bl, br)).size.toLong)

        // reference: greedy left-to-right merge per word
        val want = vocab.map { case (w, _) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          val s = w.map(_.toString)
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == bl && s(i + 1) == br) {
              out += bl + br; i += 2
            } else { out += s(i); i += 1 }
          }
          w -> out.toList
        }.toMap
        val got = merged.collect()
          .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
        assert(got == want)
      }
    }
  }

  // ── Chunker: cover-all / interior-full / always-new-tokens on
  // arbitrary token counts (boundary cases n = 64, 65, 112, 113…). ──
  test("chunker covers every token exactly, interior chunks full, no pure-overlap tails") {
    val ns = Seq(1, 2, 47, 48, 63, 64, 65, 96, 111, 112, 113, 160, 161, 257)
    val docs = ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = graft.queries.TrainData2.chunked(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3).split(" ").toSeq))
      .groupBy(_._1)
    ns.zipWithIndex.foreach { case (n, i) =>
      val cs = chunks(i.toLong).sortBy(_._2).map(_._3).toSeq
      // every token appears in order, exactly covered
      assert(cs.head.head == "t1" && cs.last.last == s"t$n")
      cs.init.foreach(c => assert(c.length == 64, s"n=$n interior short"))
      // consecutive chunks: 16-token overlap when previous is full, and
      // every chunk past the first contributes at least one new token
      cs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.drop(48) == b.take(a.length - 48), s"n=$n overlap broken")
          assert(b.length > a.length - 48, s"n=$n pure-overlap tail emitted")
        case _ =>
      }
      // union of chunks == the doc's token set
      assert(cs.flatten.distinct.length == n, s"n=$n coverage gap")
    }
  }

  // ── CMS: one-sided estimates on random multisets — for every word,
  // min-over-rows cell count >= its true count (never an undercount). ──
  private val cmsGen: Gen[List[String]] = Gen.listOfN(60,
    Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))

  test("count-min never undercounts on random multisets") {
    import graft.operators.CountMin
    samples(cmsGen, 6).foreach { words =>
      val cells = CountMin.cells(words.toDF("w")).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      exact.foreach { case (w, n) =>
        val est = (0 until 4).map { j =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val cell = (Character.digit(h.charAt(2 * j), 16)) * 16 +
            Character.digit(h.charAt(2 * j + 1), 16)
          cells((j, cell))
        }.min
        assert(est >= n, s"$w undercounted: $est < $n")
      }
    }
  }

  test("bloom filter: observed FP rate within 2x theory across sizings, zero false negatives") {
    import org.apache.spark.sql.functions.{col, lit, not}
    import graft.operators.BloomPrune
    // (items, bits): the shipped q84 sizing plus a 10-bits/item pair —
    // pins the "size ~10x items for ≈1% false positives" scaladoc claim
    // (BloomPrune.scala). Keys are fixed strings, so the observed rate
    // is deterministic; the 2x margin absorbs key-set hash luck, not
    // run-to-run variance.
    val nProbe = 20000L
    Seq((512L, 5120L), (2048L, 20480L), (4096L, 65536L)).foreach { case (n, m) =>
      val stored = (0L until n).map(i => s"stored-$i").toDF("k")
      val bf = stored.agg(BloomPrune.bloomAgg(col("k"), n, m))
        .head.getAs[Array[Byte]](0)
      val probes = (0L until nProbe).map(i => s"probe-$i").toDF("k")
      val fp = probes.filter(BloomPrune.mightContain(lit(bf), col("k"))).count()
      // optimal k = round(m/n * ln 2) (Spark's own sizing); theory
      // p = (1 - e^{-kn/m})^k
      val k = math.max(1L, math.round(m.toDouble / n * math.log(2))).toInt
      val pTheory = math.pow(1 - math.exp(-k * n.toDouble / m), k)
      val bound = math.max(2 * pTheory * nProbe, 10.0)
      assert(fp <= bound,
        s"n=$n m=$m: $fp FPs > bound $bound (theory ~${pTheory * nProbe})")
      val fn = stored.filter(not(BloomPrune.mightContain(lit(bf), col("k")))).count()
      assert(fn == 0L, s"n=$n m=$m: bloom false negatives impossible, got $fn")
    }
  }

  test("integer cross-multiplied verdicts agree with exact rational tests (q90/q91 kernel)") {
    // The engine-exactness trick behind q90's >3σ spike test and q91's
    // share/mean drift tests: every float comparison p/q > r/s is
    // evaluated as p·s > r·q in integers. Property: the integer form
    // equals exact rational arithmetic (BigDecimal, no rounding) on
    // random inputs — including the boundary cases float division
    // would misjudge.
    val cnts = Gen.listOfN(24, Gen.chooseNum(0L, 2000L))
    samples(cnts.flatMap(w => Gen.chooseNum(0L, 4000L).map(c => (w, c))), 200)
      .foreach { case (win, cnt) =>
        val s = win.sum
        val q = win.map(c => c * c).sum
        val num = cnt * 24 - s
        val den2 = 24 * q - s * s
        val intVerdict = num > 0 && num * num > 9 * den2
        // exact reference: the same comparison in unbounded BigInt —
        // equality here proves the long arithmetic never overflowed and
        // the verdict equals exact rational (cnt − mean) > 3σ (both
        // sides cross-multiplied by the positive 24² denominator)
        val exact = num > 0 &&
          BigInt(num).pow(2) > BigInt(9) * BigInt(den2)
        assert(intVerdict == exact, s"win=$win cnt=$cnt")
        assert(den2 >= 0, "variance numerator negative — sum/square bookkeeping broken")
        assert(BigInt(24) * BigInt(q) - BigInt(s).pow(2) == BigInt(den2),
          "den2 overflowed long")
      }
    // share drift: |a/ta - b/tb| > 1/20 ⇔ |a·tb − b·ta|·20 > ta·tb
    val shares = for {
      a <- Gen.chooseNum(0L, 100000L); ta <- Gen.chooseNum(1L, 1000000L)
      b <- Gen.chooseNum(0L, 100000L); tb <- Gen.chooseNum(1L, 1000000L)
    } yield (a, ta, b, tb)
    samples(shares, 500).foreach { case (a, ta, b, tb) =>
      val intVerdict = math.abs(a * tb - b * ta) * 20 > ta * tb
      val exact = (BigInt(a) * tb - BigInt(b) * ta).abs * 20 > BigInt(ta) * tb
      assert(intVerdict == exact, s"a=$a/$ta b=$b/$tb")
    }
  }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  // ── Hamilton apportionment (q93/q97 core): exactness on random strata ──

  private val strataGen: Gen[List[(String, String, Long, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, for {
      lang <- Gen.oneOf("aa", "bb", "cc", "dd")
      src <- Gen.oneOf("s0", "s1", "s2", "s3", "s4")
      docs <- Gen.choose(1L, 500L)
      tok <- Gen.choose(1L, 100000L)
    } yield (lang, src, docs, tok)).map(_.groupBy(t => (t._1, t._2)).map {
      case ((l, sr), ts) => (l, sr, ts.map(_._3).sum, ts.map(_._4).sum) }.toList))

  test("apportion: allocations sum to the budget and obey the quota rule on random strata") {
    samples(Gen.zip(strataGen, Gen.choose(1L, 5000L)), 8).foreach {
      case (strata, budget) =>
        val rows = graft.queries.Hygiene.apportion(
            strata.toDF("lang", "source", "n_docs", "n_tok"), budget)
          .collect()
        val total = strata.map(_._4).sum
        assert(rows.map(_.getAs[Long]("alloc")).sum == budget,
          s"budget $budget not exactly apportioned over ${strata.size} strata")
        rows.foreach { r =>
          val extra = r.getAs[Long]("alloc") - r.getAs[Long]("floor_alloc")
          assert(extra == 0L || extra == 1L)
          // quota rule: alloc is the exact quota's floor or ceil
          val quota = r.getAs[Long]("n_tok") * budget
          assert(r.getAs[Long]("floor_alloc") == quota / total)
        }
    }
  }

  // ── FastSS deletion-neighborhood (q101): candidate COMPLETENESS ──
  // any pair at levenshtein distance exactly 1 must share a key in
  // U(w) = {w} ∪ {one-char deletions of w} — the property that lets
  // q101 verify only the candidate sliver without missing a pair.

  private def delKeys(w: String): Set[String] =
    Set(w) ++ w.indices.map(i => w.take(i) + w.drop(i + 1))

  private val editGen: Gen[(String, String)] = for {
    len <- Gen.choose(3, 10)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
    w = cs.mkString
    pos <- Gen.choose(0, len - 1)
    ch <- Gen.oneOf('a', 'b', 'c', 'd', 'e')
    kind <- Gen.choose(0, 2)
  } yield kind match {
    case 0 => (w, w.take(pos) + w.drop(pos + 1))           // deletion
    case 1 => (w, w.take(pos) + ch + w.drop(pos))          // insertion
    case _ => (w, w.take(pos) + ch + w.drop(pos + 1))      // substitution
  }

  test("deletion-neighborhood keys are complete for every edit-distance-1 pair") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    samples(editGen, 200).foreach { case (a, b) =>
      whenever(lev(a, b) == 1) {
        assert(delKeys(a).intersect(delKeys(b)).nonEmpty,
          s"distance-1 pair ($a, $b) shares no deletion key - q101 would miss it")
      }
    }
  }

  test("z-order interleave is a bijection and preserves tile locality") {
    import graft.operators.ZOrder
    import org.apache.spark.sql.functions._
    val coordGen = for {
      a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    } yield (a, b)
    val pts = samples(coordGen, 300).distinct
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      // reference interleave + de-interleave round-trip
      val zRef = (0 until 8).map(i =>
        (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))).sum
      assert(z == zRef, s"($a,$b)")
      val aBack = (0 until 8).map(i => (((z >> (2 * i)) & 1) << i).toInt).sum
      val bBack = (0 until 8).map(i => (((z >> (2 * i + 1)) & 1) << i).toInt).sum
      assert(aBack == a && bBack == b, s"roundtrip ($a,$b) -> $z")
    }
    // locality: points sharing a z-prefix share a rectangle — the top 4
    // z bits pin both coordinates' top 2 bits (the q122 file-tile claim)
    got.groupBy(_._3 >> 12).values.foreach { tile =>
      assert(tile.map(_._1 >> 6).distinct.length == 1, "a-tile split")
      assert(tile.map(_._2 >> 6).distinct.length == 1, "b-tile split")
    }
    assert(got.map(_._3).distinct.length == got.length, "bijection: no collisions")
  }

  private val phashGen: Gen[Seq[Long]] = for {
    bases <- Gen.listOfN(12, Gen.choose(Long.MinValue, Long.MaxValue))
    extras <- Gen.listOfN(12, for {
      nCopies <- Gen.choose(0, 2)
      masks <- Gen.listOfN(nCopies, for {
        nBits <- Gen.choose(1, 3)
        bits <- Gen.listOfN(nBits, Gen.choose(0, 63))
      } yield bits.map(1L << _).foldLeft(0L)(_ | _))
    } yield masks)
  } yield bases.zip(extras).flatMap { case (b, ms) => b +: ms.map(b ^ _) }

  test("nearDupByHash equals brute-force transitive closure of the hd<=3 graph") {
    import graft.engine.Multimodal
    samples(phashGen, 6).foreach { hashes =>
      val rows = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val df = rows.toDF("media_id", "phash")
      // maxBucket high enough never to cap: the pigeonhole recall
      // guarantee then makes the operator EXACTLY the hd<=3 closure
      val out = Multimodal.nearDupByHash(df, maxHamming = 3, maxBucket = 10000)
        .collect().map(r => r.getAs[Long]("media_id") ->
          (r.getAs[Long]("keeper"), r.getAs[Long]("n_members"))).toMap
      val parent = Array.tabulate(rows.size)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (i <- rows.indices; j <- i + 1 until rows.size)
        if (java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <= 3)
          parent(find(i)) = find(j)
      rows.indices.groupBy(find).values.foreach { members =>
        val keeper = members.min.toLong
        members.foreach { m =>
          assert(out(m.toLong)._1 == keeper,
            s"node $m keeper ${out(m.toLong)._1} != $keeper")
          assert(out(m.toLong)._2 == members.size.toLong,
            s"node $m size ${out(m.toLong)._2} != ${members.size}")
        }
      }
    }
  }

  private val pqGen = for {
    vecs <- Gen.listOfN(15, Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)))
    cbs <- Gen.listOfN(2, Gen.listOfN(3, Gen.listOfN(4, Gen.choose(-1.0, 1.0))))
  } yield (vecs.map(_.toArray), cbs.map(_.map(_.toArray)))

  test("PQ codes equal brute-force per-subspace argmin on random vectors") {
    import graft.operators.PqAdc
    samples(pqGen, 6).foreach { case (vecs, codebooks) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = PqAdc.encode(df, codebooks, subDim = 4)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          r.getSeq[Int](r.fieldIndex("codes"))).toMap
      vecs.zipWithIndex.foreach { case (v, id) =>
        val want = codebooks.zipWithIndex.map { case (cb, m) =>
          // the expression's exact accumulation: left-to-right double fold
          val d2s = cb.map { cw =>
            var acc = 0.0
            for (i <- 0 until 4) {
              val d = v(m * 4 + i).toDouble - cw(i)
              acc += d * d
            }
            acc
          }
          d2s.indexOf(d2s.min) + 1 // ties -> lowest code, 1-based
        }
        assert(got(id.toLong) == want, s"vec $id: ${got(id.toLong)} != $want")
      }
    }
  }

  // statements built from benign words plus literals that CONTAIN the
  // splitter's trigger characters — ';' and '--' inside quotes are data
  private val sqlStmtGen: Gen[String] = for {
    head <- Gen.oneOf("SELECT a", "SELECT b, c", "UPDATE t SET x = 1")
    lit <- Gen.oneOf("'x;y'", "'a--b'", "'it''s; ok'", "'multi\nline;'", "'plain'")
    tail <- Gen.oneOf("", s" WHERE s = $lit", s", $lit AS s")
  } yield head + tail

  private val sqlScriptGen = for {
    stmts <- Gen.nonEmptyListOf(sqlStmtGen)
    seps <- Gen.listOfN(stmts.size, Gen.oneOf(";", ";;", ";\n", "; -- note\n", ";\n-- whole-line\n"))
  } yield (stmts, stmts.zip(seps).map { case (s, sep) => s + sep }.mkString)

  test("DDL splitter recovers the statement list under any separator dressing") {
    import graft.sources.Landing.splitStatements
    samples(sqlScriptGen, 40).foreach { case (stmts, script) =>
      assert(splitStatements(script) == stmts,
        s"script <<$script>> split to ${splitStatements(script)}, want $stmts")
    }
  }
}
