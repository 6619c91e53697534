package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5 governance queries (q77–q81) — the
  * invariants each operator promises, checked at sf0.001 (the driver's
  * DuckDB gate re-checks exact equality at sf0.01). */
class TrainData2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q77: every reported pair crosses the split, and val/train sides are typed right") {
    val rows = q("q77_split_leakage").collect()
    assert(rows.nonEmpty)
    def isVal(id: Long): Boolean =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"q77:$id".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.charAt(0) < '3'
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (v, t) = (r.getLong(3), r.getLong(4))
      assert(Set(a, b) == Set(v, t))
      assert(isVal(v) && !isVal(t), s"pair ($a,$b): val/train sides mislabeled")
    }
  }

  test("q78: canonical-URL groups partition the corpus (dup counts sum to n_docs)") {
    val out = q("q78_url_dedup")
    val total = out.agg(sum("n_dups")).head.getLong(0)
    val nDocs = graft.engine.Tables.documents(spark, dir).count()
    assert(total == nDocs, s"n_dups sum $total != corpus $nDocs")
    assert(out.filter(col("keeper_doc") > col("last_doc")).isEmpty)
    // normalization actually collapsed variants: fewer keys than docs
    assert(out.count() < nDocs)
  }

  test("q79: merged-histogram quantile brackets the exact quantile at every p") {
    val rows = q("q79_quantile_sketch").orderBy("p").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(50, 90, 99))
    rows.foreach { r =>
      val (lo, hi, exact) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hi == lo + 15)
      assert(exact >= lo && exact <= hi, s"p=${r.getInt(0)}: $exact !in [$lo,$hi]")
      assert(r.getBoolean(4))
    }
  }

  test("q80: recall@k is n_hits/k with 0 <= n_hits <= k, one row per probe") {
    val rows = q("q80_ann_recall").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L, 104L))
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0 && hits <= 10)
      assert(r.getDouble(2) == hits / 10.0)
    }
  }

  test("q82: three merge rounds, each with positive weight and a non-empty pair") {
    val rows = q("q82_bpe_train").orderBy("round").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
    // merged symbols grow: a later round may merge a round-1 product, but
    // every merge must concatenate previously existing symbols
    assert(rows.forall(r => (r.getString(1) + r.getString(2)).length >= 2))
  }

  test("bpeRound: greedy left-to-right merge on an overlapping run (BPE's sequential step)") {
    // "aaaa" + top pair (a,a): matches at 1,2,3 form ONE island; greedy
    // takes 1 and 3 → exactly "aa","aa" — the case a naive
    // all-matches-merge (or right-to-left scan) gets wrong.
    import spark.implicits._
    val syms = graft.queries.TrainData2.bpeCharSyms(
      Seq(("aaaa", 1L)).toDF("w", "f"))
    val (merged, rec) = graft.queries.TrainData2.bpeRound(syms, 1)
    val m = merged.head.getSeq[String](2)
    assert(m == Seq("aa", "aa"), m)
    val t = rec.head
    assert((t.getString(1), t.getString(2), t.getLong(3), t.getLong(4)) == ("a", "a", 3L, 1L))
  }

  test("q88: batched rounds select pairwise symbol-disjoint merges, ranked within round") {
    val rows = q("q88_bpe_batch").orderBy("round", "merge_rank").collect()
    assert(rows.nonEmpty)
    val byRound = rows.groupBy(_.getInt(0))
    assert(byRound.keySet == Set(1, 2))
    byRound.foreach { case (round, rs) =>
      // merge_rank is dense from 1, at most M=8 per round
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length), s"round $round ranks")
      assert(rs.length <= 8)
      assert(rs.forall(r => r.getLong(4) > 0 && r.getLong(5) > 0))
      // the EXACTNESS precondition: no symbol appears in two selected
      // pairs of one round (this is what lets one bpeApply pass equal
      // M sequential greedy applications)
      val syms = rs.flatMap(r => Seq(r.getString(2), r.getString(3)))
      val perPair = rs.toSeq.map(r => Set(r.getString(2), r.getString(3)))
      perPair.combinations(2).foreach { pair =>
        assert((pair(0) & pair(1)).isEmpty, s"round $round shares symbols: ${syms.toSeq}")
      }
    }
    // batching actually batches: strictly more merges than rounds
    assert(rows.length > 2, "expected multiple merges per round")
  }

  test("q89: encode trajectory starts at raw char mass and strictly shrinks each round") {
    val rows = q("q89_bpe_encode").orderBy("round").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val totals = rows.map(_.getLong(1)).toSeq
    // round 0 = raw corpus length in characters (whitespace tokenization)
    val raw = graft.engine.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(sum(length(col("w")))).head.getLong(0)
    assert(totals.head == raw, s"round-0 total ${totals.head} != raw char mass $raw")
    // each trained merge has positive weight → ≥1 occurrence merges → strict drop
    totals.sliding(2).foreach { case Seq(a, b) => assert(b < a, totals) }
    rows.foreach(r => assert(r.getLong(2) == totals.head - r.getLong(1)))
  }

  test("q163: per-doc trained-token mass sums to q89's final corpus mass") {
    // the doc-grain tokenize and the corpus-mass trajectory are two
    // readouts of the SAME trained symbolization: Σ over all docs of
    // bpe_tok must equal q89's round-3 total_syms exactly
    val docs = graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val perDoc = graft.queries.TrainData2.bpeDocTokens(docs)
    val mass = perDoc.agg(sum("bpe_tok")).head.getLong(0)
    val q89Final = q("q89_bpe_encode").orderBy("round").collect().last.getLong(1)
    assert(mass == q89Final, s"doc-grain mass $mass != trajectory $q89Final")
    // every doc tokenizes, and merges only ever shrink a word ONTO
    // itself: word count <= trained tokens <= raw char mass per doc
    assert(perDoc.count() == docs.count())
    assert(perDoc.filter(col("bpe_tok") < col("ws_tok")).isEmpty)
    val gated = q("q163_bpe_tokenize").collect()
    assert(gated.length == 20)
    gated.foreach(r => assert(r.getLong(3) >= 1000L, r)) // fertility_pm
    // top-20 is ordered by trained tokens desc with the doc_id tie-break
    val keys = gated.map(r => (-r.getLong(2), r.getLong(0))).toSeq
    assert(keys == keys.sorted, keys)
  }

  test("q92: distributed fixed-point PageRank equals a sequential in-memory replay") {
    val rows = q("q92_pagerank").collect()
    assert(rows.length == 20)
    // replay the exact integer recurrence single-threaded from scratch
    val n = graft.engine.Tables.documents(spark, dir).count()
    val edges = (0L until n).flatMap(src =>
      (1 to 3).map(j => (src, (src * src * 31 + j * 97) % n)).filter(e => e._1 != e._2))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = (0L until n).map(_ -> 1000000L).toMap
    (1 to 3).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / outdeg(s) }.sum).toMap
      rank = (0L until n).map(d => d -> (150000L + 85L * contrib.getOrElse(d, 0L) / 100L)).toMap
    }
    val nIn = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = rank.toSeq.sortBy { case (d, r) => (-r, d) }.take(20)
    rows.zip(expected).foreach { case (row, (d, r)) =>
      assert(row.getLong(0) == d && row.getLong(1) == r,
        s"rank mismatch at doc ${row.getLong(0)}")
      assert(row.getLong(2) == nIn.getOrElse(d, 0L))
    }
    // every rank is at least the base mass, and in-link asymmetry
    // actually separated the authorities from the long tail
    assert(rows.forall(_.getLong(1) >= 150000L))
    assert(rank.values.max > rank.values.min,
      "degenerate graph: all ranks equal, the spec would pin nothing")
  }

  test("bpeBatchRound: m=1 degenerates to bpeRound (same merge, same symbolization)") {
    import spark.implicits._
    val words = Seq(("abab", 3L), ("abc", 2L), ("dd", 1L))
    val syms = graft.queries.TrainData2.bpeCharSyms(words.toDF("w", "f"))
    val (m1, r1) = graft.queries.TrainData2.bpeRound(syms, 1)
    val (m2, r2) = graft.queries.TrainData2.bpeBatchRound(syms, 1, m = 1)
    assert(r2.select("left_sym", "right_sym", "weight", "n_words").collect().toSeq ==
      r1.select("left_sym", "right_sym", "weight", "n_words").collect().toSeq)
    def arrs(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("w").collect().map(r => (r.getString(0), r.getSeq[String](2))).toSeq
    assert(arrs(m2) == arrs(m1))
  }

  test("bpeBatchRound: dominance skips a conflicting pair but keeps disjoint lower ranks") {
    // pair weights: (a,b)=5, (b,c)=4, (d,e)=3 — (b,c) shares b with the
    // higher-ranked (a,b) and must be skipped; (d,e) conflicts with
    // NOTHING selected-or-ranked-above-it except (b,c)… which ranks
    // above it and shares no symbol, so (d,e) survives. One round must
    // merge ab and de but leave "bc" unmerged.
    import spark.implicits._
    val words = Seq(("ab", 5L), ("bc", 4L), ("de", 3L))
    val syms = graft.queries.TrainData2.bpeCharSyms(words.toDF("w", "f"))
    val (merged, rec) = graft.queries.TrainData2.bpeBatchRound(syms, 1)
    val sel = rec.orderBy("merge_rank").collect()
      .map(r => (r.getString(2), r.getString(3))).toSeq
    assert(sel == Seq(("a", "b"), ("d", "e")), sel)
    val out = merged.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(out == Map("ab" -> Seq("ab"), "bc" -> Seq("b", "c"), "de" -> Seq("de")))
  }

  test("bpeBatchRound: overlapping run inside a batch still merges greedily") {
    // "aaaa" with top pair (a,a) PLUS the disjoint (d,e) in one batch:
    // the island parity must still take positions 1 and 3 only.
    import spark.implicits._
    val words = Seq(("aaaa", 5L), ("de", 1L))
    val syms = graft.queries.TrainData2.bpeCharSyms(words.toDF("w", "f"))
    val (merged, rec) = graft.queries.TrainData2.bpeBatchRound(syms, 1)
    assert(rec.count() == 2)
    val out = merged.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(out == Map("aaaa" -> Seq("aa", "aa"), "de" -> Seq("de")))
  }

  test("q83: incremental sketch update reads out identical quantiles to full recompute") {
    val rows = q("q83_sketch_update").orderBy("p").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(50, 90, 99))
    rows.foreach { r =>
      // histogram addition is exact, so merge(stored, batch) == full —
      // equality, not tolerance
      assert(r.getLong(1) == r.getLong(2), s"p=${r.getInt(0)} diverged")
      assert(r.getBoolean(3))
    }
  }

  test("q84: bloom verdicts equal ground truth — every %3==0 re-crawl doc is a dup") {
    val rows = q("q84_bloom_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // batch doc (id+100000) kept its text iff original doc_id %3 == 0 —
      // exactly those must resolve as dups, bloom false positives or not
      val expectDup = (r.getLong(0) - 100000L) % 3 == 0
      assert(r.getBoolean(1) == expectDup, s"doc ${r.getLong(0)}")
    }
  }

  test("q84: the bloom prefilter admits every true dup (no false negatives)") {
    import graft.operators.BloomPrune
    import spark.implicits._
    val keys = (1L to 500L).map(i => s"key$i").toDF("h")
    val bf = keys.agg(BloomPrune.bloomAgg(col("h"), 512L, 8192L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val probed = keys.withColumn("hit", BloomPrune.mightContain(lit(bf), col("h")))
    assert(probed.filter(!col("hit")).isEmpty) // membership never missed
    // and the filter actually prunes: most absent keys probe negative
    val absent = (1L to 500L).map(i => s"other$i").toDF("h")
      .withColumn("hit", BloomPrune.mightContain(lit(bf), col("h")))
    assert(absent.filter(!col("hit")).count() > 400)
  }

  test("q85: chunks tile each doc at the stride with 16-token overlap") {
    val rows = q("q85_chunk_overlap").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // interior chunks are exactly ChunkLen tokens; only the last may be short
      sorted.init.foreach(c => assert(c._3 == 64))
      assert(sorted.last._3 >= 1 && sorted.last._3 <= 64)
      // consecutive chunks overlap by ChunkLen - ChunkStride = 16 tokens
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) if a._3 == 64 =>
          val aToks = a._4.split(" "); val bToks = b._4.split(" ")
          assert(aToks.drop(48).sameElements(bToks.take(aToks.length - 48)))
        case _ =>
      }
    }
  }

  test("q86: retention cells are bounded by cohort size and offset 0 is full") {
    val rows = q("q86_retention_matrix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // active <= cohort size
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      if (r.getInt(1) == 0) // every cohort member is active in their first year
        assert(r.getLong(2) == r.getLong(3) && r.getDouble(4) == 1.0)
    }
  }

  test("q87: funnel step counts are monotonically non-increasing") {
    val rows = q("q87_event_funnel").orderBy("step").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("0_all", "1_signup", "2_click", "3_purchase"))
    rows.map(_.getLong(1)).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "a later step exceeded an earlier one")
      case _ =>
    }
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("q81: CMS estimates are one-sided (est >= exact) and inside the 4N/w bound") {
    val rows = q("q81_cms_topk").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)}: CMS undercounted")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
      assert(r.getBoolean(4), s"${r.getString(0)}: overcount outside bound")
    }
  }

  test("q112: PQ cells partition every subspace; seed subvectors encode losslessly") {
    val rows = q("q112_pq_encode").collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("code"),
        r.getAs[Long]("n_vecs"), r.getAs[Long]("dist2_e9_sum")))
    val n = graft.engine.Tables.embeddings(spark, dir).count()
    // every subspace's cells partition the corpus
    rows.groupBy(_._1).foreach { case (m, cells) =>
      assert(cells.map(_._3).sum == n, s"subspace $m loses vectors")
      assert(cells.forall(c => c._2 >= 1 && c._2 <= 4))
    }
    // codebooks contain the seed subvectors verbatim, so each seed's
    // own cell has zero distance for it — with 4 seeds and 4 codes per
    // subspace, total distortion of the 4 seed rows must be exactly 0:
    // equivalently every cell's distortion comes from non-seed rows
    // only. Pin the sharper row-level fact by re-encoding the seeds.
    val seeds = graft.engine.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 4).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    seeds.zipWithIndex.foreach { case (v, i) =>
      (0 until 4).foreach { m =>
        val sub = v.slice(m * 16, (m + 1) * 16)
        val d2 = seeds.map { s =>
          val cb = s.slice(m * 16, (m + 1) * 16)
          sub.zip(cb).map { case (x, y) =>
            val d = x.toDouble - y.toDouble; d * d
          }.sum
        }
        assert(d2(i) == 0.0 && d2.indexOf(d2.min) == i,
          s"seed $i subspace $m must be its own nearest codeword")
      }
    }
  }

  // Brute-force shingler for the q154/q155 pins: SparkSpec.naiveWordNgrams
  // (the shared reference implementation, also pinned by WordNgramsSpec).
  private def grams(text: String, n: Int): Seq[String] = naiveWordNgrams(text, n)

  test("q154: per-source rollup matches a driver-side brute-force recount") {
    val docs = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    case class V(src: String, id: Long, nTok: Long,
                 f2: Boolean, f3: Boolean, f4: Boolean) {
      def drop: Boolean = f2 || f3 || f4
    }
    val verdicts = docs.map { case (id, src, text) =>
      val nTok = text.split(" ", -1).length.toLong
      def top(n: Int): Long = {
        val g = grams(text, n)
        if (g.isEmpty) 0L
        else g.groupBy(identity).values.map(_.size).max.toLong
      }
      V(src, id, nTok,
        top(2) * 2 * 5 > nTok,
        top(3) * 3 * 100 > nTok * 18,
        top(4) * 4 * 100 > nTok * 16)
    }
    val expected = verdicts.groupBy(_.src).map { case (src, vs) =>
      (src, vs.length.toLong,
        vs.count(_.f2).toLong, vs.count(_.f3).toLong, vs.count(_.f4).toLong,
        vs.count(_.drop).toLong,
        vs.filterNot(_.drop).map(_.nTok).sum,
        vs.filter(_.drop).map(_.id).minOption)
    }.toSeq.sortBy(_._1)
    val got = q("q154_repetition").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))
    }.toSeq
    assert(got == expected)
    // the corpus must exercise both verdict classes or the pin is vacuous
    assert(got.map(_._6).sum > 0, "no doc dropped — thresholds never fire")
    assert(got.map(_._6).sum < docs.length, "every doc dropped")
  }

  test("q155: dup-window census matches a driver-side brute-force recount") {
    val docs = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = docs.flatMap { case (id, text) =>
      grams(text, 10).zipWithIndex.map { case (g, i) => (id, i + 1, g) }
    }
    val freq = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = wins.filter(w => freq(w._3) >= 2)
      .groupBy(_._1).map { case (id, dups) =>
        val pos = dups.map(_._2).sorted
        // islands of consecutive positions = runs
        val runs = pos.zipWithIndex.groupBy { case (p, i) => p - i }
          .values.map(_.size.toLong).toSeq
        val nWin = docs.find(_._1 == id).map(d =>
          math.max(d._2.split(" ", -1).length - 9, 0)).get.toLong
        (id, nWin, pos.length.toLong, runs.length.toLong, runs.max,
          runs.max + 9)
      }.toSeq.sortBy(_._1)
    val got = q("q155_window_dedup").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == expected.take(200))
    assert(got.nonEmpty, "no duplicated spans found — census is vacuous")
    // structural invariants on every row
    got.foreach { case (id, nWin, nDup, nRuns, maxRun, span) =>
      assert(maxRun >= 1 && maxRun <= nDup && nDup <= nWin,
        s"doc $id: run/dup/window ordering violated")
      assert(nRuns >= 1 && nRuns <= nDup && span == maxRun + 9)
    }
  }

  test("q156: surprisal buckets match a driver-side unigram-LM recount") {
    val docs = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val allToks = docs.flatMap(_._3.split(" ", -1))
    val counts = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = allToks.length.toLong
    def rarity(w: String): Long =
      63L - java.lang.Long.numberOfLeadingZeros(t / counts(w))
    val expected = docs.map { case (id, src, text) =>
      val ws = text.split(" ", -1)
      val score = ws.map(rarity).sum
      val centi = score * 100 / ws.length
      val bucket = if (centi <= 401) "head"
        else if (centi <= 404) "middle" else "tail"
      (src, bucket, id, ws.length.toLong, score)
    }.groupBy(v => (v._1, v._2)).map { case ((src, b), vs) =>
      (src, b, vs.length.toLong, vs.map(_._4).sum, vs.map(_._5).sum,
        vs.map(_._3).min)
    }.toSeq.sortBy(v => (v._1, v._2))
    val got = q("q156_surprisal_filter").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the split must be non-degenerate: more than one bucket in play
    assert(got.map(_._2).distinct.size >= 2, "all docs in one bucket")
  }

  test("q157: prefix-filtered join equals brute-force all-pairs Jaccard (recall 1)") {
    val docs = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), grams(r.getString(1), 5).toSet))
      .filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size
      union = sa.size + sb.size - inter
      if inter * 10 >= union * 6
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong,
      inter.toLong * 100 / union)).sortBy(p => (p._1, p._2)).toSeq
    val rows = q("q157_prefix_join").collect()
    val got = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    // the pigeonhole guarantee: EVERY qualifying pair survives the
    // prefix pruning AND the positional filter — exactness is the
    // operator's whole contract
    assert(got == expected.take(200))
    assert(got.nonEmpty, "no similar pairs at tau=0.6 — pin is vacuous")
    // the census columns are constant across rows and self-describing:
    // n_pairs is the complete verified count (cap-independent) and the
    // positionally-filtered candidate set covers every true pair
    val nCand = rows.map(_.getLong(6)).distinct
    val nPass = rows.map(_.getLong(7)).distinct
    assert(nCand.length == 1 && nPass.length == 1, "census must be constant")
    assert(nPass.head == expected.size.toLong,
      s"n_pairs=${nPass.head} vs brute-force ${expected.size}")
    assert(nCand.head >= nPass.head, "candidates must cover verified pairs")
  }

  test("q159: planted cross-doc duplicate spans are excised exactly; staggered overlaps merge; short spans stay") {
    import spark.implicits._
    def words(p: String, n: Int): Seq[String] = (1 to n).map(i => s"$p$i")
    val t = words("t", 60)            // target: unique words t1..t60
    val s12 = words("s", 12)          // a 12-word shared span (< MinCutSpan)
    val corpus = Seq(
      // T shares words 1..20 with H1 and words 15..50 with H2: dup-window
      // runs {1..11} and {15..41} → word spans [1,20] and [15,50] OVERLAP
      // and must merge into one 50-word cut
      (1L, t.mkString(" ")),
      (2L, t.slice(0, 20).mkString(" ")),  // H1 = T[1..20]
      (3L, t.slice(14, 50).mkString(" ")), // H2 = T[15..50]
      // U/V share only a 12-word span → max cut span 12 < 20 → no plan
      (4L, (words("u", 10) ++ s12 ++ words("uu", 10)).mkString(" ")),
      (5L, (words("v", 8) ++ s12 ++ words("vv", 22)).mkString(" ")),
      (6L, words("z", 40).mkString(" ")))  // unique: no plan
      .toDF("doc_id", "text")
    val got = graft.queries.TrainData2.spanRemovalPlan(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // the planted duplicate is excised exactly — T loses words 1..50
    // (one MERGED span), keeps the 10 words nothing else shares
    assert(got(1L) == ((60L, 1L, 50L, 10L, 1L)), s"T plan: ${got.get(1L)}")
    // the source docs are fully covered by their shared span
    assert(got(2L) == ((20L, 1L, 20L, 0L, 1L)), s"H1 plan: ${got.get(2L)}")
    assert(got(3L) == ((36L, 1L, 36L, 0L, 1L)), s"H2 plan: ${got.get(3L)}")
    // sub-threshold spans and unique docs emit no removal plan
    assert(!got.contains(4L) && !got.contains(5L) && !got.contains(6L),
      s"short/unique docs must stay uncut: ${got.keySet}")
    // the APPLICATION (q161's kernel) rebuilds exactly the text a
    // driver-side cut of the same spans would produce: T keeps its 10
    // unique suffix words, the fully-covered sources keep nothing
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val applied = graft.queries.TrainData2.cutApplyPlan(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5),
        Option(r.getString(6)))).toMap
    assert(applied(1L) == ((10L, 10L,
      Some(md5Of(t.slice(50, 60).mkString(" "))))), s"T rebuild: ${applied(1L)}")
    assert(applied(2L) == ((0L, 0L, None)) && applied(3L) == ((0L, 0L, None)),
      "fully-covered sources must rebuild to nothing")
    // built-in cross-check: arithmetic kept_words == counted kept_tok
    applied.values.foreach { case (kw, kt, _) => assert(kw == kt) }
  }

  test("q158: BM25 top-k equals a driver-side integer recount of the cleared formula") {
    val query = Seq("dup", "customer", "spark")
    val docs = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val t = docs.map(_._2.length.toLong).sum
    val n = docs.length.toLong
    val dfm = query.map(w => w -> docs.count(_._2.contains(w)).toLong).toMap
    val expected = docs.flatMap { case (id, ws) =>
      val dl = ws.length.toLong
      val hits = query.map(w => w -> ws.count(_ == w).toLong).filter(_._2 > 0)
      if (hits.isEmpty) None
      else {
        val score = hits.map { case (w, tf) =>
          val idf = 63 - java.lang.Long.numberOfLeadingZeros(n * 100 / dfm(w))
          idf * 22 * tf * t * 1000 /
            (10 * t * tf + 3 * t + 9 * dl * n)
        }.sum
        Some((id, dl, score, hits.length.toLong, hits.map(_._2).sum))
      }
    }.sortBy(v => (-v._3, v._1)).take(20).zipWithIndex.map { case (v, i) =>
      (i + 1L, v._1, v._3, v._4, v._5, v._2)
    }.toSeq
    val got = q("q158_bm25_topk").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // non-degenerate: the rare planted term must put a multi-term doc on top
    assert(got.head._4 >= 2, "top doc hits fewer than 2 query terms")
  }
}
