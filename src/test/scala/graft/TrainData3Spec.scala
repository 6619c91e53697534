package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the unigram-LM tokenizer family (q164/q165) — the
  * invariants the DuckDB hash gate can't state directly, plus one fully
  * hand-computed planted corpus. */
class TrainData3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  import graft.queries.TrainData3.{uniModelFromWords, uniSegCol}

  private def words(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("w", "f")
  }

  test("unigram: planted corpus trains the hand-computed model exactly") {
    // corpus = "aaaa"×10, "b"×1. Seed census: a:40 aa:30 aaa:20 aaaa:10
    // b:1, tot0=101, oov0=lg2e10(102)=6752; round-1 Viterbi keeps
    // ["aaaa"] (Σcost 3296 beats [aa,aa] 3392 and [a,a,a,a] 5376), so
    // the recount is {aaaa:10, b:1}, tot1=11, oov1=lg2e10(12)=3584 and
    // final costs aaaa=3584−3456=128, b=3584−1024=2560 — every number
    // below is derived by hand in these units, not from the engine.
    val (vocab, oov) = uniModelFromWords(words("aaaa" -> 10L, "b" -> 1L))
    assert(oov == 3584L, s"oov=$oov")
    assert(vocab == Map("aaaa" -> 128L, "b" -> 2560L), s"vocab=$vocab")
    // final segmentation census under the trained model
    val seg = words("aaaa" -> 10L, "b" -> 1L)
      .withColumn("seg", uniSegCol(col("w"), vocab, oov))
      .select(col("f"), explode(col("seg")).as("piece"))
      .groupBy("piece").agg(sum("f").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg == Map("aaaa" -> 10L, "b" -> 1L), s"census=$seg")
  }

  test("unigram: OOV chars segment as single pieces at the smoothed cost") {
    val (vocab, oov) = uniModelFromWords(words("aaaa" -> 10L, "b" -> 1L))
    val got = words("zzb" -> 1L)
      .withColumn("seg", uniSegCol(col("w"), vocab, oov))
      .select("seg").head.getSeq[String](0)
    assert(got == Seq("z", "z", "b"), s"seg=$got")
  }

  test("unigram: segmentation is a partition — pieces concatenate back to the word") {
    val (vocab, oov) = graft.queries.TrainData3.uniModel(spark, dir)
    val corpus = graft.engine.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val bad = corpus
      .withColumn("seg", uniSegCol(col("w"), vocab, oov))
      .filter(concat_ws("", col("seg")) =!= col("w"))
    assert(bad.isEmpty, s"non-partition segmentations: ${bad.count()}")
  }

  test("unigram: q164 census mass equals q165 doc mass (pre-limit)") {
    val (vocab, oov) = graft.queries.TrainData3.uniModel(spark, dir)
    val corpus = graft.engine.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .withColumn("n_p", size(uniSegCol(col("w"), vocab, oov)).cast("long"))
    val wordMass = corpus.agg(sum(col("f") * col("n_p"))).head.getLong(0)
    val docMass = graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(corpus.select("w", "n_p"), "w")
      .agg(sum("n_p")).head.getLong(0)
    assert(wordMass == docMass && wordMass > 0,
      s"word-grain mass $wordMass != doc-grain mass $docMass")
    // and the gated top-25 census is consistent: descending, positive
    val census = q("q164_unigram_train").collect().map(_.getLong(1))
    assert(census.nonEmpty && census.forall(_ >= 1))
    assert(census.sameElements(census.sortBy(-_)), "census not descending")
  }

  test("unigram prune: survival is by Viterbi USE-mass, not raw substring mass") {
    import graft.queries.TrainData3.uniModelPrunedFromWords
    // corpus "abab"x100: the seed census counts substring "ab" at 200
    // occurrences — TWICE "abab"'s 100 — but round-1 Viterbi segments
    // every word as [abab], so "ab" carries ZERO use-mass. A prune by
    // raw mass would keep "ab" first; a prune by use-mass must keep
    // "abab" and drop "ab" entirely.
    val (pv, _) = uniModelPrunedFromWords(words("abab" -> 100L))
    assert(pv.contains("abab"), s"used piece pruned: $pv")
    assert(!pv.contains("ab"), s"zero-use piece survived the prune: $pv")
  }

  test("unigram prune: exactly the top-UniPruneKeep multis by use-mass survive") {
    import graft.queries.TrainData3.{uniModelPrunedFromWords, UniPruneKeep}
    // 16 two-char words over disjoint alphabets, distinct frequencies
    // 100..115 — each segments as its own whole piece, so the use
    // census has 16 multis with distinct masses and the prune must keep
    // precisely the UniPruneKeep highest-frequency ones
    val pieces = "abcdefghijklmnopqrstuvwxyz012345".grouped(2).toSeq
    assert(pieces.size == 16)
    val corpus = pieces.zipWithIndex.map { case (p, i) => p -> (100L + i) }
    val (pv, _) = uniModelPrunedFromWords(words(corpus: _*))
    val survivors = pv.keys.filter(_.length >= 2).toSet
    val expected = corpus.sortBy(-_._2).take(UniPruneKeep).map(_._1).toSet
    assert(survivors == expected,
      s"survivors $survivors != top-$UniPruneKeep by use ($expected)")
  }

  test("unigram prune: a supplementary-plane single survives as coverage, never pruned as a multi") {
    import graft.queries.TrainData3.uniModelPrunedFromWords
    // U+1D552 (MATHEMATICAL SCRIPT SMALL A) is 2 UTF-16 units but ONE
    // character in both engines' length(); a Java-length split would
    // route it into the multi pool where zero use-mass prunes it —
    // here it is used (the word IS the char) but even a zero-use single
    // must stay for coverage semantics. Pin: it lands in the pruned
    // vocab alongside the ascii singles.
    // 16 heavy two-char pieces overflow the UniPruneKeep=12 budget, so
    // anything misrouted into the multi pool at use-mass 1 IS cut —
    // the discriminating case for the length grain
    val scriptA = new String(Character.toChars(0x1D552))
    val pieces = "abcdefghijklmnopqrstuvwxyz012345".grouped(2).toSeq
    val corpus = pieces.zipWithIndex.map { case (p, i) => p -> (100L + i) } :+
      (scriptA -> 1L)
    val (pv, _) = uniModelPrunedFromWords(words(corpus: _*))
    assert(pv.contains(scriptA), s"supplementary-plane single pruned: ${pv.keys}")
  }

  test("unigram prune: the real-corpus pruned vocab is within budget and the census is sane") {
    import graft.queries.TrainData3.{uniModelPruned, UniPruneKeep}
    val (pv, oov) = uniModelPruned(spark, dir)
    // code-point grain, matching the production prune's cpLen classifier:
    // a supplementary-plane SINGLE is 2 UTF-16 units but must not count
    // against the multi budget (String.length would falsely trip this)
    def cpLen(s: String) = s.codePointCount(0, s.length)
    assert(pv.keys.count(cpLen(_) >= 2) <= UniPruneKeep,
      s"multi budget exceeded: ${pv.keys.filter(cpLen(_) >= 2)}")
    assert(pv.values.forall(c => c >= 0 && c <= oov),
      "piece costs must sit in [0, oov]")
    val census = q("q171_unigram_prune").collect().map(_.getLong(1))
    assert(census.nonEmpty && census.forall(_ >= 1))
    assert(census.sameElements(census.sortBy(-_)), "census not descending")
  }

  test("unigram: fertility never below 1000 per-mille (a word is >= 1 piece)") {
    val rows = q("q165_unigram_encode").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1000L,
        s"doc ${r.getLong(0)}: fertility ${r.getLong(3)} < 1000")
    }
  }

  import graft.queries.TrainData3.{nbConfusion, nbWeights}

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("nb: planted high/low-quality docs classify correctly (both grains)") {
    // 10 long docs (40 tokens, keep label) over the a-vocabulary and 10
    // short docs (10 tokens, drop label) over the disjoint b-vocabulary:
    // every class-pure bucket gives A−B = ±2·L(11) and the Bernoulli
    // absence terms push the sparse docs negative — the margin signs
    // separate perfectly, which is exactly the planted-signal case the
    // heuristic-label training must recover.
    val keepText = (0 until 40).map(i => s"a$i").mkString(" ")
    val dropText = (0 until 10).map(i => s"b$i").mkString(" ")
    val docs = docsDf(
      (0L until 10L).map(i => i -> keepText) ++
        (10L until 20L).map(i => i -> dropText): _*)
    val cm = nbConfusion(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(cm == Map((true, true) -> 10L, (false, false) -> 10L),
      s"confusion=$cm")
  }

  test("nb: a NULL-text doc trains in NEITHER class — the census matches the oracle's") {
    import spark.implicits._
    // the oracle's class census (WHERE keep / WHERE NOT keep) counts a
    // NULL-text doc in neither class; the Spark census must do the same
    // (a getBoolean over the NULL keep group used to NPE here), and the
    // doc contributes no features either — so the trained weight table
    // with the NULL doc present is IDENTICAL to the one without it
    val keepText = (0 until 40).map(i => s"a$i").mkString(" ")
    val dropText = (0 until 10).map(i => s"b$i").mkString(" ")
    val base = (0L until 5L).map(i => i -> keepText) ++
      (5L until 10L).map(i => i -> dropText)
    val clean = base.toDF("doc_id", "text")
    val holed = (base :+ (99L -> null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val wClean = nbWeights(clean).orderBy("b").collect().map(_.toSeq)
    val wHoled = nbWeights(holed).orderBy("b").collect().map(_.toSeq)
    assert(wClean.toSeq == wHoled.toSeq,
      "NULL-text doc must not move the trained model")
    // and scoring the holed corpus proceeds (margin = bias, keep = NULL)
    val m = graft.queries.TrainData3.nbDocMargins(holed)
      .filter(col("doc_id") === 99L).collect()
    assert(m.length == 1 && m(0).isNullAt(1), "NULL text keeps a NULL label")
  }

  test("nb: weight table covers every bucket and df counts are bounded by class sizes") {
    val w = nbWeights(graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))).collect()
    assert(w.length == 64)
    assert(w.map(_.getLong(0)).sorted.sameElements(0L until 64L))
    val n = graft.engine.Tables.documents(spark, dir).count()
    w.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0 &&
        r.getLong(1) + r.getLong(2) <= 64 * n)
    }
  }

  test("nb: real-corpus train-set fit beats the majority class; margins carry the pred sign") {
    val rows = q("q167_nb_score").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    val n = rows.map(_._3).sum
    val correct = rows.filter(r => r._1 == r._2).map(_._3).sum
    val majority = math.max(
      rows.filter(_._1).map(_._3).sum, rows.filter(!_._1).map(_._3).sum)
    assert(correct > majority,
      s"accuracy $correct/$n no better than majority $majority")
    rows.foreach { case (_, pred, nd, ms) =>
      assert(if (pred) ms >= 0 else ms < 0,
        s"pred=$pred but margin_sum=$ms over $nd docs")
    }
  }

  test("q169: DSIR selects exactly the target-vocabulary docs on a planted corpus") {
    import spark.implicits._
    // target (en) docs speak the t-vocabulary; the raw pool adds 4
    // non-en docs that ALSO speak it (the docs DSIR should surface) and
    // 8 docs over a disjoint u-vocabulary (the docs it should pass
    // over). selN = ⌈16/4⌉ = 4; the t-buckets carry w ≈ L(t+1)−L(s+1)
    // far above the u-buckets' L(1)−L(s+1), so the 4 non-en t-docs
    // outrank every u-doc... and the en docs themselves compete — so
    // assert the SELECTED set is t-pure, not a specific id list.
    val tText = (0 until 30).map(i => s"t${i % 7}").mkString(" ")
    val uText = (0 until 30).map(i => s"u${i % 7}").mkString(" ")
    val docs = (
      (0L until 4L).map(i => (i, "en", tText)) ++
        (4L until 8L).map(i => (i, "de", tText)) ++
        (8L until 16L).map(i => (i, "fr", uText))
      ).toDF("doc_id", "lang", "text")
    val sel = graft.queries.TrainData3.dsirSelect(docs)
      .filter(col("sel")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.size == 4, s"selN should be 4, got $sel")
    assert(sel.forall(_ < 8L), s"selected a u-vocabulary doc: $sel")
  }

  test("q169: the rank and threshold selection plans pick the identical set (boundary mid-tie)") {
    import spark.implicits._
    // the planted corpus puts the ⌈16/4⌉ = 4 cut INSIDE the 8-way
    // t-logit tie, so the threshold plan's boundary-rank leg is
    // genuinely exercised, and again on the real sf0.001 corpus for
    // organic logit collisions
    val tText = (0 until 30).map(i => s"t${i % 7}").mkString(" ")
    val uText = (0 until 30).map(i => s"u${i % 7}").mkString(" ")
    val planted = (
      (0L until 4L).map(i => (i, "en", tText)) ++
        (4L until 8L).map(i => (i, "de", tText)) ++
        (8L until 16L).map(i => (i, "fr", uText))
      ).toDF("doc_id", "lang", "text")
    val real = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))
    for (docs <- Seq(planted, real)) {
      def selSet(path: String) = graft.queries.TrainData3
        .dsirSelect(docs, Some(path))
        .filter(col("sel")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val (r, t) = (selSet("rank"), selSet("threshold"))
      assert(r == t, s"rank/threshold diverge: ${r.diff(t)} vs ${t.diff(r)}")
    }
  }

  test("dsir: an all-equal-logit corpus routes through the bounded tie cut — same set as rank") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // r15 VERDICT #2 fixture: every text empty → every logit 0 → the
    // at-T tie group IS the corpus. With the tie mass over the gate the
    // threshold plan must select via the doc_id CUT — a pure row-local
    // predicate — never a corpus-sized rank or broadcast.
    val docs = (0L until 800L).map(i => (i * 3 + 1, "en", ""))
      .toDF("doc_id", "lang", "text")
    def sel(force: String, tieMax: Long) = graft.queries.TrainData3
      .dsirSelect(docs, Some(force), tieRankMax = tieMax)
      .filter(col("sel")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rank = sel("rank", Long.MaxValue)
    val gated = sel("threshold", 10L) // force the bounded tie path
    val broad = sel("threshold", Long.MaxValue) // the broadcast tie path
    assert(rank.size == 200, s"selN should be ⌈800/4⌉: ${rank.size}")
    assert(gated == rank, "bounded tie cut diverges from the rank set")
    assert(broad == rank, "broadcast tie path diverges from the rank set")
    // plan shape: the gated path is predicate-only — no window, no join
    val plan = graft.queries.TrainData3
      .dsirSelect(docs, Some("threshold"), tieRankMax = 10L)
      .queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window in the bounded tie path:\n${plan.toString.take(600)}")
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"join in the bounded tie path:\n${plan.toString.take(600)}")
  }

  test("dsir: NULL-id boundary ties are selected first — broadcast tie path matches rank") {
    import spark.implicits._
    // all logits 0 (empty texts); 4 NULL doc_ids + 796 values. The
    // rank plan orders (logit desc, doc_id asc NULLS FIRST), so the
    // null rows consume the tie budget before any value — the
    // broadcast tie path must keep them (its old === join-back
    // silently deselected every NULL-id row).
    val docs = ((0L until 796L).map(i => (Some(i * 2 + 10), "en", "")) ++
        (0 until 4).map(_ => (Option.empty[Long], "en", "")))
      .toDF("doc_id", "lang", "text")
    def sel(force: String) = graft.queries.TrainData3
      .dsirSelect(docs, Some(force))
      .filter(col("sel")).select("doc_id").collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    val (r, th) = (sel("rank"), sel("threshold"))
    assert(r == th, s"broadcast tie path diverges on NULL-id rows: $r vs $th")
    assert(th.count(_ == -1L) == 4, "all four NULL-id rows must be selected")
    assert(th.size == 200, s"selN should be ⌈800/4⌉: ${th.size}")
  }

  test("nb/dsir: memoized per-dir models equal a fresh retrain; hits serve the cached value") {
    import graft.queries.TrainData3
    val nb1 = TrainData3.nbModelFromCensus(TrainData3.nbCensusDir(spark, dir))
    assert(nb1 == TrainData3.nbModel(graft.engine.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))),
      "memoized NB model != fresh retrain")
    val ds1 = TrainData3.dsModelDir(spark, dir)
    assert(ds1 == TrainData3.dsModel(graft.engine.Tables.documents(spark, dir)
        .select(col("lang"), col("text"))),
      "memoized DSIR model != fresh retrain")
    // cache HIT: the second lookup returns the identical object — no
    // second training census ran
    assert(TrainData3.nbCensusDir(spark, dir).asInstanceOf[AnyRef] eq
      TrainData3.nbCensusDir(spark, dir).asInstanceOf[AnyRef])
    assert(TrainData3.dsModelDir(spark, dir).asInstanceOf[AnyRef] eq
      TrainData3.dsModelDir(spark, dir).asInstanceOf[AnyRef])
  }

  test("q170: the forced threshold census equals q169's rank census row-for-row") {
    val a = q("q169_dsir_resample").collect().map(_.toSeq).toSeq
    val b = q("q170_dsir_threshold").collect().map(_.toSeq).toSeq
    assert(a == b, s"rank census $a != threshold census $b")
  }

  test("q169: census conserves docs and selects exactly the quarter budget") {
    val rows = q("q169_dsir_resample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val sel = rows.map(_._3).sum
    assert(sel == (total + 3) / 4, s"selected $sel of $total")
    rows.foreach { case (lang, raw, s, _) =>
      assert(s >= 0 && s <= raw, s"$lang: n_sel=$s outside [0, $raw]")
    }
  }

  test("census refresh: merged base+delta censuses train the exact full-corpus model") {
    import spark.implicits._
    import graft.queries.TrainData3
    // DSIR: census merge is counter addition, so stored(base) +
    // batch(delta) must train the identical model to a full retrain
    val tText = (0 until 30).map(i => s"t${i % 7}").mkString(" ")
    val uText = (0 until 30).map(i => s"u${i % 7}").mkString(" ")
    val all = ((0L until 4L).map(i => (i, "en", tText)) ++
      (4L until 8L).map(i => (i, "de", tText)) ++
      (8L until 16L).map(i => (i, "fr", uText))).toDF("doc_id", "lang", "text")
    def cens(df: org.apache.spark.sql.DataFrame) = TrainData3.dsCensus(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val merged = (cens(all.filter(col("doc_id") % 3 =!= 0)).toSeq ++
        cens(all.filter(col("doc_id") % 3 === 0)).toSeq)
      .groupBy(_._1).map { case (b, xs) =>
        b -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum) }
    assert(TrainData3.dsModelFromCensus(merged) == TrainData3.dsModel(all),
      "DSIR refresh diverged from full retrain")
    // NB: same algebra including the b = -1 class cell
    val keepText = (0 until 40).map(i => s"a$i").mkString(" ")
    val dropText = (0 until 10).map(i => s"b$i").mkString(" ")
    val nbAll = ((0L until 10L).map(i => i -> keepText) ++
      (10L until 20L).map(i => i -> dropText)).toDF("doc_id", "text")
    def nbCens(df: org.apache.spark.sql.DataFrame) = TrainData3.nbCensus(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nbMerged = (nbCens(nbAll.filter(col("doc_id") % 3 =!= 0)).toSeq ++
        nbCens(nbAll.filter(col("doc_id") % 3 === 0)).toSeq)
      .groupBy(_._1).map { case (b, xs) =>
        b -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum) }
    val (nk, nd) = nbMerged.getOrElse(-1L, (0L, 0L))
    val spine = IndexedSeq.tabulate(64)(b => nbMerged.getOrElse(b.toLong, (0L, 0L)))
    assert(TrainData3.nbModelFromCensus((spine, nk, nd)) ==
      TrainData3.nbModel(nbAll),
      "NB refresh diverged from full retrain")
  }

  test("q173/q174: tokenizer models served from parquet reload equal the in-memory serve") {
    // persistence must be invisible: the reload-served output IS the
    // source query's output (they also share the oracle, so this pin
    // plus the gate covers both engines)
    val bpe = q("q173_bpe_persist").collect().map(_.toSeq).toSeq
    assert(bpe == q("q163_bpe_tokenize").collect().map(_.toSeq).toSeq,
      "BPE persisted-model serve diverged from q163")
    val uni = q("q174_unigram_persist").collect().map(_.toSeq).toSeq
    assert(uni == q("q165_unigram_encode").collect().map(_.toSeq).toSeq,
      "unigram persisted-model serve diverged from q165")
  }

  test("q168: the reloaded index serves exactly what an in-memory rebuild serves") {
    import graft.queries.{TrainData, TrainData2}
    import graft.operators.{IvfFlat, PqAdc}
    val corpus = TrainData.embParallel(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = TrainData.trainedCentroids(spark, dir)
    val codebooks = TrainData2.frozenCodebooks(spark, dir)
    val probes = graft.engine.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val rebuilt = PqAdc.search(
        PqAdc.encode(IvfFlat.assign(corpus, cents), codebooks, TrainData2.PqSub),
        probes, cents, codebooks, TrainData2.PqSub,
        nprobe = TrainData.IvfNprobe, shortlist = TrainData2.AdcShortlist,
        k = TrainData.IvfTopK)
      .select("probe_id", "cand_id", "rk")
    val reloaded = q("q168_index_persist")
    assert(reloaded.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(reloaded).isEmpty,
      "persisted index diverges from the in-memory build")
    assert(reloaded.count() == 5L * TrainData.IvfTopK)
  }
}
