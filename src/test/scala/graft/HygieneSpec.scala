package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 hygiene/governance queries (q93–q96) —
  * the invariants each operator promises, checked at sf0.001 (the
  * driver's DuckDB gate re-checks exact equality at sf0.01). */
class HygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q93: apportionment is exact — allocations sum to the budget, extras go to top remainders") {
    val rows = q("q93_eval_allocation").collect()
    assert(rows.nonEmpty)
    val alloc = rows.map(_.getAs[Long]("alloc")).sum
    assert(alloc == 1000L, s"allocations sum to $alloc, not the 1000 budget")
    // every allocation is floor or floor+1, never more
    rows.foreach { r =>
      val d = r.getAs[Long]("alloc") - r.getAs[Long]("floor_alloc")
      assert(d == 0L || d == 1L, s"stratum got $d extra seats")
    }
    // monotone-ish sanity: a stratum with zero tokens gets zero
    assert(rows.forall(r => r.getAs[Long]("n_tok") > 0 || r.getAs[Long]("alloc") == 0L))
  }

  test("q94: every planted canary is found with exactly the planted frequency") {
    val rows = q("q94_canary_scan").orderBy("canary_id").collect()
    assert(rows.length == 5, "every canary appears in the report")
    // expectation straight from the plant rule: docs with id%37==0, keyed id%5
    val expected = graft.engine.Tables.documents(spark, dir)
      .filter(col("doc_id") % 37 === 0)
      .groupBy((col("doc_id") % 5).as("canary_id"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("first"))
      .collect().map(r => r.getAs[Long]("canary_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("first"))).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("canary_id")
      expected.get(id) match {
        case Some((n, first)) =>
          assert(r.getAs[Long]("n_hits") == n && r.getAs[Long]("first_doc") == first,
            s"canary $id: got (${r.getAs[Long]("n_hits")}, ${r.getAs[Long]("first_doc")}), want ($n, $first)")
        case None => // un-planted canary: reported, zero hits, null first_doc
          assert(r.getAs[Long]("n_hits") == 0L && r.isNullAt(r.fieldIndex("first_doc")),
            s"absent canary $id must report 0 hits / null first_doc")
      }
    }
  }

  test("q95: verdict counts partition every TLD's docs; ads precedence over blocklist") {
    val rows = q("q95_domain_filter").collect()
    val total = rows.map(_.getAs[Long]("n_total")).sum
    assert(total == graft.engine.Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val parts = r.getAs[Long]("n_blocked_subdomain") +
        r.getAs[Long]("n_blocked_domain") + r.getAs[Long]("n_kept")
      assert(parts == r.getAs[Long]("n_total"),
        s"tld ${r.getAs[String]("tld")}: verdicts don't partition ($parts)")
    }
    // ~3/11 of docs are ads-blocked regardless of domain list membership
    assert(rows.map(_.getAs[Long]("n_blocked_subdomain")).sum > 0)
  }

  test("q96: the cleaner restores every document exactly") {
    val rows = q("q96_text_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_restored") == r.getAs[Long]("n_docs"),
        s"lang ${r.getAs[String]("lang")}: cleaner failed to restore " +
          s"${r.getAs[Long]("n_docs") - r.getAs[Long]("n_restored")} docs")
      assert(r.getAs[Long]("chars_removed") >= r.getAs[Long]("n_dirty"),
        "every dirty doc must lose at least one injected char")
    }
  }

  test("q97: per-stratum picks = min(alloc, stratum size), hash-deterministic, and bounded-window planned") {
    val picks = q("q97_stratified_pick")
    val perStratum = picks.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_picked"), max("pick_rank").as("max_rank"))
      .collect()
    val alloc = SparkEntry.queries("q93_eval_allocation")(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("alloc"), r.getAs[Long]("n_docs"))).toMap
    perStratum.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val (a, nDocs) = alloc(key)
      val want = math.min(a, nDocs)
      assert(r.getAs[Long]("n_picked") == want,
        s"stratum $key picked ${r.getAs[Long]("n_picked")}, want min($a, $nDocs)")
      // ranks are contiguous 1..n_picked (no holes from the alloc cut)
      assert(r.getAs[Long]("max_rank") == want)
    }
    // the literal rank bound plans as a partial-mode group limit
    val s = picks.queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s.take(800))
  }

  test("q98: found <= truth and found <= cand per probe; planted dups are audited") {
    val rows = q("q98_lsh_recall").collect()
    assert(rows.nonEmpty, "the audit slice must have signal at sf0.001")
    rows.foreach { r =>
      val (t, c, f) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_found"))
      assert(f <= t && f <= c,
        s"probe ${r.getAs[Long]("probe_doc")}: found $f exceeds truth $t or cand $c")
    }
    // the audit is not vacuous: some probe has ground-truth near-dups
    assert(rows.exists(_.getAs[Long]("n_truth") > 0))
  }

  test("q99: incremental label merge equals clustering from scratch") {
    // the oracle gate proves merge == full recompute vs DuckDB; this pins
    // the same equivalence engine-side, directly on the summary rows
    val merged = q("q99_incremental_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val scratch = q("q49_neardup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == scratch,
      s"incremental clusters diverge from scratch: ${merged.diff(scratch).take(3)}")
  }

  test("q100: cluster-aware split leaks zero near-dup pairs and partitions the corpus") {
    val rows = q("q100_cluster_split").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("leak_pairs") == 0L,
      s"cluster-keyed split must leak no pairs, got ${r.getAs[Long]("leak_pairs")}"))
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == graft.engine.Tables.documents(spark, dir).count())
    // the doc-level split q77 audits DOES leak here — the remediation is real
    val leaked = SparkEntry.queries("q77_split_leakage")(spark, dir).count()
    assert(leaked > 0, "q77's doc-level split should show leakage at sf0.001")
  }

  test("q101: every folded pair is true distance 1, typo side is rarer, planted typos found") {
    val rows = q("q101_fuzzy_vocab").collect()
    assert(rows.nonEmpty, "planted typos must surface at sf0.001")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      val (v, c) = (r.getAs[String]("variant_w"), r.getAs[String]("canonical_w"))
      assert(lev(v, c) == 1, s"($v, $c) is not edit-distance 1")
      val (fv, fc) = (r.getAs[Long]("f_variant"), r.getAs[Long]("f_canonical"))
      assert(fv < fc || (fv == fc && v > c), s"fold direction wrong for ($v, $c)")
    }
    // the known planted deletion: 'batch' with 2nd char dropped
    assert(rows.exists(r => r.getAs[String]("variant_w") == "btch" &&
      r.getAs[String]("canonical_w") == "batch"))
  }

  test("q93-q101 plans: no cartesian products or nested-loop joins") {
    Seq("q93_eval_allocation", "q94_canary_scan", "q95_domain_filter",
        "q96_text_normalize", "q97_stratified_pick", "q98_lsh_recall",
        "q99_incremental_clusters", "q100_cluster_split", "q101_fuzzy_vocab")
      .foreach { name =>
        val s = q(name).queryExecution.executedPlan.toString
        assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
          s"$name: ${s.take(400)}")
      }
  }
  test("q98: the df-prefix truth plan yields the identical audit to the raw shingle join") {
    // the 100 TB selectable plan (PPJoin prefix pigeonhole at τ=1/2)
    // must be output-indistinguishable from the raw equi-join the
    // oracle replays — full row-for-row equality, not just set size
    val exact = graft.queries.Hygiene
      .q98Impl(spark, "/root/testdata/sf0.001", Some("exact"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val prefix = graft.queries.Hygiene
      .q98Impl(spark, "/root/testdata/sf0.001", Some("prefix"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(exact.nonEmpty, "audit produced no signal rows — corpus drifted?")
    assert(exact.toSeq == prefix.toSeq,
      s"plans diverge: ${exact.toSet.diff(prefix.toSet).take(3)} / ${prefix.toSet.diff(exact.toSet).take(3)}")
  }
}
