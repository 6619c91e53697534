package graft

/** Invariants of the training-pipeline layout queries (q57-q59) that the
  * row-hash oracle can't express: structural laws that must hold on ANY
  * corpus, checked on the sf0.001 fixture.
  */
class TrainPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q57: flags only non-eval docs, each with positive gram evidence") {
    val rows = SparkEntry.queries("q57_decontaminate")(spark, dir).collect()
    assert(rows.forall(r => r.getLong(r.fieldIndex("doc_id")) % 10 != 7),
      "an eval-slice doc leaked into the contamination report")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("q58: sequence count is exactly ceil(total_tok / cap) per source") {
    val cap = 512L
    val rows = SparkEntry.queries("q58_seq_packing")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, totalTok, nSeqs, nCrossing) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nSeqs == (totalTok - 1) / cap + 1,
        s"${r.getString(0)}: $nSeqs seqs for $totalTok tokens")
      assert(nCrossing <= nDocs && nCrossing <= nSeqs)
    }
  }

  test("q59: kept is a subset; 100%-rate sources keep everything") {
    val rows = SparkEntry.queries("q59_domain_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pct, nTotal, nKept) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nTotal)
      if (pct == 100) assert(nKept == nTotal,
        s"${r.getString(0)}: 100% mixture rate must keep all rows")
    }
  }
}
