package graft

import org.apache.spark.sql.functions.col

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

  test("q60: dup counts bounded by chunk counts; text null iff nothing kept") {
    val rows = SparkEntry.queries("q60_chunk_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nChunks, nDup) = (r.getLong(1), r.getLong(2))
      assert(nDup >= 1 && nDup <= nChunks)
      assert(r.isNullAt(3) == (nDup == nChunks),
        s"doc ${r.getLong(0)}: kept_text nullity disagrees with $nDup/$nChunks dups")
    }
  }

  test("q61: shares sum to ~1 and the allocation never exceeds the budget") {
    val rows = SparkEntry.queries("q61_temperature_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"share sum $shareSum")
    assert(rows.map(_.getLong(5)).sum <= 1000000L)
  }

  test("q62: shards are single hex digits with shares summing to ~1") {
    val rows = SparkEntry.queries("q62_shard_plan")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.forall(r => "0123456789abcdef".contains(r.getString(0))))
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"tok_share sum $shareSum")
  }

  test("q63: cumulative coverage is monotone and caps at 1") {
    val rows = SparkEntry.queries("q63_vocab_coverage")(spark, dir).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b },
      "cum_share must be strictly increasing")
    assert(shares.last <= 1.0 + 1e-12)
  }

  test("q64: exactly the planted contaminants, at full collision strength") {
    import org.apache.spark.sql.functions._
    val emb = graft.engine.Tables.embeddings(spark, dir)
    val offset = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    val planted = emb.filter(col("vec_id") % 50 === 7).count()
    val rows = SparkEntry.queries("q64_semantic_decontam")(spark, dir).collect()
    assert(rows.length == planted,
      s"expected the $planted planted copies, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(0) >= offset, "flagged a non-planted train vector")
      assert(r.getLong(1) % 10 == 7, "eval id outside the eval slice")
      assert(r.getLong(2) == 4, "an exact copy must collide in all 4 tables")
      assert(r.getDouble(3) > 0.999)
    }
  }

  test("q65: status counts reproduce the snapshot construction rules") {
    import org.apache.spark.sql.functions._
    val d = graft.engine.Tables.documents(spark, dir)
    val expect = Map(
      "added" -> d.filter(col("doc_id") % 7 === 3).count(),
      "removed" -> d.filter(col("doc_id") % 13 === 1).count(),
      "modified" -> d.filter(col("doc_id") % 5 === 0 && col("doc_id") % 7 =!= 3).count(),
      "unchanged" -> d.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 3).count())
    val got = SparkEntry.queries("q65_snapshot_diff")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect.filter(_._2 > 0), s"got $got, want $expect")
  }

  test("q66: one keeper per q49 cluster, never below the cluster minimum id") {
    val clusters = SparkEntry.queries("q49_neardup_clusters")(spark, dir).collect()
    val keepers = SparkEntry.queries("q66_quality_keeper")(spark, dir).collect()
    assert(keepers.length == clusters.length,
      "quality-keeper must emit exactly one row per near-dup cluster")
    keepers.foreach { r =>
      assert(r.getLong(0) <= r.getLong(1), "keeper outside its cluster id range")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000)
    }
  }

  test("q67: rates bound the sample; the 16/16 tier keeps everything") {
    val rows = SparkEntry.queries("q67_quality_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tier, rate, nTotal, nKept, tokTotal, tokKept) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nKept <= nTotal && tokKept <= tokTotal)
      if (rate == 16) assert(nKept == nTotal && tokKept == tokTotal,
        s"$tier: full-rate tier must keep all rows")
    }
  }

  test("q68: packed sequences are full except each source's last; text matches n_tok") {
    val cap = 512L
    val rows = SparkEntry.queries("q68_packed_write")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, seqs) =>
      val sorted = seqs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong),
        s"$src: sequence ids must be contiguous from 0")
      sorted.init.foreach(r => assert(r.getLong(2) == cap,
        s"$src seq ${r.getLong(1)}: interior sequence not full (${r.getLong(2)})"))
      assert(sorted.last.getLong(2) <= cap)
      sorted.foreach { r =>
        assert(r.getString(5).split(" ").length.toLong == r.getLong(2),
          "reassembled text token count disagrees with n_tok")
      }
    }
  }

  test("q58 predicts exactly the layout q68 materializes") {
    val stats = SparkEntry.queries("q58_seq_packing")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val packed = SparkEntry.queries("q68_packed_write")(spark, dir).collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) => src -> (rows.map(_.getLong(2)).sum, rows.length.toLong) }
    assert(packed == stats,
      s"stats (total_tok, n_seqs) disagree with materialization: $stats vs $packed")
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

  test("q69: clusters partition the corpus; cosine mass bounded by membership") {
    val rows = SparkEntry.queries("q69_kmeans_train")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val corpusN = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == corpusN,
      "every vector must land in exactly one cluster")
    rows.foreach { r =>
      val (n, cosSumE6) = (r.getLong(1), r.getLong(4))
      // member→assigned-centroid cosine ∈ (-1, 1]
      assert(cosSumE6 <= n * 1000000L && cosSumE6 >= -n * 1000000L,
        s"cluster ${r.getInt(0)}: cosine mass $cosSumE6 out of range for $n members")
    }
  }

  test("q70: per-label counts cover the corpus; errors are small and bounded") {
    val rows = SparkEntry.queries("q70_embedding_quantize")(spark, dir).collect()
    assert(rows.nonEmpty)
    val corpusN = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == corpusN)
    rows.foreach { r =>
      val (n, errSumE9, maxErr) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // int8 symmetric quantization: per-coordinate error ≤ scale/2 →
      // relative error well under 1; sum consistent with the max
      assert(maxErr >= 0 && maxErr < 1, s"label ${r.getInt(0)}: max_err $maxErr")
      assert(errSumE9 >= 0 && errSumE9 <= Math.round(n * maxErr * 1e9) + n,
        s"label ${r.getInt(0)}: err sum $errSumE9 inconsistent with max $maxErr")
    }
  }

  test("q73: pair kinds respect the batch split; scores in band range") {
    val rows = SparkEntry.queries("q73_incremental_lsh")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, s, kind) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))
      assert(s >= 2 && s <= 4, s"($a,$b): score $s outside band agreement range")
      kind match {
        case "new-old" => assert(a % 4 == 0 && b % 4 != 0,
          s"($a,$b): new-old pair must be (batch, index)")
        case "new-new" => assert(a % 4 == 0 && b % 4 == 0 && a < b,
          s"($a,$b): new-new pair must be ordered within the batch")
        case k => fail(s"unexpected pair_kind $k")
      }
    }
  }

  test("q74: shards cover the corpus; heads are within-shard and ≤ 3") {
    val rows = SparkEntry.queries("q74_corpus_shuffle")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val corpusN = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == corpusN)
    rows.foreach { r =>
      val heads = r.getString(2).split(",")
      assert(heads.nonEmpty && heads.length <= 3)
      assert(heads.length == math.min(3L, r.getLong(1)),
        s"shard ${r.getString(0)}: head sample shorter than the shard")
    }
  }

  test("q75: funnel stages partition the train slice; attribution is exclusive") {
    val rows = SparkEntry.queries("q75_curation_funnel")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trainN = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 7).count()
    assert(rows.values.sum == trainN,
      s"stage counts ${rows} must sum to the funneled corpus $trainN")
    assert(rows.contains("5_kept") && rows("5_kept") > 0, rows.toString)
    // the fixture corpus plants near-dups; exact dups may fall across the
    // eval boundary at tiny sf, so only the stage VOCABULARY is pinned
    assert(rows.getOrElse("2_near_dup", 0L) > 0, rows.toString)
    val valid = Set("1_exact_dup", "2_near_dup", "3_low_quality",
      "4_contaminated", "5_kept")
    assert(rows.keySet.subsetOf(valid), rows.toString)
  }

  test("q107: per-source funnel cells roll up exactly to q75's stage totals") {
    val cells = SparkEntry.queries("q107_funnel_by_source")(spark, dir).collect()
    val byStage = cells.groupBy(_.getAs[String]("stage"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n_docs")).sum }
    val q75Totals = SparkEntry.queries("q75_curation_funnel")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage == q75Totals,
      s"per-source cells $byStage disagree with q75 totals $q75Totals")
    assert(cells.forall(_.getAs[Long]("n_tok") > 0))
  }

  test("q76: trained-index search returns full ranked lists per probe") {
    val rows = SparkEntry.queries("q76_ivf_trained")(spark, dir).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet == Set(100L, 101L, 102L, 103L, 104L))
    byProbe.foreach { case (p, rs) =>
      assert(rs.map(_.getInt(4)).sorted.toSeq == (1 to rs.length),
        s"probe $p: ranks must be contiguous from 1")
      val cos = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"probe $p: cosine must be non-increasing in rank")
      assert(!rs.exists(_.getLong(1) == p), s"probe $p returned itself")
    }
  }

  test("q72: containment dominates Jaccard on the same pair set") {
    val contain = SparkEntry.queries("q72_containment_dedup")(spark, dir).collect()
    val jac = SparkEntry.queries("q23_ngram_jaccard")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(contain.nonEmpty, "fixture corpus has verbatim-overlap docs; q72 must find them")
    contain.foreach { r =>
      val (a, b, cd, c) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(c >= 0.5 && c <= 1.0, s"($a,$b): containment $c out of range")
      assert(cd == a || cd == b, s"($a,$b): contained_doc $cd is neither side")
      // |A∩B|/min(|A|,|B|) ≥ |A∩B|/|A∪B| always
      jac.get((a, b)).foreach(j => assert(c >= j, s"($a,$b): containment $c < jaccard $j"))
    }
  }
}
