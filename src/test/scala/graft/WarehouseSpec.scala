package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Semantic pins for the warehouse-operations queries (q119–q125) — each
  * invariant here is one the DuckDB hash gate can't state on its own
  * (conservation laws, one-sided guarantees, brute-force replays). */
class WarehouseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q119: PIT snapshot covers exactly the keys that exist on the date") {
    val rows = q("q119_scd2_pit").collect()
    val pitCustomers = rows.map(_.getAs[Long]("n_customers")).sum
    // ≤1 surviving version per key ⇒ snapshot size == #keys with any
    // version started on or before the PIT date
    val expected = Tables.orders(spark, dir)
      .filter(col("o_orderdate") <= lit("1998-06-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    assert(pitCustomers == expected, s"$pitCustomers vs $expected")
    assert(rows.forall(_.getAs[Double]("sum_price") > 0))
  }

  test("q120: CMS inner-product estimate is a one-sided overestimate") {
    val r = q("q120_join_estimate").collect().head
    assert(r.getAs[Boolean]("over_ok"), r.toString)
    assert(r.getAs[Long]("est_rows") >= r.getAs[Long]("exact_rows"))
    // orders⋈customer on custkey preserves every order exactly once
    assert(r.getAs[Long]("exact_rows") == r.getAs[Long]("n_left"))
  }

  test("q121: per-doc top-3 ranks are contiguous and scores descend") {
    val rows = q("q121_tfidf_keywords").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, part) =>
      val sorted = part.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length),
        s"doc $id ranks not contiguous")
      assert(sorted.length <= 3)
      val scores = sorted.map(_.getAs[Long]("score_fp"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not descending")
    }
  }

  test("q122: layouts agree on true matches; z-order prunes at least as well") {
    val rows = q("q122_zorder_audit").collect()
    val byLayout = rows.map(r => r.getAs[String]("layout") -> r).toMap
    val lin = byLayout("linear"); val zo = byLayout("zorder")
    // the probe's true result is layout-independent
    assert(lin.getAs[Long]("n_match") == zo.getAs[Long]("n_match"))
    // every true match lives in a scanned file
    rows.foreach(r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("n_match"), r.toString))
    // on the pinned corpora the 2-D layout prunes both dimensions where
    // linear prunes only the leading one
    assert(zo.getAs[Long]("n_files_hit") <= lin.getAs[Long]("n_files_hit"),
      s"zorder ${zo} vs linear ${lin}")
  }

  test("q123: MAD verdicts match a brute-force median replay per type") {
    val rows = q("q123_mad_outliers").collect()
    assert(rows.length == 5)
    val cents = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    def lowerMedian(xs: Seq[Long]): Long = xs((xs.length + 1) / 2 - 1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = cents(t).toSeq
      val med = lowerMedian(xs)
      assert(r.getAs[Long]("med_cents") == med, s"$t median")
      val mad = lowerMedian(xs.map(x => math.abs(x - med)).sorted)
      assert(r.getAs[Long]("mad_cents") == mad, s"$t MAD")
      val outliers = xs.count(x => math.abs(x - med) * 10000L > mad * (3L * 14826L))
      assert(r.getAs[Long]("n_outliers") == outliers, s"$t outliers")
      assert(r.getAs[Long]("n_events") == xs.length)
    }
  }

  test("q124: attribution credits conserve the purchase value exactly") {
    val rows = q("q124_attribution").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_touches")
      val cents = r.getAs[Long]("cents")
      val base = r.getAs[Long]("credit_base")
      val last = r.getAs[Long]("credit_last")
      assert(base * (k - 1) + last == cents, r.toString)
      assert(last >= base && k >= 1)
      assert(!r.getAs[java.sql.Timestamp]("first_click")
        .after(r.getAs[java.sql.Timestamp]("last_click")))
    }
  }

  test("q129: compaction groups conserve docs/bytes and keep shard order") {
    val rows = q("q129_compaction_plan").collect()
    assert(rows.nonEmpty)
    val d = Tables.documents(spark, dir)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.count())
    assert(rows.map(_.getAs[Long]("bytes")).sum ==
      d.agg(sum("n_chars")).collect().head.getLong(0))
    // order-preserving packing: group shard ranges never interleave
    val sorted = rows.sortBy(_.getAs[Long]("group_id"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("last_shard") < b.getAs[String]("first_shard"))
      case _ =>
    }
    // every group but the last reaches the target (next-fit invariant:
    // a group only closes once its running bytes pass the target)
    sorted.init.foreach(r => assert(r.getAs[Boolean]("reached_target"), r.toString))
  }

  test("q130: boundaries are monotone and sit exactly at the k*n/8 ranks") {
    val rows = q("q130_range_boundaries").collect()
    assert(rows.map(_.getAs[Int]("k") : Int).toSeq == (1 to 7))
    val n = Tables.lineitem(spark, dir).count()
    val bins = rows.map(_.getAs[Long]("boundary_bin"))
    assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      val k = r.getAs[Int]("k").toLong
      val below = r.getAs[Long]("rows_below")
      assert(below * 8 >= k * n, s"k=$k rank not reached")
    }
  }

  test("q131: the injected hot key is flagged with a leveling salt fan-out") {
    val rows = q("q131_skew_audit").collect()
    val hot = rows.filter(_.getAs[Boolean]("hot"))
    assert(hot.map(_.getAs[Long]("key")).toSeq == Seq(0L),
      "exactly the injected key must be hot")
    val h = hot.head
    // a quarter of the fact folds onto key 0 → ~8 of 32 partitions' load
    assert(h.getAs[Long]("salt_buckets") >= 8)
    // ~a quarter of ORDERS fold over; lineitem fan-out makes the row
    // share wander around that
    assert(h.getAs[Long]("share_bp") >= 2000 && h.getAs[Long]("share_bp") <= 4000)
    // salt_buckets == ceil(cnt*32/n) for every reported key
    val n = Tables.lineitem(spark, dir).count()
    rows.foreach(r => assert(r.getAs[Long]("salt_buckets") ==
      (r.getAs[Long]("cnt") * 32 + n - 1) / n, r.toString))
  }

  test("q132: triangle count matches a brute-force set replay") {
    val r = q("q132_triangle_count").collect().head
    // replay: same synthetic edges, naive set-based triangle count
    val n = Tables.documents(spark, dir).count()
    val edges = Tables.documents(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).flatMap { s =>
        (1 to 3).map(j => (s, (s * s * 31 + j * 97) % n)).filter(p => p._1 != p._2)
      }.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tri = (for {
      (u, vs) <- adj.toSeq
      v <- vs.toSeq // Seq, not Set — a Set comprehension would dedup the 1s
      w <- adj.getOrElse(v, Set.empty[Long]).toSeq
      if vs.contains(w)
    } yield 1).size
    assert(r.getAs[Long]("n_triangles") == tri, s"got ${r} want $tri")
    assert(r.getAs[Long]("n_edges") == edges.size)
    assert(r.getAs[Long]("closure_ppm") <= 1000000)
  }

  test("q133: quartile bins cover all docs with non-overlapping ranges") {
    val rows = q("q133_quantile_bins").collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_chars") < b.getAs[Long]("min_chars"))
      case _ =>
    }
    // quartiles: no bin may hold more than the rank rule allows
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach(r => assert(r.getAs[Long]("n_docs") <= (n + 3) / 4 +
      n / 10, s"bin far off quartile mass: $r")) // ties can spill a little
  }

  test("q134: argmax matches a brute-force per-nation replay") {
    val rows = q("q134_argmax_top").collect()
    assert(rows.length == 25)
    val cust = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val xs = cust(r.getAs[String]("n_name"))
      val want = xs.maxBy(x =>
        math.round(x.getDouble(2) * 100) * (1L << 20) + x.getLong(1))
      assert(r.getAs[Long]("top_custkey") == want.getLong(1), r.toString)
      assert(r.getAs[Long]("n_customers") == xs.length)
    }
  }

  test("q135: imputation fills exactly the injected holes with the group median") {
    val rows = q("q135_median_impute").collect()
    assert(rows.length == 5)
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("c")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val xs = e(r.getAs[String]("event_type"))
      val holes = xs.count(_.getLong(1) % 7 == 0)
      assert(r.getAs[Long]("n_imputed") == holes, r.toString)
      val kept = xs.filter(_.getLong(1) % 7 != 0).map(_.getLong(2)).sorted
      val med = kept((kept.length + 1) / 2 - 1)
      assert(r.getAs[Long]("imputed_cents") == med, r.toString)
      assert(r.getAs[Long]("sum_cents_after") == kept.sum + holes * med, r.toString)
    }
  }

  test("q136: debounce keeps exactly the burst-leading events") {
    val rows = q("q136_debounce").collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_raw")))
    // replay one type sequentially
    val t = rows.head.getAs[String]("event_type")
    val evs = Tables.events(spark, dir)
      .filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"))
      .collect().groupBy(_.getLong(0))
    var kept = 0L; var keptSum = 0L
    evs.values.foreach { xs =>
      var prev = Long.MinValue
      xs.sortBy(r => (r.getLong(2), r.getLong(1))).foreach { r =>
        if (prev == Long.MinValue || r.getLong(2) - prev > 5000000L) {
          kept += 1; keptSum += r.getLong(1)
        }
        prev = r.getLong(2)
      }
    }
    assert(rows.head.getAs[Long]("n_kept") == kept)
    assert(rows.head.getAs[Long]("kept_id_sum") == keptSum)
  }

  test("q137: rolling distinct matches a direct trailing-24h recount") {
    val rows = q("q137_rolling_distinct").collect()
    assert(rows.nonEmpty)
    val uh = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // recount a few report hours directly
    (rows.take(5) ++ rows.takeRight(5)).foreach { r =>
      val rh = r.getAs[Long]("rh")
      val want = uh.filter(p => p._2 > rh - 24 && p._2 <= rh).map(_._1).distinct.length
      assert(r.getAs[Long]("n_users_24h") == want, s"rh=$rh")
    }
  }

  test("q138: two-hop reach matches a brute-force BFS replay") {
    val rows = q("q138_two_hop_reach").collect()
    assert(rows.length == 20)
    val n = Tables.documents(spark, dir).count()
    val edges = Tables.documents(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).flatMap { s =>
        (1 to 3).map(j => (s, (s * s * 31 + j * 97) % n)).filter(p => p._1 != p._2)
      }
    val sym = edges.flatMap(p => Seq(p, p.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("doc_id")
      val h1 = adj(a)
      val h2 = (h1 ++ h1.flatMap(adj.getOrElse(_, Set.empty[Long]))) - a
      assert(r.getAs[Long]("n_1hop") == h1.size, s"node $a 1hop")
      assert(r.getAs[Long]("n_2hop") == h2.size, s"node $a 2hop")
    }
  }

  test("q139: transitions conserve events and shares sum to ~10000 bp") {
    val rows = q("q139_transition_matrix").collect()
    assert(rows.nonEmpty)
    val nEvents = Tables.events(spark, dir).count()
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_trans")).sum == nEvents - nUsers,
      "each user contributes exactly (events-1) transitions")
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, part) =>
      val s = part.map(_.getAs[Long]("share_bp")).sum
      assert(s > 10000 - part.length && s <= 10000, s"$f shares sum $s")
    }
  }

  test("q140: contingency cells conserve docs; flags are exclusive") {
    val rows = q("q140_contingency").collect()
    assert(rows.map(_.getAs[Long]("obs")).sum ==
      Tables.documents(spark, dir).count())
    rows.foreach(r => assert(
      !(r.getAs[Boolean]("over_rep") && r.getAs[Boolean]("under_rep")), r.toString))
  }

  test("q141: Benford digits partition the orders; ppm shares sum to ~1e6") {
    val rows = q("q141_benford").collect()
    assert(rows.map(_.getAs[Long]("digit")).forall(d => d >= 1 && d <= 9))
    assert(rows.map(_.getAs[Long]("n_obs")).sum ==
      Tables.orders(spark, dir).count())
    val s = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(s > 1000000 - rows.length && s <= 1000000, s"ppm sum $s")
    // uniform synthetic prices are NOT Benford — the audit must fire
    assert(rows.exists(_.getAs[Boolean]("flagged")))
  }

  test("q142: deciles partition customers; cumulative share is monotone to 100%") {
    val rows = q("q142_pareto").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L to 9L))
    assert(rows.map(_.getAs[Long]("n_cust")).sum ==
      Tables.orders(spark, dir).select("o_custkey").distinct().count())
    // descending-revenue deciles: per-decile share never increases
    val shares = rows.map(_.getAs[Long]("share_bp"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b }, shares.toSeq)
    val cums = rows.map(_.getAs[Long]("cum_share_bp"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last == 10000L, "cumulative share must close at 100%")
  }

  test("q143: conversion and abandonment partition the click stream") {
    val rows = q("q143_conversion").collect()
    assert(rows.nonEmpty)
    val nClicks = Tables.events(spark, dir)
      .filter(col("event_type") === "click").count()
    assert(rows.map(_.getAs[Long]("n_clicks")).sum == nClicks)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") + r.getAs[Long]("n_abandoned") ==
        r.getAs[Long]("n_clicks"), r.toString)
      assert(r.getAs[Long]("conversion_bp") <= 10000L)
    }
  }

  test("q144: gap accounting is internally consistent per type") {
    val rows = q("q144_gap_audit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_span") ==
        r.getAs[Long]("n_active") + r.getAs[Long]("n_gap_days"), r.toString)
      assert(r.getAs[Long]("longest_gap_days") <= r.getAs[Long]("n_gap_days"))
      assert((r.getAs[Long]("n_outages") == 0) ==
        (r.getAs[Long]("n_gap_days") == 0))
    }
  }

  test("q145: disorder audit matches a sequential batch replay") {
    val rows = q("q145_disorder_audit").collect()
    assert(rows.length == 5)
    val byType = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("t"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val xs = byType(r.getAs[String]("event_type"))
      val batches = xs.groupBy(_.getLong(1) / 1000).toSeq.sortBy(_._1)
        .map { case (_, es) => (es.map(_.getLong(2)).min, es.map(_.getLong(2)).max) }
      var runMax = Long.MinValue; var worst = 0L; var late = 0L
      batches.foreach { case (mn, mx) =>
        if (runMax != Long.MinValue && mn < runMax) {
          late += 1; worst = math.max(worst, runMax - mn)
        }
        runMax = math.max(runMax, mx)
      }
      assert(r.getAs[Long]("n_batches") == batches.length)
      assert(r.getAs[Long]("n_late_batches") == late, r.toString)
      assert(r.getAs[Long]("max_lateness_us") == worst, r.toString)
      // the suggested delay covers the worst observed regression
      assert(r.getAs[Long]("watermark_delay_s") * 1000000L >= worst)
    }
  }

  test("q125: merged intervals match a sequential sweep replay") {
    val rows = q("q125_interval_merge").collect()
    assert(rows.nonEmpty)
    val iv = 1800L * 1000000L
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val starts = byUser(u).toSeq
      // sequential interval union sweep
      var n = 0L; var covered = 0L; var longest = 0L
      var curS = -1L; var curE = -1L
      starts.foreach { s =>
        if (curE < 0 || s > curE) {
          if (curE >= 0) { covered += curE - curS; longest = math.max(longest, curE - curS) }
          n += 1; curS = s; curE = s + iv
        } else curE = math.max(curE, s + iv)
      }
      if (curE >= 0) { covered += curE - curS; longest = math.max(longest, curE - curS) }
      assert(r.getAs[Long]("n_intervals") == n, s"user $u islands")
      assert(r.getAs[Long]("covered_us") == covered, s"user $u covered")
      assert(r.getAs[Long]("longest_us") == longest, s"user $u longest")
      assert(r.getAs[Long]("n_events") == starts.length)
    }
  }

  test("q142: value-census rank path equals the exact-window path") {
    val exact = graft.queries.Warehouse
      .q142Pareto(spark, dir, forceScalePath = Some(false)).collect().toSeq
    val census = graft.queries.Warehouse
      .q142Pareto(spark, dir, forceScalePath = Some(true)).collect().toSeq
    assert(exact.nonEmpty)
    assert(exact == census,
      s"paths diverge:\nexact=${exact.mkString("\n")}\ncensus=${census.mkString("\n")}")
  }

  test("q138: degree-oriented wedge path equals the naive self-join path") {
    val naive = graft.queries.Warehouse
      .q138TwoHop(spark, dir, forceOriented = Some(false)).collect().toSeq
    val oriented = graft.queries.Warehouse
      .q138TwoHop(spark, dir, forceOriented = Some(true)).collect().toSeq
    assert(naive.nonEmpty)
    assert(naive == oriented,
      s"paths diverge:\nnaive=${naive.mkString("\n")}\noriented=${oriented.mkString("\n")}")
  }
}
