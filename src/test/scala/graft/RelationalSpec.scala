package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Semantic + plan pins for the relational-classic queries (q102–q111). */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q102: all dims broadcast, facts hash-join, no nested loops") {
    val df = q("q102_regional_volume")
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s.take(600))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s.take(800))
    val rows = df.collect()
    // ASIA holds 1/5 of the nations; revenue positive wherever reported
    assert(rows.length <= 5 && rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q103: window invariants hold per partition") {
    val rows = q("q103_window_suite").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (_, part) =>
      // input already sorted by (priority, price, key): positional checks
      assert(part.head.isNullAt(part.head.fieldIndex("second_seen")),
        "nth_value(2) must be NULL on the first row of the frame")
      assert(part.forall(r => r.getAs[Long]("quartile") >= 1 &&
        r.getAs[Long]("quartile") <= 4))
      assert(part.head.getAs[Double]("pct_rank") == 0.0)
      assert(part.last.getAs[Double]("cume") == 1.0)
      // last_value over the running frame is the current row's key
      part.foreach(r =>
        assert(r.getAs[Long]("current_key") == r.getAs[Long]("o_orderkey")))
      // cheapest_so_far never changes after the first row
      assert(part.forall(_.getAs[Long]("cheapest_so_far") ==
        part.head.getAs[Long]("o_orderkey")))
    }
  }

  test("q105: RANGE frame equals a brute-force trailing sum over gappy minutes") {
    val rows = q("q105_range_trailing").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("minute_idx"),
        r.getAs[Long]("n"), r.getAs[Long]("trailing_60m")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, part) =>
      val byMin = part.map(p => p._2 -> p._3).toMap
      part.foreach { case (_, m, n, trailing) =>
        val want = (m - 59 to m).flatMap(byMin.get).sum
        assert(trailing == want, s"minute $m: trailing $trailing != $want")
        assert(trailing >= n)
      }
    }
  }

  test("q106: the spine is gap-free and forward fill carries the last observation") {
    val rows = q("q106_gap_fill").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, part) =>
      // contiguous hourly spine: row count == span + 1
      val hours = part.map(_.getAs[java.sql.Timestamp]("hour").getTime)
      assert(hours.max - hours.min == (part.length - 1) * 3600000L,
        s"$t: spine has holes or duplicates")
      // fill semantics: gaps copy the previous filled value; observed
      // hours may change it; no row after the first observation is null
      part.sliding(2).foreach {
        case Array(prev, cur) =>
          if (cur.getAs[Boolean]("is_gap"))
            assert(cur.getAs[Double]("filled_value") ==
              prev.getAs[Double]("filled_value"),
              s"$t: a gap hour changed the filled value")
        case _ =>
      }
      assert(part.forall(r => !r.isNullAt(r.fieldIndex("filled_value"))),
        s"$t: spine starts at the first observation, so no leading nulls")
      // gap rows really are gaps
      part.foreach(r =>
        assert(r.getAs[Boolean]("is_gap") == (r.getAs[Long]("n_obs") == 0L)))
    }
  }

  test("q104: the CUBE lattice is complete and internally consistent") {
    val rows = q("q104_cube_stats").collect()
    def cells(gs: Long, gy: Long) = rows.filter(r =>
      r.getAs[Long]("g_status") == gs && r.getAs[Long]("g_year") == gy)
    assert(cells(1, 1).length == 1, "exactly one grand-total row")
    val grand = cells(1, 1).head.getAs[Long]("n_orders")
    assert(cells(0, 0).map(_.getAs[Long]("n_orders")).sum == grand,
      "finest cells must sum to the grand total")
    assert(cells(1, 0).map(_.getAs[Long]("n_orders")).sum == grand,
      "per-year margin must sum to the grand total")
    assert(cells(0, 1).map(_.getAs[Long]("n_orders")).sum == grand,
      "per-status margin must sum to the grand total")
    // one aggregation pass: a single Expand feeds a single agg pair
    val s = q("q104_cube_stats").queryExecution.executedPlan.toString
    assert(s.contains("Expand"), s.take(600))
  }

  test("q115: grouping-set margins are mutually consistent, one Expand pass") {
    val rows = q("q115_grouping_sets").collect()
    def cells(gs: Long, gy: Long, gp: Long) = rows.filter(r =>
      r.getAs[Long]("g_status") == gs && r.getAs[Long]("g_year") == gy &&
        r.getAs[Long]("g_prio") == gp)
    val fine = cells(0, 0, 1) // (status, year)
    val statusMargin = cells(0, 1, 1) // (status)
    val prioMargin = cells(1, 1, 0) // (priority)
    assert(fine.nonEmpty && statusMargin.nonEmpty && prioMargin.nonEmpty)
    assert(fine.length + statusMargin.length + prioMargin.length == rows.length,
      "exactly the three declared sets, nothing else (no CUBE lattice)")
    // the (status) margin re-aggregates the (status, year) cells
    statusMargin.foreach { m =>
      val st = m.getAs[String]("o_orderstatus")
      assert(fine.filter(_.getAs[String]("o_orderstatus") == st)
        .map(_.getAs[Long]("n_orders")).sum == m.getAs[Long]("n_orders"))
    }
    // both full margins cover every order
    assert(statusMargin.map(_.getAs[Long]("n_orders")).sum ==
      prioMargin.map(_.getAs[Long]("n_orders")).sum)
    val s = q("q115_grouping_sets").queryExecution.executedPlan.toString
    assert(s.contains("Expand"), s.take(600))
  }

  test("q116: null-safe join keeps the NULL bucket and plans as a hash join") {
    val df = q("q116_nullsafe_join")
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s.take(800))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s.take(800))
    val rows = df.collect()
      .map(r => r.getAs[String]("tier") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_null_key"))).toMap
    // the NULL bucket survived, and only it carries NULL keys
    assert(rows.contains("unknown") && rows("unknown")._1 == rows("unknown")._2)
    assert(rows.filterNot(_._1 == "unknown").values.forall(_._2 == 0L))
    // a plain `=` join would have dropped the unknown rows: conservation
    val nEvents = Tables.events(spark, dir).count()
    assert(rows.values.map(_._1).sum == nEvents)
    assert(rows("unknown")._1 > 0)
  }

  private def lineitemScans(df: org.apache.spark.sql.DataFrame): Int =
    "lineitem".r.findAllIn(
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("FileScan")).mkString("\n")).length

  test("q108: window decorrelation scans the fact once and matches brute force") {
    val df = q("q108_small_qty_revenue")
    // the scalar subquery must NOT become a self-join: one lineitem scan
    assert(lineitemScans(df) == 1,
      df.queryExecution.executedPlan.toString.take(800))
    val got = df.collect()
      .map(r => r.getAs[Long]("partkey") -> r.getAs[Long]("n_small")).toMap
    // brute-force replay: per-part avg over the brand slice
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#12")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getAs[Double](1).toLong))
      .filter(p => parts(p._1))
    val want = li.groupBy(_._1).flatMap { case (pk, xs) =>
      val sum = xs.map(_._2).sum; val cnt = xs.length
      val n = xs.count(x => x._2 * 5 * cnt < sum)
      if (n > 0) Some(pk -> n.toLong) else None
    }
    assert(got == want)
  }

  test("q109: window-decorrelated EXISTS/NOT-EXISTS matches brute force, one fact scan") {
    val df = q("q109_only_late_supplier")
    assert(lineitemScans(df) == 1,
      df.queryExecution.executedPlan.toString.take(800))
    val got = df.collect().map(r =>
      (r.getAs[Long]("suppkey"), r.getAs[Long]("numwait")))
    assert(got.length <= 20 && got.nonEmpty)
    // brute force at fixture scale
    val od = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sixtyDays = 60L * 86400L
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate").cast("timestamp").cast("long"))
      .collect()
      .flatMap { r =>
        od.get(r.getLong(0)).map { d =>
          ((r.getLong(0), r.getLong(1)), r.getLong(2) > d + sixtyDays)
        }
      }
      .groupBy(_._1).map { case (k, xs) => k -> xs.exists(_._2) }
    val byOrder = perSupp.groupBy(_._1._1)
    val numwait = byOrder.values.flatMap { suppliers =>
      val late = suppliers.filter(_._2)
      if (suppliers.size > 1 && late.size == 1) late.keys.map(_._2) else Nil
    }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    got.foreach { case (s, n) =>
      assert(numwait.get(s).contains(n), s"supplier $s: $n vs ${numwait.get(s)}")
    }
    // the limit keeps the TOP suppliers: every kept numwait >= every dropped
    val kept = got.map(_._2).min
    val dropped = numwait.filterNot(kv => got.exists(_._1 == kv._1)).values
    assert(dropped.forall(_ <= kept))
  }

  test("q110: distribution conserves customers and orders (zeros preserved)") {
    val rows = q("q110_custdist").collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist"))
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_._2).sum == nCust,
      "every customer lands in exactly one count bucket")
    val nOrders = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(rows.map(kv => kv._1 * kv._2).sum == nOrders,
      "count-weighted buckets must conserve the order total")
  }

  test("q111: 1-row global aggregate joins hash, not nested-loop; brute-force match") {
    val df = q("q111_idle_rich")
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s.take(800))
    val got = df.collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n_cust")).toMap
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getAs[Double](2) * 100)))
    val posCents = cust.map(_._3).filter(_ > 0)
    val (sumC, nPos) = (posCents.sum, posCents.length.toLong)
    val active = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val want = cust
      .filter(c => c._3 * nPos > sumC && !active(c._1))
      .groupBy(_._2).map { case (seg, xs) => seg -> xs.length.toLong }
    assert(got == want)
    assert(got.values.sum > 0, "the dormancy window must keep the gate non-trivial")
  }

  test("q126: returns exactly the argmax suppliers of an independent recompute") {
    val df = q("q126_top_supplier")
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s.take(800))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        math.round(r.getDouble(1) * 100) * (100L - math.round(r.getDouble(2) * 100))).sum)
    val maxRev = rev.values.max
    val want = rev.filter(_._2 == maxRev).keys.toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == want)
    rows.foreach(r =>
      assert(r.getAs[Double]("total_revenue") == maxRev / 10000.0))
  }

  test("q127: every surviving order truly exceeds the quantity threshold") {
    val rows = q("q127_big_orders").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
    // spot-replay the top order's quantity sum from the fact
    val top = rows.head
    val replay = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") === top.getAs[Long]("o_orderkey"))
      .agg(sum("l_quantity")).collect().head.getDouble(0)
    assert(replay == top.getAs[Double]("total_qty"))
    // ordering: descending qty with orderkey tie-break
    val qtys = rows.map(_.getAs[Double]("total_qty"))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b })
  }

  test("q128: survivors sit above 1.2x the mean part share; ordering pinned") {
    val rows = q("q128_part_share").collect()
    assert(rows.nonEmpty)
    val pv = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => math.round(r.getDouble(1) * 100)).sum).toMap
    val total = pv.values.sum; val nParts = pv.size.toLong
    val want = pv.filter { case (_, c) => c * nParts * 10 > total * 12 }
    assert(rows.map(_.getAs[Long]("l_partkey")).toSet == want.keys.toSet)
    rows.foreach { r =>
      val cents = want(r.getAs[Long]("l_partkey"))
      assert(r.getAs[Double]("part_value") == cents / 100.0)
      assert(r.getAs[Long]("share_bp") == cents * 10000 / total)
    }
  }
}
