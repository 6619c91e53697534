package graft

import org.apache.spark.sql.functions._

/** Semantic + plan pins for the relational-classic queries (q102–q104). */
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
}
