package graft

import org.apache.spark.sql.functions._

/** q38's oracle gate hashes the exact count + tolerance boolean; this spec
  * additionally pins the boolean's meaning on the Spark side — the HLL++
  * estimate really is within 5% of the exact count, per group. */
class ProfileSpec extends SparkSpec {

  test("q38: within_tol is true and consistent with exact counts on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q38_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: estimate drifted past 5%")
    }
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("q71: shard-unioned sketch estimate lands within tolerance of exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q71_hll_shard_union")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("c"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val (users, events) = exact(r.getString(0))
      assert(r.getLong(1) == users && r.getLong(2) == events)
      assert(r.getBoolean(3),
        s"${r.getString(0)}: merged-sketch estimate drifted past 5% of $users")
    }
  }

  test("q91: share masses conserve the corpus and drift flags replay in rationals") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q91_profile_drift")(spark, dir).collect()
    val n = graft.engine.Tables.documents(spark, dir).count()
    Seq("share:lang", "share:source").foreach { m =>
      val rs = rows.filter(_.getString(0) == m)
      assert(rs.nonEmpty)
      // every document lands in exactly one (batch, value) cell
      assert(rs.map(r => r.getLong(2) + r.getLong(3)).sum == n, m)
      val (ta, tb) = (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum)
      rs.foreach { r =>
        val (a, b) = (r.getLong(2), r.getLong(3))
        // the emitted flag replays from the emitted integers alone:
        // |a/ta - b/tb| > 1/20 cross-multiplied (exact, no float division)
        val expected = math.abs(a * tb - b * ta) * 20 > ta * tb
        assert(r.getBoolean(4) == expected, s"$m/${r.getString(1)}")
      }
    }
    Seq("nchars:mean", "nchars:min", "nchars:max").foreach { m =>
      assert(rows.count(_.getString(0) == m) == 1, m)
    }
  }

  test("q90: every flagged hour exceeds its trailing mean by > 3 sigma (float replay)") {
    val rows = SparkEntry.queries("q90_rate_spike")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, s, q) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (num, den2) = (r.getLong(5), r.getLong(6))
      // the emitted integers are internally consistent with n_win = 24
      assert(num == cnt * 24 - s && den2 == 24 * q - s * s)
      assert(den2 >= 0, "variance numerator can't be negative")
      // and the integer verdict agrees with the float z-score it encodes
      val mean = s / 24.0
      val sd = math.sqrt(den2 / (24.0 * 24.0))
      assert(cnt > mean && (cnt - mean) * (cnt - mean) > 9.0 * sd * sd - 1e-9,
        s"${r.getString(0)} @ ${r.get(1)}: cnt=$cnt mean=$mean sd=$sd not a >3-sigma spike")
    }
  }

  test("q118: the contract audit is clean on test data AND detects planted violations") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val clean = SparkEntry.queries("q118_contract_audit")(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(clean.size == 6, "all six contracts must report, zeros included")
    // five contracts hold; the lineitem composite key genuinely does NOT
    // on the generated data (duplicate (l_orderkey, l_linenumber) pairs
    // exist) — the audit reports the real breach instead of a vacuous 0,
    // which is exactly what a contract audit is for
    val lineDups = clean("unique_l_orderkey_l_linenumber")
    assert(lineDups > 0L, s"generator data is known to breach this key: $clean")
    assert(clean.filterNot(_._1 == "unique_l_orderkey_l_linenumber")
      .values.forall(_ == 0L), s"other contracts should be clean: $clean")

    // sensitivity: doctor a copy of the tables and re-run the SAME audit
    val tmp = java.nio.file.Files.createTempDirectory("q118").toString
    val o = graft.engine.Tables.orders(spark, dir)
    o.limit(1).select(lit(999999L).as("o_orderkey"), // dup after union? no: fresh key
        lit(null).cast("long").as("o_custkey"),      // 1 null custkey
        lit("X").as("o_orderstatus"),                // 1 bad status
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .unionByName(o.limit(1).select(col("o_orderkey"), // 1 dup orderkey
        lit(123456789L).as("o_custkey"),             // 1 FK orphan
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")))
      .unionByName(o)
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    val l = graft.engine.Tables.lineitem(spark, dir)
    l.limit(1).withColumn("l_orderkey", lit(888888888L)) // orphan lineitem
      .unionByName(l).unionByName(l.limit(1))            // dup (orderkey, linenumber)
      .coalesce(1).write.parquet(s"$tmp/lineitem.parquet")
    graft.engine.Tables.customer(spark, dir)
      .coalesce(1).write.parquet(s"$tmp/customer.parquet")
    val dirty = SparkEntry.queries("q118_contract_audit")(spark, tmp).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(dirty("unique_o_orderkey") == 1L, dirty.toString)
    assert(dirty("not_null_o_custkey") == 1L, dirty.toString)
    assert(dirty("accepted_values_o_orderstatus") == 1L, dirty.toString)
    assert(dirty("relationships_o_custkey") == 1L, dirty.toString)
    // the planted dup adds exactly one violation on top of the data's own
    assert(dirty("unique_l_orderkey_l_linenumber") == lineDups + 1L, dirty.toString)
    assert(dirty("relationships_l_orderkey") == 1L, dirty.toString)
  }
}
