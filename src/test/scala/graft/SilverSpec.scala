package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.engine.Silver

/** SCD2 transition matrix per FIXTURES.md §B3 plus dedup determinism. */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  private val d0 = Date.valueOf("2024-01-01")
  private val d1 = Date.valueOf("2024-02-01")

  test("dedupLatest keeps exactly the ordered-first row per key") {
    val df = Seq(
      ("a", 1, 10), ("a", 2, 20), ("a", 2, 15), ("b", 1, 30)
    ).toDF("k", "ver", "v")
    val out = Silver.dedupLatest(df, Seq("k"), Seq($"ver".desc, $"v".desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq(("a", 2, 20), ("b", 1, 30)))
  }

  test("dedupLatest is idempotent") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("k", "ver")
    val once = Silver.dedupLatest(df, Seq("k"), Seq($"ver".desc))
    val twice = Silver.dedupLatest(once, Seq("k"), Seq($"ver".desc))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  private def dim(rows: Seq[(String, java.lang.Long, Date, Date, Boolean)]) =
    rows.toDF("k", "followers", "valid_from", "valid_to", "is_current")

  test("scd2: new key inserted as current") {
    val current = dim(Seq())
    val batch = Seq(("n1", 5L)).toDF("k", "followers")
    val out = Silver.scd2Apply(current, batch, "k", Seq("followers"), lit(d1))
    val r = out.collect()(0)
    assert(r.getAs[String]("k") == "n1" && r.getAs[Boolean]("is_current")
      && r.getAs[Date]("valid_from") == d1 && r.getAs[Date]("valid_to") == null)
  }

  test("scd2: changed key expires old row and inserts new current") {
    val current = dim(Seq(("c1", 10L, d0, null, true)))
    val batch = Seq(("c1", 20L)).toDF("k", "followers")
    val out = Silver.scd2Apply(current, batch, "k", Seq("followers"), lit(d1))
      .orderBy("valid_from").collect()
    assert(out.length == 2)
    val (old, neu) = (out(0), out(1))
    assert(!old.getAs[Boolean]("is_current") && old.getAs[Date]("valid_to") == d1
      && old.getAs[Long]("followers") == 10L)
    assert(neu.getAs[Boolean]("is_current") && neu.getAs[Date]("valid_to") == null
      && neu.getAs[Long]("followers") == 20L && neu.getAs[Date]("valid_from") == d1)
  }

  test("scd2: unchanged key untouched; absent key untouched") {
    val current = dim(Seq(("u1", 10L, d0, null, true), ("a1", 7L, d0, null, true)))
    val batch = Seq(("u1", 10L)).toDF("k", "followers")
    val out = Silver.scd2Apply(current, batch, "k", Seq("followers"), lit(d1))
    assert(out.count() == 2)
    assert(out.filter($"is_current" && $"valid_to".isNull).count() == 2)
  }

  test("scd2: twice-changed key accumulates history with one current row") {
    val current0 = dim(Seq(("x", 1L, d0, null, true)))
    val b1 = Seq(("x", 2L)).toDF("k", "followers")
    val s1 = Silver.scd2Apply(current0, b1, "k", Seq("followers"), lit(d1))
    val b2 = Seq(("x", 3L)).toDF("k", "followers")
    val d2 = Date.valueOf("2024-03-01")
    val s2 = Silver.scd2Apply(s1, b2, "k", Seq("followers"), lit(d2))
    assert(s2.count() == 3)
    assert(s2.filter($"is_current").count() == 1)
    assert(s2.filter($"is_current").collect()(0).getAs[Long]("followers") == 3L)
    // history covers the timeline contiguously
    val hist = s2.filter(!$"is_current").orderBy("valid_from").collect()
    assert(hist.map(_.getAs[Date]("valid_to")).toSeq == Seq(d1, d2))
  }

  test("scd2 quirk: NULL->value transition is NOT detected (null-rejecting !=)") {
    val current = dim(Seq(("q1", null, d0, null, true)))
    val batch = Seq(("q1", 5L)).toDF("k", "followers")
    val out = Silver.scd2Apply(current, batch, "k", Seq("followers"), lit(d1))
    // reference semantics: no change row — old NULL row stays current
    assert(out.count() == 1)
    val r = out.collect()(0)
    assert(r.getAs[Boolean]("is_current") && r.isNullAt(r.fieldIndex("followers")))
  }

  test("missingFkCount counts non-null FKs absent from the dim") {
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val dimDf = Seq(1L, 2L, 3L).toDF("pk")
    val r = Silver.missingFkCount(fact, "fk", dimDf, "pk").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
  }

  test("q113 CDC merge: deletes win over updates, partial updates keep base fields") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q113_cdc_merge")(spark, dir).collect()
    val base = graft.engine.Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getDouble(3)))
      .toMap
    // conservation: base - deletes + inserts (delete/insert keys disjoint
    // from each other by construction: inserts live in the +1e6 range)
    val nDel = base.keys.count(_ % 13 == 0)
    val nIns = base.keys.count(_ % 31 == 1)
    assert(rows.length == base.size - nDel + nIns)
    rows.foreach { r =>
      val k = r.getAs[Long]("custkey")
      r.getAs[String]("change") match {
        case "kept" =>
          assert(k % 7 != 3 && k % 13 != 0 && base(k)._3 == r.getAs[Double]("acctbal"))
        case "updated" =>
          // D (op_seq 2) must have beaten U (op_seq 1) on overlap keys
          assert(k % 7 == 3 && k % 13 != 0)
          // partial update: name/segment untouched, balance bumped
          assert(r.getAs[String]("name") == base(k)._1 &&
            r.getAs[String]("mktsegment") == base(k)._2 &&
            r.getAs[Double]("acctbal") == base(k)._3 + 100.0)
        case "inserted" =>
          assert(k > 1000000L && base((k - 1000000L))._2 == r.getAs[String]("mktsegment") &&
            r.getAs[String]("name") == s"NEW-${k - 1000000L}" &&
            r.getAs[Double]("acctbal") == 10.0)
      }
    }
    // no deleted key survives
    assert(rows.forall(r => r.getAs[Long]("custkey") % 13 != 0 ||
      r.getAs[String]("change") == "inserted"))
  }
}
