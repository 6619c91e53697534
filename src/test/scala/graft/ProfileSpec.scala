package graft

import org.apache.spark.sql.functions._

/** Checks for queries the oracle can't express: the approximate distinct
  * estimate must stay close to the exact count. */
class ProfileSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q38_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }
}
