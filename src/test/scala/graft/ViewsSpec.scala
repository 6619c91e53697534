package graft

import graft.sources.Views

class ViewsSpec extends SparkSpec {

  test("registered views answer SQL over the test tables") {
    Views.register(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT n.n_name, COUNT(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin).collect()
    assert(r.length == 3 && r(0).getLong(1) > 0)
    // events view applies the nanosecond-timestamp workaround
    val e = spark.sql("SELECT CAST(ts AS DATE) d FROM events LIMIT 1").collect()
    assert(e.nonEmpty && e(0).getDate(0) != null)
    // custom function registered alongside
    val h = spark.sql("SELECT html_unescape('&lt;ok&gt;') v").collect()(0)
    assert(h.getString(0) == "<ok>")
  }
}
