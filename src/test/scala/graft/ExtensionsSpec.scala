package graft

import graft.functions.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("html_unescape is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT html_unescape('a &amp; b &#33;') AS v, html_unescape(NULL) AS n")
      .collect()(0)
    assert(r.getString(0) == "a & b !")
    assert(r.isNullAt(1))
  }

  test("html_unescape composes inside SQL expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT upper(html_unescape(c)) AS v FROM VALUES ('x &lt;y&gt;') AS t(c)")
      .collect()(0)
    assert(r.getString(0) == "X <Y>")
  }
}
