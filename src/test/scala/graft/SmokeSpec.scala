package graft

/** Driver-contract smoke: every registered query executes at sf0.001 and
  * the queries/oracleSql maps stay consistent — catches a broken query in
  * `sbt test` without waiting for the Verify main. */
class SmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a query; names unique") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.length == names.length)
  }

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
