package graft

import org.apache.spark.sql.functions._
import graft.functions.TokenSetCount

class TokenSetCountSpec extends SparkSpec {
  import spark.implicits._

  private val set = Seq("the", "a", "of")

  private def viaExpr(s: String): Int =
    Seq(s).toDF("t").select(TokenSetCount($"t", set)).collect()(0).getInt(0)

  private def viaHof(s: String): Int =
    Seq(s).toDF("t")
      .select(size(filter(split($"t", " "), x => x.isin(set: _*))))
      .collect()(0).getInt(0)

  test("matches the filter-lambda formulation, duplicates included") {
    val cases = Seq(
      "the cat of the house",   // 'the' twice + 'of'
      "a a a",
      "no hits here",
      "",                       // one empty token
      "the",                    // exact single hit
      "the  of",                // double space -> empty middle token
      "THE The the")            // case-sensitive: one hit
    cases.foreach(s => assert(viaExpr(s) == viaHof(s), s"input: '$s'"))
    assert(viaExpr("the cat of the house") == 3)
  }

  test("null propagates") {
    val r = Seq((null: String)).toDF("t").select(TokenSetCount($"t", set)).collect()(0)
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(concat(lit("the x of "), col("id")).as("t"))
      .select(TokenSetCount(col("t"), set).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.forall(l => l.trim.isEmpty || l.contains("*(1)")), plan.take(600))
    assert(df.collect().forall(_.getInt(0) == 2))
  }
}
