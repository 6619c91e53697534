package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, WordBigrams}

class WordBigramsSpec extends SparkSpec {
  import spark.implicits._

  private def viaExpr(s: String): Seq[String] =
    Seq(s).toDF("t").select(WordBigrams($"t")).collect()(0).getSeq[String](0)

  /** The declarative formulation the expression replaces — must agree
    * exactly (split-on-space semantics incl. empty tokens). */
  private def viaHof(s: String): Seq[String] = {
    val t = split($"t", " ")
    val idx = when(size(t) >= 2, sequence(lit(0), size(t) - 2))
      .otherwise(lit(Array.empty[Int]))
    val bi = transform(idx, i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2)))
    Seq(s).toDF("t").select(bi).collect()(0).getSeq[String](0)
  }

  test("matches the higher-order-function formulation byte for byte") {
    val cases = Seq(
      "the quick brown fox",
      "a b",
      "double  space",          // empty middle token
      " leading",
      "trailing ",
      "  ",                     // only empty tokens
      "one",
      "a b c d e f g h i j")
    cases.foreach { s =>
      assert(viaExpr(s) == viaHof(s), s"input: '$s'")
    }
  }

  test("0/1-token inputs yield empty arrays, not errors") {
    assert(viaExpr("") == Seq())    // split("") -> [""] -> 1 token
    assert(viaExpr("word") == Seq())
  }

  test("null propagates") {
    val r = Seq((null: String)).toDF("t").select(WordBigrams($"t")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("registered as SQL function word_bigrams") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT word_bigrams('x y z') AS b").collect()(0).getSeq[String](0)
    assert(r == Seq("x y", "y z"))
  }

  test("stays inside whole-stage codegen") {
    // LocalTableScan children skip codegen regardless of the expression;
    // a range scan is codegen'd, so the span proves the expression is too.
    val df = spark.range(3)
      .select(concat(lit("a b c "), col("id")).as("t"))
      .select(explode(WordBigrams(col("t"))).as("s"))
    // the "*(1)" prefix on every node = one whole-stage-codegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.forall(l => l.trim.isEmpty || l.contains("*(1)")), plan.take(600))
    assert(df.count() == 9)
  }
}
