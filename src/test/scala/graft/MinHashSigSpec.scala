package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, MinHashSig, WordBigrams}

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  /** The aggregation formulation the expression replaces — per-quarter
    * mins over md5'd exploded shingles. Must agree byte-for-byte. */
  private def viaAgg(texts: Seq[String]): Map[Long, Seq[String]] = {
    val ex = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), explode(WordBigrams(col("text"))).as("s"))
      .select(col("id"), md5(col("s")).as("h"))
    val mins = (1 to 4).map(j => min(substring(col("h"), (j - 1) * 8 + 1, 8)).as(s"mh$j"))
    ex.groupBy("id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
  }

  private def viaExpr(texts: Seq[String]): Map[Long, Seq[String]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), MinHashSig(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap

  test("matches the explode+groupBy(min(md5)) formulation byte for byte") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b",
      "x y",
      "double  space and trailing ",
      "unicode héllo wörld tokens here")
    assert(viaExpr(texts) == viaAgg(texts))
  }

  test("sub-2-token texts yield NULL (no signature row)") {
    val r = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
      .toDF("id", "text")
      .select(col("id"), MinHashSig(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(r == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("null input propagates") {
    val r = Seq((null: String)).toDF("t").select(MinHashSig($"t")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("registered as SQL function minhash_sig") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT minhash_sig('x y z')[0] AS m").collect()(0).getString(0)
    assert(r.length == 8 && r.matches("[0-9a-f]{8}"))
  }

  test("signature build plan has no exchange (pure narrow map)") {
    val plan = graft.operators.MinHashLsh.signatures(
        spark.range(5).select(col("id").as("doc_id"),
          concat(lit("a b c "), col("id")).as("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }
}
