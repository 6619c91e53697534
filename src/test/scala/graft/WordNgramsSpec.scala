package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, WordNgrams}

/** Properties for the general-n shingle kernel — load-bearing for the
  * span/dedup family (q56/q57/q75/q77) and, since round 9, the
  * repetition census (q154), the stride-1 window dedup (q155) and the
  * shared ScaleProbe repetition leg.
  */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(4242L + i)))

  private def viaExpr(s: String, n: Int): Seq[String] =
    Seq(s).toDF("t").select(WordNgrams($"t", n)).collect()(0).getSeq[String](0)

  /** Reference semantics: SparkSpec.naiveWordNgrams — split-on-space
    * (empties preserved), sliding window of n tokens re-joined by
    * single spaces; shared with the q154/q155 pins. */
  private def naive(s: String, n: Int): Seq[String] = naiveWordNgrams(s, n)

  test("property: matches the naive sliding window for arbitrary token soup") {
    // tokens drawn to include empties (consecutive/leading/trailing
    // spaces), unicode and space-free ascii runs
    val token = Gen.oneOf(
      Gen.const(""),
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.oneOf("héllo", "日本語", "a-b_c", "Ω", "x"))
    val cases = for {
      k <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(k, token)
      n <- Gen.chooseNum(1, 8)
    } yield (toks.mkString(" "), n)
    samples(cases, 40).foreach { case (s, n) =>
      assert(viaExpr(s, n) == naive(s, n), s"input='$s' n=$n")
    }
  }

  test("n=2 agrees with WordBigrams on the bigram grain") {
    val cases = Seq("the quick brown fox", "a b", "double  space", " x ", "one")
    cases.foreach { s =>
      val bi = Seq(s).toDF("t")
        .select(graft.functions.WordBigrams($"t")).collect()(0).getSeq[String](0)
      assert(viaExpr(s, 2) == bi, s"input: '$s'")
    }
  }

  test("fewer than n tokens yields empty array; null propagates") {
    assert(viaExpr("a b c", 4) == Seq())
    assert(viaExpr("", 1) == Seq(""))      // split("") -> [""], one 1-gram
    val r = Seq((null: String)).toDF("t").select(WordNgrams($"t", 3)).collect()(0)
    assert(r.isNullAt(0))
  }

  test("registered as SQL function word_ngrams") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT word_ngrams('w x y z', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("w x y", "x y z"))
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(3)
      .select(concat(lit("a b c d "), col("id")).as("t"))
      .select(explode(WordNgrams(col("t"), 3)).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.forall(l => l.trim.isEmpty || l.contains("*(1)")), plan.take(600))
    assert(df.count() == 9)
  }
}
