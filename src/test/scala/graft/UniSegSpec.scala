package graft

import org.apache.spark.sql.functions._

/** Equality pins for the native unigram-Viterbi kernel
  * ([[graft.functions.UniSeg]]) against the relational `aggregate` DP it
  * replaced in the hot path (`TrainData3.uniSegColRelational` — the
  * executable mirror of the oracle's CTE unroll). The kernel must be
  * VALUE-identical segmentation-for-segmentation: the q164/q171 censuses
  * explode the pieces, q165/q174 count them, and the streaming gate
  * filters on the count, so any piece-level drift breaks hash gates. */
class UniSegSpec extends SparkSpec {
  import spark.implicits._
  import graft.queries.TrainData3.{uniSegCol, uniSegColRelational}

  /** Both paths over one word list under one model, piece-for-piece. */
  private def assertEqualSegs(words: Seq[String], vocab: Map[String, Long],
                              oov: Long): Unit = {
    val df = words.toDF("w")
    val got = df.select(col("w"), uniSegCol(col("w"), vocab, oov).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val want = df.select(col("w"), uniSegColRelational(col("w"), vocab, oov).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == want(w),
        s"kernel diverges on '$w': got ${got(w)}, relational ${want(w)}")
    }
  }

  // a small hand-built model: multi-char pieces + cheap singles; costs
  // chosen so multi-piece vs single-piece tradeoffs actually flip
  private val vocab = Map(
    "a" -> 100L, "b" -> 200L, "c" -> 5000L,
    "ab" -> 150L, "abc" -> 180L, "bc" -> 120L, "abca" -> 170L,
    "e" -> 50L, "f" -> 60L, "é" -> 90L, "éf" -> 40L)
  private val oov = 9000L

  test("kernel ≡ relational on crafted words (OOV, multi-byte, boundaries)") {
    val grin = new String(Character.toChars(0x1F600)) // supplementary plane
    assertEqualSegs(Seq(
      "", "a", "z", "ab", "abc", "abca", "abcabc", "aabbcc",
      "zzzz", "azbzcz", "éfé", "eéfe", grin,
      grin + "a" + grin, "abc" + grin + "abc",
      "abcabcabcabc",            // exactly UniMaxW = 12 code points
      "abcabcabcabca",           // 13 — the single-char fallback
      grin * 13                  // long fallback at code-point grain
    ), vocab, oov)
  }

  test("kernel ≡ relational under the trained model on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val (v, o) = graft.queries.TrainData3.uniModel(spark, dir)
    val words = graft.engine.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .collect().map(_.getString(0)).toSeq
    assertEqualSegs(words, v, o)
  }

  test("NULL word stays NULL") {
    val r = Seq[String](null).toDF("w")
      .select(uniSegCol(col("w"), vocab, oov).as("seg")).head
    assert(r.isNullAt(0), "NULL word must segment to NULL")
  }
}
