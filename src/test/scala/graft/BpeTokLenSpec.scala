package graft

import org.apache.spark.sql.functions._

/** Hand-computed pins for the native BPE tokenize kernel
  * ([[graft.functions.BpeTokLen]]) — greedy in-round skip semantics,
  * sequential round application, code-point symbol grain, empty/NULL
  * words. Batch ≡ stream ≡ persisted-serve equality is pinned where the
  * kernel is consumed (StreamsSpec, TrainData3Spec, the q173 gate). */
class BpeTokLenSpec extends SparkSpec {
  import spark.implicits._

  private def len(w: String, merges: Seq[Seq[(String, String)]]): Long =
    Seq(w).toDF("w")
      .select(graft.functions.BpeTokLen(col("w"), merges).as("n"))
      .head.getLong(0)

  test("greedy overlapping-run semantics: aaaa + (a,a) merges at 1 and 3") {
    assert(len("aaaa", Seq(Seq("a" -> "a"))) == 2L) // [aa, aa]
    assert(len("aaa", Seq(Seq("a" -> "a"))) == 2L) // [aa, a]
  }

  test("rounds apply sequentially; in-round products never re-merge within the round") {
    // round 1 (a,b): ababab -> [ab, ab, ab]; round 2 (ab,ab): -> [abab, ab]
    assert(len("ababab", Seq(Seq("a" -> "b"), Seq("ab" -> "ab"))) == 2L)
    // without round 2 the products stay unmerged (they were created
    // THIS round in the single-round case)
    assert(len("abab", Seq(Seq("a" -> "b"))) == 2L)
    assert(len("abab", Seq(Seq("a" -> "b"), Seq("ab" -> "ab"))) == 1L)
  }

  test("symbols are code points, not UTF-16 units (supplementary-plane word)") {
    val grin = new String(Character.toChars(0x1F600)) // outside the BMP
    assert(len(grin + "a" + grin, Seq(Seq(grin -> "a"))) == 2L) // [😀a, 😀]
    assert(len(grin + grin, Seq(Seq("x" -> "y"))) == 2L) // no false merges
  }

  test("empty word counts 0; NULL word stays NULL; unseen symbols pass through") {
    assert(len("", Seq(Seq("a" -> "b"))) == 0L)
    assert(len("zzz", Seq(Seq("a" -> "b"))) == 3L)
    val n = Seq[String](null).toDF("w")
      .select(graft.functions.BpeTokLen(col("w"), Seq(Seq("a" -> "b"))).as("n"))
      .head
    assert(n.isNullAt(0), "NULL word must yield NULL count")
  }

  test("kernel matches the relational trained path on the real corpus (via shared vlen)") {
    // train merges relationally (the memoized model), then compare the
    // kernel's per-word lengths against the relational symbolization's
    val dir = "/root/testdata/sf0.001"
    val merges = graft.queries.TrainData2.trainedMerges(spark, dir)
    val docs = graft.engine.Tables.documents(spark, dir).select("doc_id", "text")
    val kernel = docs.select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"),
        graft.queries.TrainData2.bpeTokLenCol(col("w"), merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val relational = graft.queries.TrainData2.bpeDocTokens(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc-grain sums under the kernel must equal bpeDocTokens exactly
    val docWords = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        (id, rows.length.toLong, rows.map(r => kernel(r.getString(1))).sum)
      }.toSet
    assert(relational.toSet == docWords, "kernel diverges from the relational path")
  }
}
