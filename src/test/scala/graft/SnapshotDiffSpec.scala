package graft

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added / removed / modified / unchanged") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (4L, "gone"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new text"), (3L, "brand new"))
      .toDF("doc_id", "text")
    val got = SnapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "added", 4L -> "removed"))
  }

  test("NULL content means present, not absent") {
    val v1 = Seq((1L, null: String), (2L, "x"), (3L, null: String))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, null: String), (2L, null: String), (3L, "y"))
      .toDF("doc_id", "text")
    val got = SnapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "modified", 3L -> "modified"))
  }

  test("every id from either side appears exactly once") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val ids = SnapshotDiff(v1, v2).collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L) && ids.distinct.length == ids.length)
  }
}
