package graft

import java.sql.Timestamp
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches points to containing half-open intervals across bin edges") {
    val events = Seq(
      ("u1", ts("2024-01-03 12:00:00"), 1L), // inside w1
      ("u1", ts("2024-01-08 00:00:00"), 2L), // == w1 end (exclusive) -> only w2
      ("u1", ts("2024-01-01 00:00:00"), 3L), // == w1 start (inclusive)
      ("u2", ts("2024-01-03 12:00:00"), 4L), // other key, no interval
      ("u1", ts("2024-02-01 00:00:00"), 5L)  // after all intervals
    ).toDF("k", "t", "event_id")
    val windows = Seq(
      ("u1", ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00"), "w1"),
      ("u1", ts("2024-01-05 00:00:00"), ts("2024-01-12 00:00:00"), "w2")
    ).toDF("k", "s", "e", "win")
    // small bin (1 day) forces intervals to span many buckets
    val out = IntervalJoin(events, windows, "k", "t", "s", "e", binSeconds = 86400)
      .select("event_id", "win").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "w1"), (2L, "w2"), (3L, "w1")))
  }

  test("overlapping intervals each match once (no bin duplicates)") {
    val events = Seq(("u1", ts("2024-01-06 00:00:00"), 1L)).toDF("k", "t", "event_id")
    val windows = Seq(
      ("u1", ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00"), "w1"),
      ("u1", ts("2024-01-05 00:00:00"), ts("2024-01-12 00:00:00"), "w2")
    ).toDF("k", "s", "e", "win")
    val out = IntervalJoin(events, windows, "k", "t", "s", "e", binSeconds = 3600)
      .select("event_id", "win").collect()
    assert(out.length == 2) // both windows, exactly once each
  }
}
