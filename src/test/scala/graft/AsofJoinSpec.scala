package graft

import java.sql.Timestamp
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 11:00:00"), 110.0),
    ("B", ts("2024-01-01 10:30:00"), 50.0)
  ).toDF("sym", "qts", "price")

  test("picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", ts("2024-01-01 10:30:00"), 1L), // between quotes -> 100.0
      ("A", ts("2024-01-01 11:00:00"), 2L), // exact match -> 110.0 (<= semantics)
      ("A", ts("2024-01-01 09:00:00"), 3L), // before any quote -> null
      ("B", ts("2024-01-01 12:00:00"), 4L), // after B's only quote -> 50.0
      ("C", ts("2024-01-01 12:00:00"), 5L)  // key with no right rows -> null
    ).toDF("sym", "tts", "trade_id")
    val out = AsofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .orderBy("trade_id").collect()
    val prices = out.map(r => if (r.isNullAt(r.fieldIndex("price"))) None
      else Some(r.getDouble(r.fieldIndex("price"))))
    assert(prices.toSeq == Seq(Some(100.0), Some(110.0), None, Some(50.0), None))
    // left columns survive untouched, one output row per left row
    assert(out.map(_.getAs[Long]("trade_id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("left rows with identical timestamps each match independently") {
    val trades = Seq(
      ("A", ts("2024-01-01 10:30:00"), 1L),
      ("A", ts("2024-01-01 10:30:00"), 2L)
    ).toDF("sym", "tts", "trade_id")
    val out = AsofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .collect()
    assert(out.length == 2 && out.forall(_.getAs[Double]("price") == 100.0))
  }

  test("forward: picks the earliest right row at or after each left time") {
    val trades = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L), // before both quotes -> 100.0
      ("A", ts("2024-01-01 10:00:00"), 2L), // exact match -> 100.0 (>= semantics)
      ("A", ts("2024-01-01 10:30:00"), 3L), // between -> 110.0
      ("A", ts("2024-01-01 12:00:00"), 4L), // after the last quote -> null
      ("C", ts("2024-01-01 10:00:00"), 5L)  // key with no right rows -> null
    ).toDF("sym", "tts", "trade_id")
    val out = AsofJoin.forward(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .orderBy("trade_id").collect()
    val prices = out.map(r => if (r.isNullAt(r.fieldIndex("price"))) None
      else Some(r.getDouble(r.fieldIndex("price"))))
    assert(prices.toSeq ==
      Seq(Some(100.0), Some(100.0), Some(110.0), None, None))
    assert(out.map(_.getAs[Long]("trade_id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // like the backward form, the plan is a window, not a join
    val plan = AsofJoin.forward(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(600))
  }
}
