package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Gold, Report}

/** Gold queries over hand-computed fixtures (FIXTURES.md §B4): mode ties,
  * LAG first-row NULL, HAVING boundary, viral threshold boundary, empty
  * tag exclusion — plus the notifier aggregates. */
class GoldSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // toot_id, content_key, date_key, account_key, sentiment_key, created_at,
  // replies, reblogs, favs, quotes, total_engagement, score, label, language
  private def fact(rows: (String, Long, Int, Long, Long, String, Long, Long,
      Long, Long, Long, Double, String, String)*): DataFrame =
    rows.toSeq.toDF("toot_id", "content_key", "date_key", "account_key",
      "sentiment_key", "created_at_s", "replies_count", "reblogs_count",
      "favourites_count", "quotes_count", "total_engagement",
      "sentiment_score", "sentiment_label", "language")
      .withColumn("created_at", col("created_at_s").cast("timestamp"))
      .drop("created_at_s")

  private val dimDate = Seq(
    (20240101, "2024-01-01", 2024, 1, 1, "Monday", false),
    (20240102, "2024-01-02", 2024, 1, 1, "Tuesday", false))
    .toDF("date_key", "full_date_s", "year", "quarter", "month", "day_name", "is_weekend")
    .withColumn("full_date", col("full_date_s").cast("date")).drop("full_date_s")

  test("dailySummary: counts, conditional sentiment counts, mode language") {
    // day 1: two 'en' one 'fr' -> top_language en; 2 positive, 1 negative
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 1, 1, 1, 0, 3, 0.9, "Positive", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 2, 2, 0, 4, 0.8, "Positive", "en"),
      ("t3", 3L, 20240101, 11L, 2L, "2024-01-01 03:00:00", 5, 0, 0, 0, 5, 0.9, "Negative", "fr"))
    val r = Gold.dailySummary(f, dimDate).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("total_toots") == 3)
    assert(row.getAs[Long]("unique_accounts") == 2)
    assert(row.getAs[Long]("total_engagement") == 12)
    assert(row.getAs[Long]("positive_count") == 2 && row.getAs[Long]("negative_count") == 1)
    assert(row.getAs[String]("top_language") == "en")
    assert(row.getAs[Double]("positive_pct") == 66.67)
  }

  test("sentimentTrends: first row per label has NULL pct change") {
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 2, 0.9, "Positive", "en"),
      ("t2", 2L, 20240102, 10L, 1L, "2024-01-02 01:00:00", 0, 0, 0, 0, 4, 0.9, "Positive", "en"),
      ("t3", 3L, 20240102, 10L, 1L, "2024-01-02 02:00:00", 0, 0, 0, 0, 6, 0.9, "Positive", "en"))
    val r = Gold.sentimentTrends(f, dimDate).orderBy("full_date").collect()
    assert(r.length == 2)
    assert(r(0).isNullAt(r(0).fieldIndex("prev_count")))
    assert(r(0).isNullAt(r(0).fieldIndex("count_change_pct")))
    assert(r(1).getAs[Long]("prev_count") == 1)
    assert(r(1).getAs[Double]("count_change_pct") == 100.0) // 1 -> 2 toots
  }

  test("hashtagPerformance: HAVING >= 2 boundary and empty tags excluded") {
    val dimContent = Seq(
      (1L, "ai,ml"), (2L, "ai"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("content_key", "tag_names")
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 5, 0.9, "Positive", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 7, 0.9, "Positive", "en"),
      ("t3", 3L, 20240101, 10L, 1L, "2024-01-01 03:00:00", 0, 0, 0, 0, 9, 0.9, "Positive", "en"),
      ("t4", 4L, 20240101, 10L, 1L, "2024-01-01 04:00:00", 0, 0, 0, 0, 9, 0.9, "Positive", "en"))
    val r = Gold.hashtagPerformance(f, dimContent).collect()
    // "ai" has exactly 2 mentions (boundary: kept); "ml" only 1 (dropped);
    // empty/null tag rows contribute nothing
    assert(r.length == 1)
    assert(r(0).getAs[String]("hashtag") == "ai")
    assert(r(0).getAs[Long]("mention_count") == 2)
    assert(r(0).getAs[Long]("total_engagement") == 12)
  }

  test("viralContent: total_engagement = 10 excluded by the > 10 filter") {
    val dimContent = Seq((1L, "p1", "Original"), (2L, "p2", "Original"))
      .toDF("content_key", "content_preview", "content_type")
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 5, 5, 0, 0, 10, 0.9, "Positive", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 5, 5, 1, 0, 11, 0.9, "Positive", "en"))
    val now = ts("2024-01-02 01:00:00")
    val r = Gold.viralContent(f, dimContent, now).collect()
    assert(r.length == 1 && r(0).getAs[String]("toot_id") == "t2")
    assert(r(0).getAs[Double]("hours_since_post") == 24.0)
    // (11*0.4 + 5*0.4 + 0*0.2)/24 = 6.4/24 = 0.266667
    assert(r(0).getAs[Double]("virality_score") == 0.266667)
  }

  test("dailySummaryIncremental equals full recompute, untouched dates untouched") {
    val day1 = Seq(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 1L, 1L, 1L, 0L, 3L, 0.9, "Positive", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0L, 2L, 2L, 0L, 4L, 0.8, "Positive", "en"),
      ("t3", 3L, 20240102, 11L, 2L, "2024-01-02 03:00:00", 5L, 0L, 0L, 0L, 5L, 0.9, "Negative", "fr"))
    // re-crawl delta: one MORE row for day 2 (its partition must merge
    // with the earlier day-2 row, not replace it) — day 1 untouched
    val deltaRows = Seq(
      ("t4", 4L, 20240102, 12L, 1L, "2024-01-02 04:00:00", 0L, 0L, 7L, 0L, 7L, 0.9, "Positive", "en"))
    val full = fact((day1 ++ deltaRows): _*)
    val mv1 = Gold.dailySummary(fact(day1: _*), dimDate)
    val delta = fact(deltaRows: _*)

    val incr = Gold.dailySummaryIncremental(mv1, full, delta, dimDate)
    val want = Gold.dailySummary(full, dimDate)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(incr) == rows(want))
    // day-2 stats actually merged old + new rows
    val d2 = incr.filter(col("date_key") === 20240102).collect()(0)
    assert(d2.getAs[Long]("total_toots") == 2 && d2.getAs[Long]("total_engagement") == 12)
  }

  test("topContent ranks with tie-break and hourly ranks over aggregate") {
    val dimContent = Seq((1L, "Original"), (2L, "Reply"))
      .toDF("content_key", "content_type")
    val dimAcc = Seq((10L, "alice", "Micro", 400L, true))
      .toDF("account_key", "account_username", "influence_tier",
        "account_followers_count", "is_current")
    val bronze = Seq(
      ("ta", "clean a", "<p>raw a</p>"),
      ("tb", null, "x" * 250)) // preview falls back to content, LEFT(…, 200)
      .toDF("id", "content_clean", "content")
    val f = fact(
      ("tb", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 7, 0.9, "Positive", "en"),
      ("ta", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 7, 0.9, "Positive", "en"))
    val df = Gold.topContent(f, dimContent, dimAcc, bronze)
    // bronze is pruned to the top-k ids via a broadcast LEFT SEMI before
    // the preview join — the full bronze scan must never shuffle here
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
    val r = df.collect()
    // equal engagement -> toot_id ascending tie-break
    assert(r.map(_.getAs[String]("toot_id")).toSeq == Seq("ta", "tb"))
    assert(r.map(_.getAs[Int]("engagement_rank")).toSeq == Seq(1, 2))
    // bronze read-back preview: COALESCE(content_clean, content) LEFT 200
    assert(r(0).getAs[String]("content_preview") == "clean a")
    assert(r(1).getAs[String]("content_preview") == "x" * 200)
    // engagement_rate = ROUND(100.0 * 7 / 400, 4)
    assert(r.forall(_.getAs[Double]("engagement_rate") == 1.75))

    val h = Gold.hourlyPatterns(f, dimDate).collect()
    assert(h.length == 2 && h.forall(_.getAs[Long]("toot_count") == 1))
  }

  test("topContent engagement_rate is NULL for zero/unknown followers") {
    val dimContent = Seq((1L, "Original")).toDF("content_key", "content_type")
    val dimAcc = Seq((10L, "alice", "Nano", 0L, true))
      .toDF("account_key", "account_username", "influence_tier",
        "account_followers_count", "is_current")
    val bronze = Seq(("t1", "c", "c")).toDF("id", "content_clean", "content")
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 7, 0.9, "Positive", "en"),
      ("t2", 1L, 20240101, 99L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 3, 0.9, "Positive", "en"))
    val r = Gold.topContent(f, dimContent, dimAcc, bronze).collect()
    // NULLIF(0 followers) and a dangling account_key both yield NULL rate
    assert(r.forall(_.isNullAt(r(0).fieldIndex("engagement_rate"))))
    // t2 has no bronze row: preview NULL, row still present
    assert(r(1).getAs[String]("toot_id") == "t2" &&
      r(1).isNullAt(r(1).fieldIndex("content_preview")))
  }

  test("accountInfluence aggregates only current dim versions") {
    val dimAcc = Seq(
      (10L, "a1", "alice", "Micro", 100L, true),
      (11L, "a1", "alice", "Micro", 50L, false), // expired version: excluded
      (12L, "a2", "bob", "Mid", 20000L, true))
      .toDF("account_key", "account_id", "account_username", "influence_tier",
        "account_followers_count", "is_current")
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 1, 1, 1, 0, 3, 0.9, "Positive", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 5, 0.8, "Negative", "en"),
      ("t3", 3L, 20240101, 11L, 1L, "2024-01-01 03:00:00", 0, 0, 0, 0, 9, 0.9, "Positive", "en"))
    val r = Gold.accountInfluence(f, dimAcc).collect()
    // only a1's current key (10) aggregates; the expired key 11 drops out
    assert(r.length == 1)
    assert(r(0).getAs[Long]("account_key") == 10L)
    assert(r(0).getAs[Long]("total_toots") == 2)
    assert(r(0).getAs[Long]("total_engagement") == 8)
    assert(r(0).getAs[Long]("positive_toots") == 1 && r(0).getAs[Long]("negative_toots") == 1)
  }

  test("report sentimentCounts buckets unscored rows") {
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 1, 0.9, "Positive", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 1, 0.9, null, "en"))
    val counts = Report.sentimentCounts(f).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("Positive" -> 1L, "Unscored" -> 1L))
  }

  test("report: top-k by polarity, language distribution, negative alert") {
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 1, 0.95, "Negative", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 2, 0.85, "Negative", "en"),
      ("t3", 3L, 20240101, 11L, 1L, "2024-01-01 03:00:00", 0, 0, 0, 0, 3, 0.99, "Positive", "fr"))
    val top = Report.topBySentiment(f, "negative", k = 1).collect()
    assert(top.length == 1 && top(0).getAs[String]("toot_id") == "t1")
    val langs = Report.languageDistribution(f).collect()
    assert(langs(0).getAs[String]("language") == "en" && langs(0).getAs[Long]("n_toots") == 2)
    val alert = Report.negativeAlert(f)
    assert(alert.triggered) // 2 negative > 1 positive + 0 neutral
    assert(alert == Report.SentimentAlert(true, 2, 1, 0, 66.67))
    val s = Report.summary(f)
    assert(s.nToots == 3 && s.nAccounts == 2 && s.totalEngagement == 6)
  }

  test("negativeAlert excludes unscored rows from the comparison, not the pct") {
    // 2 Negative vs 1 Positive + 0 Neutral + 2 unscored: the reference
    // compares against Positive+Neutral ONLY (counts dict drops falsy
    // labels) → triggered; percentage is negative/len(df) = 2/5.
    val f = fact(
      ("t1", 1L, 20240101, 10L, 1L, "2024-01-01 01:00:00", 0, 0, 0, 0, 1, 0.95, "Negative", "en"),
      ("t2", 2L, 20240101, 10L, 1L, "2024-01-01 02:00:00", 0, 0, 0, 0, 2, 0.85, "Negative", "en"),
      ("t3", 3L, 20240101, 11L, 1L, "2024-01-01 03:00:00", 0, 0, 0, 0, 3, 0.99, "Positive", "fr"),
      ("t4", 4L, 20240101, 11L, 1L, "2024-01-01 04:00:00", 0, 0, 0, 0, 3, 0.99, null, "fr"),
      ("t5", 5L, 20240101, 11L, 1L, "2024-01-01 05:00:00", 0, 0, 0, 0, 3, 0.99, null, "fr"))
    val alert = Report.negativeAlert(f)
    assert(alert == Report.SentimentAlert(true, 2, 1, 0, 40.0))
    // a NULL-heavy corpus must NOT trigger on "not negative" counting
    val quiet = Report.negativeAlert(f.filter(col("toot_id") =!= "t2"))
    assert(!quiet.triggered && quiet.percentage == 25.0)
  }

  test("negativeAlert pct matches the reference's (neg/n)*100 rounding order") {
    // 23/160: (23.0/160)*100 = 14.374999... -> 14.37, while the other
    // operand order 23*100.0/160 = 14.375 exactly -> 14.38 under
    // half-even. The reference divides first (discord_notifier.py:165).
    import spark.implicits._
    val df = spark.range(160)
      .select(when(col("id") < 23, "Negative").otherwise(lit(null: String))
        .as("sentiment_label"))
    assert(Report.negativeAlert(df).percentage == 14.37)
  }
}
