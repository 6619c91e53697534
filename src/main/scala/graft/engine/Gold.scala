package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold-layer analytics — the reference's 7 materialized views
  * (models/gold/02_create_materialized_views.sql, SURVEY.md §2.9),
  * parameterized by a pinned `now` for the age/rate math (§7.5.1) and
  * recomputed in full on refresh (= the reference's REFRESH MATERIALIZED
  * VIEW). Every query is fact ⋈ broadcast-dims → groupBy, so the only wide
  * stage is the aggregation shuffle on the fact.
  */
object Gold {

  /** #1 mv_daily_engagement_summary (02:11-50). */
  def dailySummary(fact: DataFrame, dimDate: DataFrame): DataFrame =
    fact.join(broadcast(dimDate), Seq("date_key"))
      .groupBy(col("date_key"), col("full_date"), col("year"), col("month"),
        col("day_name"), col("is_weekend"))
      .agg(
        countDistinct("toot_id").as("total_toots"),
        countDistinct("account_key").as("unique_accounts"),
        sum("total_engagement").as("total_engagement"),
        sum("replies_count").as("total_replies"),
        sum("reblogs_count").as("total_reblogs"),
        sum("favourites_count").as("total_favourites"),
        Functions.avgIntExact(sum("total_engagement"), count(lit(1))).as("avg_engagement"),
        sum(when(col("sentiment_label") === "Positive", 1).otherwise(0)).as("positive_count"),
        sum(when(col("sentiment_label") === "Negative", 1).otherwise(0)).as("negative_count"),
        sum(when(col("sentiment_label") === "Neutral", 1).otherwise(0)).as("neutral_count"),
        // deterministic=true pins tie-breaks (plain mode picks arbitrarily
        // among equally-frequent values across runs)
        mode(col("language"), deterministic = true).as("top_language"))
      .withColumn("positive_pct",
        round(lit(100.0) * col("positive_count") /
          nullif(col("total_toots").cast("double"), lit(0.0)), 2))

  /** Partition-level incremental refresh of [[dailySummary]]: recompute
    * ONLY the date partitions touched by `delta` (a new/re-crawled fact
    * batch) and splice them into the existing MV.
    *
    * The reference refreshes by full recompute (`REFRESH MATERIALIZED
    * VIEW`, gold_refresh.py). At 100 TB a daily run touches a handful of
    * date_keys out of thousands — recomputing 3 partitions instead of
    * 3000 turns the refresh from a full-fact shuffle into a pruned scan:
    * the `date_key` semi-join filter pushes into the date-partitioned
    * fact parquet (directory pruning, see Pipeline's partitionBy), and
    * the MV rows for untouched dates are identical by construction
    * because the aggregation is keyed by date.
    *
    * `fact` must be the FULL fact table (the delta's dates may contain
    * rows from earlier loads); `existing` is the current MV state. */
  def dailySummaryIncremental(existing: DataFrame, fact: DataFrame,
                              delta: DataFrame, dimDate: DataFrame): DataFrame = {
    val touched = delta.select("date_key").distinct()
    spliceRefresh(existing,
      dailySummary(fact.join(broadcast(touched), Seq("date_key"), "left_semi"), dimDate),
      touched, Seq("date_key"))
  }

  /** Generic partition splice for any MV whose aggregation is keyed by
    * `keys`: keep existing rows for untouched keys (broadcast anti-join
    * — `touched` is a load's worth of partition keys, config-sized),
    * append the recomputed rows. Valid whenever rows for untouched keys
    * are independent of touched partitions — true for plain groupBys,
    * NOT for MVs with cross-partition windows (e.g. LAG over dates). */
  def spliceRefresh(existing: DataFrame, recomputed: DataFrame,
                    touched: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(broadcast(touched), keys, "left_anti")
      .unionByName(recomputed)

  /** #2 mv_top_performing_content (02:56-91) — rank + LIMIT 1000, with
    * the bronze read-back preview (`LEFT(COALESCE(content_clean, content),
    * 200)`, 02:59) and `engagement_rate` (`ROUND(100.0 * engagement /
    * NULLIF(followers, 0), 4)`, 02:77).
    *
    * Scale shape: top-1000 is taken FIRST (TakeOrdered — no global sort),
    * then bronze is semi-joined down to those 1000 ids via a broadcast
    * before the preview join, so the full-corpus bronze table is scanned
    * once with no shuffle — the reference joins all of bronze before its
    * LIMIT, which a 100 TB bronze cannot afford. */
  def topContent(fact: DataFrame, dimContent: DataFrame, dimAcc: DataFrame,
                 bronze: DataFrame): DataFrame = {
    val w = Window.orderBy(col("total_engagement").desc, col("toot_id"))
    val top = fact
      .orderBy(col("total_engagement").desc, col("toot_id"))
      .limit(1000)
    val preview = bronze.select(col("id").as("toot_id"),
      substring(coalesce(col("content_clean"), col("content")), 1, 200)
        .as("content_preview"))
      .join(broadcast(top.select("toot_id")), Seq("toot_id"), "left_semi")
    top
      .join(broadcast(dimContent.select("content_key", "content_type")),
        Seq("content_key"), "left")
      .join(broadcast(dimAcc.filter(col("is_current"))
        .select(col("account_key"), col("account_username"), col("influence_tier"),
          col("account_followers_count").as("account_followers"))),
        Seq("account_key"), "left")
      .join(broadcast(preview), Seq("toot_id"), "left")
      .withColumn("engagement_rate",
        round(lit(100.0) * col("total_engagement") /
          nullif(col("account_followers").cast("double"), lit(0.0)), 4))
      .select(col("toot_id"), col("content_preview"), col("content_type"),
        col("account_username"), col("influence_tier"),
        col("account_followers"), col("engagement_rate"),
        col("total_engagement"), col("replies_count"), col("reblogs_count"),
        col("favourites_count"), col("sentiment_label"))
      .orderBy(col("total_engagement").desc, col("toot_id"))
      .withColumn("engagement_rank", row_number().over(w))
  }

  /** #3 mv_account_influence_analysis (02:97-137). */
  def accountInfluence(fact: DataFrame, dimAcc: DataFrame): DataFrame =
    dimAcc.filter(col("is_current"))
      .join(fact, Seq("account_key"))
      .groupBy(col("account_key"), col("account_id"), col("account_username"),
        col("influence_tier"), col("account_followers_count"))
      .agg(
        countDistinct("toot_id").as("total_toots"),
        sum("total_engagement").as("total_engagement"),
        Functions.avgIntExact(sum("total_engagement"), count(lit(1))).as("avg_engagement"),
        max("total_engagement").as("max_engagement"),
        sum(when(col("sentiment_label") === "Positive", 1).otherwise(0)).as("positive_toots"),
        sum(when(col("sentiment_label") === "Negative", 1).otherwise(0)).as("negative_toots"),
        min("created_at").as("first_toot_at"),
        max("created_at").as("last_toot_at"))

  /** #4 mv_hashtag_performance (02:143-182) — explode CSV hashtags,
    * HAVING >= 2, LIMIT 500. */
  def hashtagPerformance(fact: DataFrame, dimContent: DataFrame): DataFrame =
    fact.join(broadcast(dimContent.select("content_key", "tag_names")),
        Seq("content_key"), "left")
      .filter(col("tag_names").isNotNull && trim(col("tag_names")) =!= "")
      .select(col("toot_id"), col("total_engagement"), col("sentiment_label"),
        col("date_key"),
        explode(split(lower(col("tag_names")), ",")).as("hashtag"))
      .filter(trim(col("hashtag")) =!= "")
      .groupBy(trim(col("hashtag")).as("hashtag"))
      .agg(
        countDistinct("toot_id").as("mention_count"),
        sum("total_engagement").as("total_engagement"),
        Functions.avgIntExact(sum("total_engagement"), count(lit(1))).as("avg_engagement"),
        max("total_engagement").as("max_engagement"),
        sum(when(col("sentiment_label") === "Positive", 1).otherwise(0)).as("positive_mentions"),
        countDistinct("date_key").as("days_active"))
      .filter(col("mention_count") >= 2)
      .orderBy(col("total_engagement").desc, col("hashtag"))
      .limit(500)

  /** #5 mv_hourly_posting_patterns (02:188-206) — rank over aggregate. */
  def hourlyPatterns(fact: DataFrame, dimDate: DataFrame): DataFrame = {
    val agg = fact.join(broadcast(dimDate), Seq("date_key"))
      .groupBy(hour(col("created_at")).as("hour_of_day"),
        col("day_name"), col("is_weekend"))
      .agg(count(lit(1)).as("toot_count"),
        sum("total_engagement").as("total_engagement"),
        Functions.avgIntExact(sum("total_engagement"), count(lit(1))).as("avg_engagement"))
    agg.withColumn("activity_rank",
      row_number().over(Window.orderBy(col("avg_engagement").desc,
        col("hour_of_day"), col("day_name"))))
  }

  /** #6 mv_sentiment_trends (02:212-232) — agg then LAG day-over-day. */
  def sentimentTrends(fact: DataFrame, dimDate: DataFrame): DataFrame = {
    val daily = fact.join(broadcast(dimDate), Seq("date_key"))
      .filter(col("sentiment_label").isNotNull)
      .groupBy(col("full_date"), col("sentiment_label"))
      .agg(count(lit(1)).as("toot_count"),
        Functions.avgIntExact(sum("total_engagement"), count(lit(1))).as("avg_engagement"))
    val w = Window.partitionBy("sentiment_label").orderBy("full_date")
    daily
      .withColumn("prev_count", lag(col("toot_count"), 1).over(w))
      .withColumn("count_change_pct",
        round(lit(100.0) * (col("toot_count") - col("prev_count")) /
          nullif(col("prev_count").cast("double"), lit(0.0)), 2))
  }

  /** #7 mv_viral_content_indicators (02:238-273) — engagement velocity vs
    * pinned now, weighted score, threshold, LIMIT 500. */
  def viralContent(fact: DataFrame, dimContent: DataFrame, now: Timestamp): DataFrame = {
    val hoursSince = Functions.hoursSince(lit(now), col("created_at"))
    fact
      .join(broadcast(dimContent.select("content_key", "content_preview", "content_type")),
        Seq("content_key"), "left")
      .withColumn("hours_since_post", hoursSince)
      .withColumn("engagement_per_hour",
        round(col("total_engagement") / nullif(col("hours_since_post"), lit(0.0)), 4))
      .withColumn("virality_score", // 02:251-252 weighting
        round((col("total_engagement") * 0.4 + col("reblogs_count") * 0.4
          + col("quotes_count") * 0.2) / nullif(col("hours_since_post"), lit(0.0)), 6))
      .filter(col("total_engagement") > 10) // 02:269
      .select("toot_id", "content_preview", "content_type", "total_engagement",
        "reblogs_count", "quotes_count", "hours_since_post",
        "engagement_per_hour", "virality_score", "sentiment_label")
      .orderBy(col("virality_score").desc, col("toot_id"))
      .limit(500)
  }
}
