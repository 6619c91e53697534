package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver-layer star schema over the toot domain (reference:
  * src/loader/silver_etl.py — 4 dimensions + 1 fact, SCD2 on accounts).
  * Dims are built from bronze in one pass each; surrogate keys are
  * deterministic hashes (re-runnable builds, unlike SERIAL sequences).
  */
object Star {

  /** dim_date — calendar attributes for every date observed in bronze
    * (silver_etl.py:95-130). PG DOW semantics via Functions.dow0. */
  def dimDate(bronze: DataFrame): DataFrame =
    bronze.select(to_date(col("created_at")).as("full_date")).distinct()
      .filter(col("full_date").isNotNull)
      .select(
        Functions.dateKey(col("full_date")).as("date_key"),
        col("full_date"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        weekofyear(col("full_date")).as("week"),
        Functions.dow0(col("full_date")).as("day_of_week"),
        Functions.dayName(col("full_date")).as("day_name"),
        Functions.monthName(col("full_date")).as("month_name"),
        Functions.isWeekend(col("full_date")).as("is_weekend"))

  /** Attributes tracked for SCD2 account change detection
    * (silver_etl.py:186-196). */
  val accountTrackedAttrs: Seq[String] = Seq(
    "account_username", "account_display_name", "account_followers_count",
    "account_following_count", "account_statuses_count", "account_is_bot")

  /** Latest account snapshot per account_id within a bronze batch
    * (silver_etl.py:145-181 collapsed to latest-per-key — SURVEY §7.5.6). */
  def accountBatch(bronze: DataFrame): DataFrame =
    Silver.dedupLatest(
      bronze.filter(col("account_id").isNotNull),
      Seq("account_id"),
      Seq(col("ingestion_timestamp").desc, col("id").desc))
      .select(col("account_id") +: accountTrackedAttrs.map(col): _*)

  /** SCD2-apply a bronze batch onto the existing dim_account state.
    * `existing` may be empty (first run) but must carry the full dim
    * schema; emits a surrogate account_key = hash(account_id, valid_from). */
  def dimAccount(existing: DataFrame, bronze: DataFrame, now: Timestamp): DataFrame = {
    val applied = Silver.scd2Apply(
      existing.drop("account_key", "influence_tier", "follower_ratio"),
      accountBatch(bronze),
      "account_id", accountTrackedAttrs, lit(now))
    applied
      .withColumn("account_key", xxhash64(col("account_id"), col("valid_from")))
      .withColumn("influence_tier", // silver_etl.py:162-167 thresholds
        when(col("account_followers_count") >= 1000000, "Mega")
          .when(col("account_followers_count") >= 100000, "Macro")
          .when(col("account_followers_count") >= 10000, "Mid")
          .otherwise("Micro"))
      .withColumn("follower_ratio", // silver_etl.py:169-173
        when(col("account_following_count") > 0,
          col("account_followers_count").cast("double") / col("account_following_count"))
          .otherwise(lit(0.0)))
  }

  /** Empty dim_account with the right schema, for first runs. */
  def emptyDimAccount(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("account_id", StringType),
      StructField("account_username", StringType),
      StructField("account_display_name", StringType),
      StructField("account_followers_count", LongType),
      StructField("account_following_count", LongType),
      StructField("account_statuses_count", LongType),
      StructField("account_is_bot", BooleanType),
      StructField("valid_from", TimestampType),
      StructField("valid_to", TimestampType),
      StructField("is_current", BooleanType),
      StructField("account_key", LongType),
      StructField("influence_tier", StringType),
      StructField("follower_ratio", DoubleType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** dim_sentiment — the seeded score-bucket table (models/silver/02:137-144;
    * deliberately leaves pos/neg scores < 0.50 unmatched and Neutral
    * spanning [0,1) — SURVEY §7.5.7, replicated, never "fixed"). */
  def dimSentiment(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Positive", 0.75, 1.01, "high"),
      ("Positive", 0.50, 0.75, "medium"),
      ("Negative", 0.75, 1.01, "high"),
      ("Negative", 0.50, 0.75, "medium"),
      ("Neutral", 0.00, 1.01, "any"))
      .toDF("sentiment_value", "sentiment_score_min", "sentiment_score_max", "confidence_level")
      .withColumn("sentiment_key",
        xxhash64(col("sentiment_value"), col("sentiment_score_min")))
  }

  /** dim_content — one row per toot natural key with derived content
    * attributes (silver_etl.py:236-299). */
  def dimContent(bronze: DataFrame): DataFrame =
    Silver.dedupLatest(bronze, Seq("id"), Seq(col("ingestion_timestamp").desc))
      .select(
        col("id").as("toot_id"),
        Functions.preview(coalesce(col("content_clean"), col("content")), 200)
          .as("content_preview"),
        col("language"),
        col("visibility"),
        col("sensitive").as("is_sensitive"),
        col("tag_names"),
        Functions.csvCount(col("tag_names")).as("hashtag_count"),
        col("mention_usernames"),
        coalesce(col("media_count"), lit(0)).as("media_count"),
        col("media_types"),
        when(col("is_reblog"), "Reblog") // silver_etl.py:280-285
          .when(col("in_reply_to_id").isNotNull, "Reply")
          .when(col("quote").isNotNull, "Quote")
          .otherwise("Original").as("content_type"),
        col("has_poll"), col("has_card"))
      .withColumn("content_key", xxhash64(col("toot_id")))

  /** fact_toot_engagement — latest bronze version per toot joined to all
    * dims (J2/J3/J4), engagement sum F14 (silver_etl.py:344-434). */
  def factEngagement(bronze: DataFrame, dimAcc: DataFrame, dimSent: DataFrame): DataFrame = {
    val latest = Silver.dedupLatest(bronze, Seq("id"),
      Seq(col("ingestion_timestamp").desc))
    val cur = dimAcc.filter(col("is_current"))
      .select(col("account_id").as("acc_id"), col("account_key"))
    val sent = broadcast(dimSent
      .withColumnRenamed("sentiment_value", "dim_sentiment_value"))
    latest
      .join(cur, col("account_id") === col("acc_id"), "left")          // J2
      .join(sent,                                                       // J4 band
        lower(col("sentiment_value")) === lower(col("dim_sentiment_value")) &&
          col("sentiment_score") >= col("sentiment_score_min") &&
          col("sentiment_score") < col("sentiment_score_max"),
        "left")
      .select(
        col("id").as("toot_id"),
        xxhash64(col("id")).as("content_key"),                          // J3 by construction
        Functions.dateKey(col("created_at")).as("date_key"),
        col("account_key"),
        col("sentiment_key"),
        col("created_at"),
        coalesce(col("replies_count"), lit(0L)).as("replies_count"),
        coalesce(col("reblogs_count"), lit(0L)).as("reblogs_count"),
        coalesce(col("favourites_count"), lit(0L)).as("favourites_count"),
        coalesce(col("quotes_count"), lit(0L)).as("quotes_count"),
        (coalesce(col("replies_count"), lit(0L)) + coalesce(col("reblogs_count"), lit(0L))
          + coalesce(col("favourites_count"), lit(0L)) + coalesce(col("quotes_count"), lit(0L)))
          .as("total_engagement"),                                      // F14
        col("sentiment_score"),
        col("sentiment_value").as("sentiment_label"),
        col("language"),
        // per-row provenance (the reference's bronze metadata columns,
        // bronze_loader.py:79-97, carried THROUGH the star build): which
        // pipeline run ingested the winning version of this toot and
        // when — the governance trail a 100 TB curation pipeline needs
        // to attribute any fact row back to its load
        col("pipeline_run_id"),
        col("ingestion_timestamp"))
  }
}
