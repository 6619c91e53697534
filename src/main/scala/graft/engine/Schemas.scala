package graft.engine

import org.apache.spark.sql.types._

/** Canonical schemas (SURVEY.md §1.2-1.3). Ingest always pins schemas
  * explicitly — never inference (the reference's modern path does the same
  * with Polars schema_overrides; hashtag_data_extractor.py:344-386).
  */
object Schemas {

  /** The 30-column raw toot record as landed by the extractor. */
  val rawToot: StructType = StructType(
    Seq(
      "id", "in_reply_to_id", "in_reply_to_account_id", "spoiler_text",
      "visibility", "language", "uri", "url", "content", "reblog", "account",
      "media_attachments", "mentions", "tags", "emojis", "quote", "card",
      "poll", "quote_approval", "application", "account_id",
      "account_username", "account_display_name").map(StructField(_, StringType))
      ++ Seq("replies_count", "reblogs_count", "favourites_count", "quotes_count")
        .map(StructField(_, LongType))
      ++ Seq(StructField("sensitive", BooleanType),
        StructField("created_at", TimestampType),
        StructField("edited_at", TimestampType)))
}
