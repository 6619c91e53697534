package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze-layer transform chain — the reference's 25-raw → 49-column bronze
  * record (reference: src/transformer/transformer.py:40-78, stage order
  * clean → normalize → json-extract → quality → sentiment), re-expressed as
  * one fused projection of pure column expressions: at 100 TB the whole
  * chain is a single narrow whole-stage-codegen pass over the scan, no
  * shuffle until the id-dedup.
  */
object Bronze {

  /** Nested-JSON schemas for the blob columns the extractor re-serializes
    * (reference: src/extractor/hashtag_data_extractor.py:283-331). */
  val tagsSchema: ArrayType = ArrayType(StructType(Seq(StructField("name", StringType))))
  val mentionsSchema: ArrayType = ArrayType(StructType(Seq(StructField("username", StringType))))
  val mediaSchema: ArrayType = ArrayType(StructType(Seq(StructField("type", StringType))))

  val ValidVisibilities = Seq("public", "unlisted", "private", "direct")

  private val countCols = Seq("replies_count", "reblogs_count", "favourites_count", "quotes_count")

  /** Raw string columns that get empty-string→NULL normalization
    * (reference: src/transformer/text_cleaner.py:79-99). */
  private val stringCols = Seq(
    "id", "in_reply_to_id", "in_reply_to_account_id", "spoiler_text",
    "visibility", "language", "uri", "url", "content", "reblog", "account",
    "media_attachments", "mentions", "tags", "emojis", "quote", "card",
    "poll", "quote_approval", "application", "account_id",
    "account_username", "account_display_name")

  /** CSV list of a field across a JSON array blob, NULL for null/absent
    * arrays (reference: src/transformer/json_extractor.py:15-40). */
  def jsonArrayField(blob: Column, schema: ArrayType, field: String): Column = {
    val arr = from_json(blob, schema)
    when(arr.isNull, lit(null)).otherwise(array_join(arr.getField(field), ","))
  }

  /** Array length with Polars NULL semantics: NULL in → NULL out (Spark's
    * `size` returns -1 on null — SURVEY.md §7.5.4). */
  def jsonArrayLen(blob: Column, schema: ArrayType): Column = {
    val arr = from_json(blob, schema)
    when(arr.isNull, lit(null)).otherwise(size(arr))
  }

  /** Full bronze projection. `ingestionTs`/`runId`/`dataVersion` are the
    * lineage metadata columns (reference: src/loader/bronze_loader.py:79-97).
    * Dedup keep-first on id (data_quality.py:57-62) is made deterministic by
    * ordering on ingestion order via monotonically increasing row id only
    * within this batch — callers needing cross-run dedup use
    * [[Silver.dedupLatest]] on ingestion_timestamp. */
  def transform(raw: DataFrame, ingestionTs: java.sql.Timestamp,
                runId: String, dataVersion: String = "1.0"): DataFrame = {
    // 1. empty-string → NULL normalization on every string column
    val normalized = stringCols.foldLeft(raw) { (df, c) =>
      df.withColumn(c, Functions.emptyToNull(col(c)))
    }

    // 2. HTML cleaning (tags, entities, whitespace) → *_clean columns
    // 3. JSON extraction from the blob columns
    // 4. data-quality rules: negative counts → NULL, language length cap,
    //    visibility set validation
    // 5. deterministic sentiment stand-in + threshold/label post-processing
    val withDerived = normalized
      .withColumn("content_clean", Functions.cleanHtml(col("content")))
      .withColumn("spoiler_text_clean", Functions.cleanHtml(col("spoiler_text")))
      .withColumn("tag_names", jsonArrayField(col("tags"), tagsSchema, "name"))
      .withColumn("mention_usernames",
        jsonArrayField(col("mentions"), mentionsSchema, "username"))
      .withColumn("media_count", jsonArrayLen(col("media_attachments"), mediaSchema))
      .withColumn("media_types",
        jsonArrayField(col("media_attachments"), mediaSchema, "type"))
      .withColumn("account_followers_count",
        get_json_object(col("account"), "$.followers_count").cast("long"))
      .withColumn("account_following_count",
        get_json_object(col("account"), "$.following_count").cast("long"))
      .withColumn("account_statuses_count",
        get_json_object(col("account"), "$.statuses_count").cast("long"))
      .withColumn("account_is_bot",
        get_json_object(col("account"), "$.bot").cast("boolean"))
      .withColumn("account_created_at",
        get_json_object(col("account"), "$.created_at").cast("timestamp"))
      .withColumn("is_reblog", col("reblog").isNotNull)
      .withColumn("has_poll", col("poll").isNotNull)
      .withColumn("has_card", col("card").isNotNull)
      .withColumn("language", Functions.nullIfLongerThan(col("language"), 10))
      .withColumn("visibility",
        Functions.validateInSet(col("visibility"), ValidVisibilities))

    val qualityFixed = countCols.foldLeft(withDerived) { (df, c) =>
      df.withColumn(c, Functions.nullIfNegative(col(c)))
    }

    val scored = qualityFixed
      .withColumn("sentiment_score", Functions.standInScore(col("content_clean")))
      .withColumn("sentiment_value",
        Functions.sentimentLabel(col("sentiment_score"),
          positiveIf = col("sentiment_score") >= 0.875))
      .withColumn("sentiment_model_name", lit("standin-hash-v1"))
      .withColumn("ingestion_timestamp", lit(ingestionTs))
      .withColumn("pipeline_run_id", lit(runId))
      .withColumn("data_version", lit(dataVersion))

    // 6. dedup keep-first on id (within-batch): "first" = scan order,
    //    captured as a row id BEFORE the dedup shuffle so the kept row is
    //    the earliest-scanned one (pandas keep='first',
    //    data_quality.py:57-62) rather than dropDuplicates' arbitrary pick.
    //    Scope of the determinism claim: monotonically_increasing_id
    //    orders by partition INDEX, and the file scan assigns splits to
    //    partitions by size (bin-packing), so for duplicates spanning
    //    multiple input files "first" matches pandas' concatenated-input
    //    order only for a single-file (or single-partition) batch. Callers
    //    needing reference-exact cross-file first-wins order on a real
    //    column instead — [[Silver.dedupLatest]] on ingestion_timestamp.
    scored.withColumn("__scan_order", monotonically_increasing_id())
      .transform(df => Silver.dedupLatest(df, Seq("id"), Seq(col("__scan_order").asc)))
      .drop("__scan_order")
  }
}
