package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.engine.Bronze

/** Bronze transform chain over literal raw-toot rows (FIXTURES.md §B1). */
class BronzeSpec extends SparkSpec {

  private val rawSchema = graft.engine.Schemas.rawToot

  private def mkRow(id: String,
                    content: String = "<p>Hello<br>world &amp; more</p>",
                    language: String = "en",
                    visibility: String = "public",
                    replies: java.lang.Long = 1L,
                    tags: String = """[{"name":"ai"},{"name":"ml"}]""",
                    mentions: String = """[{"username":"alice"}]""",
                    media: String = """[{"type":"image"},{"type":"video"}]""",
                    account: String = """{"followers_count": 42, "following_count": 7, "statuses_count": 100, "bot": false, "created_at": "2020-01-01T00:00:00"}""",
                    reblog: String = null,
                    poll: String = null): Row =
    Row.fromSeq(Seq(id, null, null, "", visibility, language, "uri", "url",
      content, reblog, account, media, mentions, tags, null, null, null, poll,
      null, null, "acct1", "user1", "User One",
      replies, 2L, 3L, 0L, java.lang.Boolean.FALSE,
      Timestamp.valueOf("2024-01-01 10:00:00"), null))

  private val ts = Timestamp.valueOf("2024-01-02 00:00:00")

  private def transform(rows: Row*) = Bronze.transform(
    spark.createDataFrame(spark.sparkContext.parallelize(rows), rawSchema),
    ts, "run-1")

  test("derives clean content, json extracts, flags and metadata") {
    val r = transform(mkRow("t1")).collect()(0)
    assert(r.getAs[String]("content_clean") == "Hello world & more")
    assert(r.getAs[String]("spoiler_text_clean") == null) // empty -> null -> clean null
    assert(r.getAs[String]("tag_names") == "ai,ml")
    assert(r.getAs[String]("mention_usernames") == "alice")
    assert(r.getAs[Int]("media_count") == 2)
    assert(r.getAs[String]("media_types") == "image,video")
    assert(r.getAs[Long]("account_followers_count") == 42L)
    assert(r.getAs[Long]("account_following_count") == 7L)
    assert(!r.getAs[Boolean]("account_is_bot"))
    assert(!r.getAs[Boolean]("is_reblog") && !r.getAs[Boolean]("has_poll"))
    assert(r.getAs[String]("sentiment_model_name") == "standin-hash-v1")
    assert(r.getAs[Timestamp]("ingestion_timestamp") == ts)
    assert(r.getAs[String]("pipeline_run_id") == "run-1")
  }

  test("quality rules: negative counts, long language, bad visibility -> NULL") {
    val r = transform(mkRow("t2", language = "abcdefghijk",
      visibility = "friends-only", replies = -5L)).collect()(0)
    assert(r.isNullAt(r.fieldIndex("replies_count")))
    assert(r.isNullAt(r.fieldIndex("language")))
    assert(r.isNullAt(r.fieldIndex("visibility")))
  }

  test("malformed JSON blobs extract to NULL, not errors") {
    val r = transform(mkRow("t3", tags = "not json", media = "{broken",
      account = "[]")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("tag_names")))
    assert(r.isNullAt(r.fieldIndex("media_count")))
    assert(r.isNullAt(r.fieldIndex("account_followers_count")))
  }

  test("dedup on id keeps one row per id") {
    val out = transform(mkRow("dup"), mkRow("dup"), mkRow("other"))
    assert(out.count() == 2)
  }

  test("reblog/poll presence flags") {
    val r = transform(mkRow("t4", reblog = """{"id":"x"}""",
      poll = """{"id":"p"}""")).collect()(0)
    assert(r.getAs[Boolean]("is_reblog") && r.getAs[Boolean]("has_poll"))
  }

  test("sentiment score is in [0,1) and deterministic across runs") {
    val a = transform(mkRow("t5")).collect()(0).getAs[Double]("sentiment_score")
    val b = transform(mkRow("t5")).collect()(0).getAs[Double]("sentiment_score")
    assert(a == b && a >= 0.0 && a < 1.0)
  }
}
