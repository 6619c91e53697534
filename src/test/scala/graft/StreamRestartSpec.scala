package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.streaming.Streams

/** Kill-and-restart semantics on REAL files and checkpoints — the torn
  * window the MemoryStream specs can't reach: a micro-batch whose
  * OFFSETS were logged but whose COMMIT marker never landed (the process
  * died mid-batch). Structured Streaming's restart contract replays that
  * batch; these specs prove both sink flavors absorb the replay:
  *
  *   - the parquet file sink via its own `_spark_metadata` commit log
  *     (an already-committed batch id is skipped, torn data files from
  *     an UNcommitted write are invisible to readers), and
  *   - the foreachBatch gold sink via merge idempotence (re-applying a
  *     committed batch converges to the same layer + MV state).
  *
  * The mid-batch kill is simulated by deleting the checkpoint's last
  * `commits/N` file after a clean stop — precisely the on-disk state a
  * crash between sink commit and checkpoint commit leaves behind. */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Deletes the checkpoint's most recent commits/N marker, regressing
    * the checkpoint to "batch N ran but never committed" — the replay
    * trigger. Returns the regressed batch id. */
  private def tearLastCommit(cp: String): Long = {
    val commits = Paths.get(cp, "commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    Files.delete(commits.resolve(last.toString))
    // the local-FS checksum sidecar must go with it, or the replayed
    // batch's commit rename collides with the stale CRC
    Files.deleteIfExists(commits.resolve(s".$last.crc"))
    last
  }

  test("toParquet: a mid-batch kill replays the batch; the sink commit log dedups it") {
    val base = Files.createTempDirectory("graft-tear-sink").toString
    val (inDir, out, cp) = (s"$base/in", s"$base/out", s"$base/cp")
    val schema = StructType.fromDDL("event_id LONG, event_type STRING, value DOUBLE")
    def addFile(rows: (Long, String, Double)*): Unit =
      rows.toSeq.toDF("event_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
    def start() = Streams.toParquet(
      spark.readStream.schema(schema).parquet(inDir), out, cp)

    addFile((1L, "click", 1.0), (2L, "view", 2.0))
    val q1 = start(); try q1.processAllAvailable() finally q1.stop()
    addFile((3L, "click", 3.0), (4L, "view", 4.0))
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 4)

    // torn-write visibility: a data file that never reached _spark_metadata
    // (crash between file write and sink commit) must be invisible to
    // readers — the metadata log, not the directory listing, is the table
    val orphanSrc = Files.list(Paths.get(out)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(orphanSrc, orphanSrc.resolveSibling("part-orphan-torn.snappy.parquet"))
    assert(spark.read.parquet(out).count() == 4,
      "uncommitted (torn) data files must not be readable through _spark_metadata")

    // mid-batch kill: regress the checkpoint so the engine replays the
    // last batch; the file sink must skip the already-committed batch id
    val torn = tearLastCommit(cp)
    val q3 = start(); try q3.processAllAvailable() finally q3.stop()
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L),
      s"replay of batch $torn must not re-emit rows: got ${ids.toSeq}")
  }

  test("incrementalGoldSink: replaying a committed batch converges (no dupes, MV == full recompute)") {
    val lake = Files.createTempDirectory("graft-tear-gold").toString
    val (inDir, cp) = (s"$lake/in", s"$lake/cp")
    val dimDate = Seq(
      (20240101, "2024-01-01", 2024, 1, "Monday", false),
      (20240102, "2024-01-02", 2024, 1, "Tuesday", false))
      .toDF("date_key", "full_date_s", "year", "month", "day_name", "is_weekend")
      .withColumn("full_date", col("full_date_s").cast("date")).drop("full_date_s")
    val schema = StructType.fromDDL(
      "toot_id STRING, date_key INT, account_key LONG, created_at TIMESTAMP, " +
        "ingestion_timestamp TIMESTAMP, replies_count LONG, reblogs_count LONG, " +
        "favourites_count LONG, total_engagement LONG, sentiment_label STRING, " +
        "language STRING")
    def addFile(rows: (String, Int, Long, Timestamp, Timestamp, Long, Long, Long, Long, String, String)*): Unit =
      rows.toSeq.toDF("toot_id", "date_key", "account_key", "created_at",
        "ingestion_timestamp", "replies_count", "reblogs_count",
        "favourites_count", "total_engagement", "sentiment_label", "language")
        .coalesce(1).write.mode("append").parquet(inDir)
    def start() = Streams.incrementalGoldSink(
      spark.readStream.schema(schema).parquet(inDir), dimDate, lake, cp)
    def factOnDisk = spark.read.parquet(s"$lake/silver/fact")
    def mvOnDisk = spark.read.parquet(s"$lake/gold/daily_engagement_summary")
    def fullRecompute = graft.engine.Gold.dailySummary(factOnDisk, dimDate)

    addFile(
      ("t1", 20240101, 10L, ts("2024-01-01 01:00:00"), ts("2024-01-02 00:00:00"), 1L, 1L, 1L, 3L, "Positive", "en"),
      ("t2", 20240101, 11L, ts("2024-01-01 02:00:00"), ts("2024-01-02 00:00:00"), 0L, 2L, 2L, 4L, "Negative", "en"),
      ("t3", 20240102, 10L, ts("2024-01-02 01:00:00"), ts("2024-01-02 00:00:00"), 5L, 0L, 0L, 5L, "Positive", "fr"))
    val q1 = start(); try q1.processAllAvailable() finally q1.stop()
    // batch 2: re-crawl t1 (newer ingestion wins) + new t4
    addFile(
      ("t1", 20240101, 10L, ts("2024-01-01 01:00:00"), ts("2024-01-03 00:00:00"), 9L, 9L, 9L, 27L, "Positive", "en"),
      ("t4", 20240101, 12L, ts("2024-01-01 03:00:00"), ts("2024-01-03 00:00:00"), 1L, 0L, 0L, 1L, "Neutral", "en"))
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    assert(factOnDisk.count() == 4)
    val factBefore = factOnDisk.collect().map(_.toString).sorted.toSeq
    val mvBefore = mvOnDisk.collect().map(_.toString).sorted.toSeq

    // mid-batch kill: batch 2's merge ran to completion but its commit
    // marker is gone — the restart MUST re-run the same foreachBatch body
    // over the same rows, and the merge's idempotence must absorb it
    tearLastCommit(cp)
    val q3 = start(); try q3.processAllAvailable() finally q3.stop()

    assert(factOnDisk.count() == 4, "replayed merge must not duplicate rows")
    assert(factOnDisk.collect().map(_.toString).sorted.toSeq == factBefore,
      "replayed merge must converge to the identical fact state")
    assert(mvOnDisk.collect().map(_.toString).sorted.toSeq == mvBefore,
      "replayed splice must converge to the identical MV state")
    assert(mvOnDisk.collect().toSet == fullRecompute.collect().toSet,
      "post-replay MV must equal a full recompute from the fact layer")
  }

  test("scd2Sink: replaying a committed batch converges; one current row per key") {
    val base = Files.createTempDirectory("graft-tear-scd2").toString
    val (inDir, dim, cp) = (s"$base/in", s"$base/dim", s"$base/cp")
    val schema = StructType.fromDDL(
      "account_id STRING, followers LONG, display_name STRING, " +
        "ingestion_timestamp TIMESTAMP")
    def addFile(rows: (String, Long, String, Timestamp)*): Unit =
      rows.toSeq.toDF("account_id", "followers", "display_name", "ingestion_timestamp")
        .coalesce(1).write.mode("append").parquet(inDir)
    def start() = Streams.scd2Sink(
      spark.readStream.schema(schema).parquet(inDir), dim, cp,
      key = "account_id", attrs = Seq("followers", "display_name"))
    def state = spark.read.parquet(dim)

    // batch 1: two fresh keys, plus an intra-batch double version of a1
    // (latest-per-key collapse: only the 100-follower version lands)
    addFile(
      ("a1", 50L, "Ada", ts("2024-01-01 00:00:00")),
      ("a1", 100L, "Ada", ts("2024-01-01 12:00:00")),
      ("a2", 10L, "Bob", ts("2024-01-01 12:00:00")))
    val q1 = start(); try q1.processAllAvailable() finally q1.stop()
    assert(state.count() == 2, "intra-batch versions collapse to latest")
    assert(state.filter(col("account_id") === "a1")
      .head.getAs[Long]("followers") == 100L)

    // batch 2: a1 changes, a2 unchanged (must NOT re-version), a3 new
    addFile(
      ("a1", 200L, "Ada", ts("2024-01-02 00:00:00")),
      ("a2", 10L, "Bob", ts("2024-01-02 00:00:00")),
      ("a3", 5L, "Cid", ts("2024-01-02 00:00:00")))
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    val before = state.collect().map(_.toString).sorted.toSeq
    assert(state.count() == 4, "a1 expired+reinserted, a2 untouched, a3 inserted")
    // the expired a1 version closes at the BATCH-derived stamp, not wall-clock
    val expired = state.filter(col("account_id") === "a1" && !col("is_current")).head
    assert(expired.getAs[Timestamp]("valid_to") == ts("2024-01-02 00:00:00"),
      s"valid_to must come from the batch: $expired")

    // mid-batch kill: batch 2's apply ran but its commit marker is gone —
    // the replayed apply must detect zero changes and rewrite verbatim
    tearLastCommit(cp)
    val q3 = start(); try q3.processAllAvailable() finally q3.stop()
    assert(state.collect().map(_.toString).sorted.toSeq == before,
      "replayed SCD2 apply must converge to the identical dimension state")
    // invariant: exactly one current row per key, expired rows closed
    val perKey = state.filter(col("is_current"))
      .groupBy("account_id").count().collect()
    assert(perKey.length == 3 && perKey.forall(_.getLong(1) == 1L),
      "exactly one current row per key after replay")
    assert(state.filter(!col("is_current") && col("valid_to").isNull).count() == 0,
      "every expired row carries a close timestamp")
  }
}
