package graft.engine

import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E1 end-to-end orchestration over a lake directory (reference:
  * src/main.py:45-260 — extract → transform → bronze → silver → gold →
  * report), with cross-run incrementality: bronze upsert-as-rewrite on id,
  * SCD2 accumulation in dim_account, and full gold recompute per run
  * (= REFRESH MATERIALIZED VIEW).
  *
  * Layout: `$lake/bronze`, `$lake/silver/<dim>`, `$lake/gold/<mv>` as
  * parquet. On a cluster these become partitioned tables (bronze/fact by
  * date_key); the swap-rewrite below is the vanilla-parquet stand-in for a
  * transactional MERGE.
  */
object Pipeline {

  final case class RunResult(bronzeRows: Long, factRows: Long,
                             goldTables: Map[String, Long],
                             summary: Report.Summary,
                             negativeAlert: Report.SentimentAlert)

  /** Tags an exception with the pipeline stage it escaped from, so the
    * error report names the step (reference: main.py:246-258 reports the
    * stage alongside the exception). */
  private final case class StageFailure(stageName: String, cause: Throwable)
    extends RuntimeException(cause)

  private def stage[T](name: String)(body: => T): T =
    try body
    catch { case scala.util.control.NonFatal(e) => throw StageFailure(name, e) }

  private[graft] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Overwrite `path` with `df` even when `df` reads from `path`: write a
    * new snapshot beside it, then swap directories. (Parquet cannot
    * overwrite its own input mid-read; table formats solve this with
    * transactions — this is the path-based equivalent.) The swap keeps
    * the prior snapshot at `path__old` until the new one is in place, so
    * no crash point destroys the only copy: a crash between the two
    * renames leaves `path` missing but `path__old` complete, which
    * [[readRecoverable]] restores on the next read. Pass `partitionCols`
    * for the big time-keyed tables so downstream date filters prune
    * whole directories (the Parquet analog of the reference's
    * created_at/date_key btree indexes). */
  private[graft] def overwriteParquet(df: DataFrame, path: String,
                                      partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__tmp")
    val old = new Path(path + "__old")
    val dst = new Path(path)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dst)) fs.rename(dst, old)
    fs.rename(tmp, dst)
    fs.delete(old, true)
  }

  /** Read `path`, recovering from an interrupted [[overwriteParquet]]
    * swap: if the main directory is missing but the `__old` backup
    * exists (crash between the two renames), restore the backup first.
    * Single-writer contract — the same one the swap itself assumes. */
  private[graft] def readRecoverable(spark: SparkSession, path: String): Option[DataFrame] = {
    val dst = new Path(path)
    val old = new Path(path + "__old")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst) && fs.exists(old)) fs.rename(old, dst)
    if (fs.exists(dst)) Some(spark.read.parquet(path)) else None
  }

  /** Bronze upsert: union with the existing layer, keep the
    * latest-ingested version per id (reference: bronze_loader.py:143-188
    * ON CONFLICT upsert, re-expressed as read ∪ new → dedup → rewrite).
    * EQUAL-timestamp ties resolve by content hash (descending), so the
    * survivor is a pure function of the data — the same row wins on any
    * partitioning, upsert order, or replay (a bare timestamp sort would
    * leave the winner to partition arrival order). Identical-content
    * ties are harmless by construction. */
  def upsertBronze(spark: SparkSession, newBronze: DataFrame, lake: String): DataFrame = {
    val path = s"$lake/bronze"
    val merged =
      if (exists(spark, path))
        spark.read.parquet(path).unionByName(newBronze, allowMissingColumns = true)
      else newBronze
    // hash fields in NAME order: merged.columns order depends on which
    // batch was written first (allowMissingColumns appends new columns
    // at the end), so a positional struct would make the tie-break hash
    // — and thus the surviving row — depend on upsert order under
    // schema evolution, breaking the replay guarantee below
    val deduped = Silver.dedupLatest(merged, Seq("id"),
      Seq(col("ingestion_timestamp").desc,
        xxhash64(struct(merged.columns.sorted.map(col): _*)).desc))
    overwriteParquet(deduped, path)
    spark.read.parquet(path)
  }

  /** One full pipeline run from already-landed raw records. A failure in
    * any stage returns the error-alert value the reference's notifier
    * would fire (main.py:246-258: catch → send_error_alert(message,
    * stage) → return False) instead of escaping as a raw exception. */
  def run(spark: SparkSession, raw: DataFrame, lake: String,
          now: Timestamp, runId: String): Either[Report.ErrorReport, RunResult] =
    try Right(runStages(spark, raw, lake, now, runId))
    catch {
      case StageFailure(name, cause) => Left(Report.errorReport(name, cause))
      case scala.util.control.NonFatal(e) => Left(Report.errorReport("ETL Pipeline", e))
    }

  private def runStages(spark: SparkSession, raw: DataFrame, lake: String,
                        now: Timestamp, runId: String): RunResult = {
    // stages 2-3: transform + bronze load (upsert)
    val bronze = stage("Transform & Bronze Load") {
      upsertBronze(spark, Bronze.transform(raw, now, runId), lake)
    }

    // stage 4: silver star build — dims must exist before the fact (E2)
    val fact = stage("Silver Star Build") {
      val dimDatePath = s"$lake/silver/dim_date"
      val dimAccPath = s"$lake/silver/dim_account"
      overwriteParquet(Star.dimDate(bronze), dimDatePath)
      val existingAcc =
        if (exists(spark, dimAccPath)) spark.read.parquet(dimAccPath)
        else Star.emptyDimAccount(spark)
      overwriteParquet(Star.dimAccount(existingAcc, bronze, now), dimAccPath)
      overwriteParquet(Star.dimContent(bronze), s"$lake/silver/dim_content")
      overwriteParquet(Star.dimSentiment(spark), s"$lake/silver/dim_sentiment")

      val dimAcc = spark.read.parquet(dimAccPath)
      val dimSent = spark.read.parquet(s"$lake/silver/dim_sentiment")
      // the fact is the 100 TB table: partition by date_key so gold's
      // date-dim joins and any time-range filter prune whole directories
      overwriteParquet(Star.factEngagement(bronze, dimAcc, dimSent),
        s"$lake/silver/fact", partitionCols = Seq("date_key"))
      spark.read.parquet(s"$lake/silver/fact")
    }

    // stage 5: gold refresh — full recompute, overwrite (E3)
    val goldCounts = stage("Gold Refresh") {
      val dimDate = spark.read.parquet(s"$lake/silver/dim_date")
      val dimAcc = spark.read.parquet(s"$lake/silver/dim_account")
      val dimContent = spark.read.parquet(s"$lake/silver/dim_content")
      val gold = Map[String, DataFrame](
        "daily_engagement_summary" -> Gold.dailySummary(fact, dimDate),
        "top_performing_content" -> Gold.topContent(fact, dimContent, dimAcc, bronze),
        "account_influence" -> Gold.accountInfluence(fact, dimAcc),
        "hashtag_performance" -> Gold.hashtagPerformance(fact, dimContent),
        "hourly_patterns" -> Gold.hourlyPatterns(fact, dimDate),
        "sentiment_trends" -> Gold.sentimentTrends(fact, dimDate),
        "viral_content" -> Gold.viralContent(fact, dimContent, now))
      gold.map { case (name, df) =>
        overwriteParquet(df, s"$lake/gold/$name")
        name -> spark.read.parquet(s"$lake/gold/$name").count()
      }
    }

    // stage 6: report aggregates (no webhook)
    stage("Report") {
      RunResult(bronze.count(), fact.count(), goldCounts,
        Report.summary(fact), Report.negativeAlert(fact))
    }
  }
}
