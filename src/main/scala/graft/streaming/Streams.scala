package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10 — the reference is
  * batch-only with cross-run incrementality; these are the streaming
  * analogs its daily/hourly rollups and crawl sessions map onto).
  *
  * All transforms take/return unbounded DataFrames: callers wire
  * `spark.readStream...` sources and `writeStream` sinks. Watermarks bound
  * state at scale; the stateful sessionizer keys by user so state shards
  * across executors with the shuffle.
  */
object Streams {

  /** Tumbling-window event rollup with late-data handling — the streaming
    * analog of the hourly posting-pattern rollup (gold MV #5). State is
    * dropped `watermarkDelay` past the window end. */
  def windowedCounts(events: DataFrame,
                     watermarkDelay: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Timestamp, lastTs: Timestamp,
                                nEvents: Long, totalValue: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives within `gapMs` of the last one. Event-time
    * timeouts keyed to the watermark make emission deterministic (a
    * processing-time timeout would re-trigger on wall-clock); state is one
    * small struct per open session, sharded by the group-key shuffle. The
    * reference's crawl-run pagination loop is the batch analog of one
    * session. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.lastTs, s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.lastTs.getTime <= gapMs =>
                  cur = Some(s.copy(lastTs = e.ts, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed += Session(userId, s.start, s.lastTs, s.nEvents, s.totalValue)
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes lastTs + gap
              state.setTimeoutTimestamp(s.lastTs.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Incremental append with key-dedup — the streaming analog of the
    * reference's cross-run `id` upsert: keep first arrival per event id
    * within the watermark horizon. `dropDuplicatesWithinWatermark` (not
    * plain `dropDuplicates("event_id")`) so per-id state is actually
    * EVICTED once the watermark passes — a bare key-only dedup never ages
    * state out and grows without bound on a real stream. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream–static enrichment: join the unbounded stream against a static
    * dimension (the bronze→dim lookup shape). The static side broadcasts
    * per micro-batch; no state is kept. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming upsert into a parquet layer via foreachBatch — the
    * streaming analog of the reference's cross-run ON CONFLICT bronze
    * load (bronze_loader.py:143-188), reusing the batch merge
    * ([[graft.engine.Pipeline.upsertBronze]]: union → keep latest per id
    * → swap-rewrite). Restart safety comes from idempotence rather than
    * the file-sink commit log: replaying a committed micro-batch after a
    * crash re-merges the same rows and converges to the same layer state
    * — the standard foreachBatch exactly-once contract. Rows need `id`
    * and `ingestion_timestamp` columns. */
  def upsertSink(batches: DataFrame, lake: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.engine.Pipeline.upsertBronze(batch.sparkSession, batch.toDF(), lake)
        ()
      }
      .start()

  /** Durable parquet sink with exactly-once restart semantics — the
    * streaming analog of the reference's bronze bulk append. The
    * checkpoint persists source offsets plus the file-sink commit log
    * (`_spark_metadata`), so a restarted query resumes AFTER the last
    * committed micro-batch: no re-emission, no gaps, across process
    * restarts. Partition by a low-cardinality time-derived column at
    * scale (same guidance as the batch fact table). */
  def toParquet(df: DataFrame, path: String, checkpoint: String,
                partitionCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).start()
  }
}
