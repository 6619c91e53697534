package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  final case class AttrState(clicks: List[(Long, Long)],
                             purchases: List[(Long, Long, Long)])
  final case class Attribution(user_id: Long, p_id: Long, p_ts: Timestamp,
                               cents: Long, n_touches: Long,
                               credit_base: Long, credit_last: Long)

  /** Streaming linear multi-touch attribution — the live analog of batch
    * q124: every click attributes to the user's FIRST later purchase
    * within `horizonMs`, and the purchase's integer-cent value splits
    * evenly across its touches (remainder to the last), conserving the
    * spend exactly.
    *
    * Correctness under out-of-order arrival comes from finalizing ONLY
    * behind the watermark: a purchase is attributed when the watermark
    * passes its event time — at that point every click that could precede
    * it has arrived (watermark contract), and every EARLIER purchase has
    * already claimed its clicks (purchases finalize in (ts, id) order, and
    * same-timestamp duplicates keep the max event_id, q124's dedup rule).
    * So the emitted rows equal the batch query over the same events no
    * matter how arrival interleaves (pinned in StreamsSpec).
    *
    * State per user is bounded by the horizon: unclaimed clicks die once
    * `c_ts + horizon` falls behind the watermark (no future purchase can
    * reach them — any purchase that could has already finalized), and
    * pending purchases finalize at the very next watermark advance past
    * their time; the event-time timeout re-fires the group on silence so
    * cleanup never waits for new traffic. Keyed by user, so state shards
    * across executors with the shuffle. */
  def attribute(events: Dataset[Event], horizonMs: Long = 7L * 86400L * 1000L,
                watermarkDelay: String = "10 minutes"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[AttrState]) =>
          var st = state.getOption.getOrElse(AttrState(Nil, Nil))
          rows.foreach { e =>
            val t = e.ts.getTime
            if (e.event_type == "click")
              st = st.copy(clicks = (t, e.event_id) :: st.clicks)
            else
              st = st.copy(purchases =
                (t, e.event_id, math.floor(e.value * 100).toLong) :: st.purchases)
          }
          val wm = state.getCurrentWatermarkMs()
          val (due, pending) = st.purchases.partition(_._1 <= wm)
          val finalized = due.groupBy(_._1)
            .map { case (_, dups) => dups.maxBy(_._2) } // max id per (user, ts)
            .toSeq.sortBy(p => (p._1, p._2))
          val out = Seq.newBuilder[Attribution]
          var clicks = st.clicks
          finalized.foreach { case (pts, pid, cents) =>
            val (mine, rest) =
              clicks.partition(c => c._1 <= pts && pts - c._1 <= horizonMs)
            clicks = rest // first purchase wins: claimed clicks leave the pool
            val k = mine.size.toLong
            if (k > 0)
              out += Attribution(uid, pid, new Timestamp(pts), cents, k,
                cents / k, cents - (k - 1) * (cents / k))
          }
          // a click is dead once every purchase that could claim it
          // (ts ≤ c_ts + horizon) is necessarily finalized
          clicks = clicks.filter(c => c._1 + horizonMs >= wm)
          if (clicks.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AttrState(clicks, pending))
            val deadline =
              (pending.map(_._1) ++ clicks.map(_._1 + horizonMs)).min
            state.setTimeoutTimestamp(math.max(deadline, wm + 1))
          }
          out.result().iterator
      }
  }

  final case class DebounceState(lastT: Long, pending: List[(Long, Long)])
  final case class Debounced(user_id: Long, event_type: String,
                             event_id: Long, ts: Timestamp)

  /** Streaming telemetry debounce — the live analog of batch q136: bursts
    * of the same (user, type) signal collapse to their FIRST event, where
    * a burst extends whenever the gap from the PREVIOUS event (kept or
    * not) stays within `windowMs`.
    *
    * Like [[attribute]], events finalize only once the watermark passes
    * their time, in (ts, id) order — so the kept set equals the batch
    * rule under any arrival interleaving. State is provably evictable:
    * once `wm − lastT > windowMs`, any future event (ts > wm) must start
    * a new burst, so a silent key's state drops at its next event-time
    * timeout — per-key state is one scalar plus the not-yet-final
    * buffer, which the watermark bounds. */
  def debounce(events: Dataset[Event], windowMs: Long = 5000L,
               watermarkDelay: String = "10 minutes"): Dataset[Debounced] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebounceState, Debounced](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, String), rows: Iterator[Event],
         state: GroupState[DebounceState]) =>
          var st = state.getOption.getOrElse(DebounceState(Long.MinValue, Nil))
          rows.foreach(e =>
            st = st.copy(pending = (e.ts.getTime, e.event_id) :: st.pending))
          val wm = state.getCurrentWatermarkMs()
          val (due, pending) = st.pending.partition(_._1 <= wm)
          val out = Seq.newBuilder[Debounced]
          var lastT = st.lastT
          due.sortBy(identity).foreach { case (t, id) =>
            if (lastT == Long.MinValue || t - lastT > windowMs)
              out += Debounced(key._1, key._2, id, new Timestamp(t))
            lastT = t // the burst chain extends on EVERY event (q136 rule)
          }
          val evictable = pending.isEmpty &&
            (lastT == Long.MinValue || wm - lastT > windowMs)
          if (evictable) state.remove()
          else {
            state.update(DebounceState(lastT, pending))
            val deadline =
              if (pending.nonEmpty) pending.map(_._1).min
              else lastT + windowMs
            state.setTimeoutTimestamp(math.max(deadline, wm + 1))
          }
          out.result().iterator
      }
  }

  final case class HourCount(event_type: String, hour_idx: Long, cnt: Long)
  final case class SpikeState(counts: Map[Long, Long], firstHour: Long,
                              maxHour: Long)
  final case class Spike(event_type: String, hour_idx: Long, cnt: Long,
                         s_win: Long, q_win: Long, num: Long, den2: Long)

  /** Streaming event-rate spike monitor — the live analog of batch q90:
    * consumes watermark-FINALIZED hourly counts (the [[windowedCounts]]
    * append output, hours as epoch-hour indices) and keeps, per
    * event_type, a trailing-24-hour baseline in a bounded ring of
    * (hour → count). A row spikes when 24·cnt − S > 0 and
    * (24·cnt − S)² > 9·(24·Q − S²) — the same integer cross-multiplied
    * >3σ verdict as the batch query, with UNOBSERVED hours counting as
    * real zeros (only observed hours can spike: cnt = 0 makes the excess
    * non-positive, so evaluating at observed hours loses nothing). After
    * any in-order prefix the emitted verdicts equal batch q90 over that
    * prefix (pinned in StreamsSpec). State per key is ≤ 25 map entries,
    * evicted as the hour high-water advances — bounded regardless of
    * stream length; no timeout is needed because verdicts emit on
    * arrival, not on silence. Input contract: per key, finalized hours
    * arrive in event-time order (append-mode window finalization follows
    * the watermark, which guarantees exactly that across micro-batches);
    * inside one micro-batch the group iterator is sorted here. */
  def spikeVerdicts(hourly: Dataset[HourCount]): Dataset[Spike] = {
    import hourly.sparkSession.implicits._
    hourly
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SpikeState, Spike](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[HourCount], state: GroupState[SpikeState]) =>
          var st = state.getOption.getOrElse(SpikeState(Map.empty, Long.MaxValue, Long.MinValue))
          val out = Seq.newBuilder[Spike]
          rows.toSeq.sortBy(_.hour_idx).foreach { r =>
            val h = r.hour_idx
            val first = math.min(st.firstHour, h)
            if (h - first >= 24) {
              val win = (h - 24) until h
              val s = win.map(st.counts.getOrElse(_, 0L)).sum
              val q = win.map(i => { val c = st.counts.getOrElse(i, 0L); c * c }).sum
              val num = r.cnt * 24 - s
              val den2 = 24 * q - s * s
              if (num > 0 && num * num > 9 * den2)
                out += Spike(etype, h, r.cnt, s, q, num, den2)
            }
            val maxH = math.max(st.maxHour, h)
            // keep exactly the hours any future in-order row can need:
            // the next hour's window starts at maxH + 1 - 24
            st = SpikeState(
              (st.counts + (h -> r.cnt)).filter(_._1 >= maxH - 23),
              first, maxH)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Stream–stream interval join — attribution: each `actions` row (e.g.
    * a purchase) matches `triggers` rows (e.g. clicks) by key within
    * `[action.ts − horizon, action.ts]`. Both sides carry watermarks and
    * the join condition time-bounds BOTH event times, so Spark derives
    * finite state-retention for each side (unbounded join state is the
    * stream–stream scale killer); matches shard on the key shuffle.
    * Inner join: unattributed actions are a separate anti-path. */
  def correlate(triggers: DataFrame, actions: DataFrame, key: String,
                horizon: String = "1 hour",
                watermarkDelay: String = "10 minutes"): DataFrame = {
    // Fail at the call site, not with an opaque parse error at plan time:
    // `horizon` is spliced into the join condition as INTERVAL syntax, so
    // reject anything Spark's own interval parser won't accept; and the
    // join internally aliases the key columns __k/__k2, so a caller key
    // with those names would silently collide with the aliases.
    require(key != "__k" && key != "__k2",
      s"correlate: key column '$key' collides with an internal join alias")
    require(
      org.apache.spark.sql.catalyst.util.IntervalUtils.safeStringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(horizon)) != null,
      s"correlate: horizon '$horizon' is not a valid interval " +
        "(expected e.g. '1 hour', '30 minutes')")
    val t = triggers.withWatermark("ts", watermarkDelay)
      .select(col(key).as("__k"), col("ts").as("trigger_ts"),
        col("event_id").as("trigger_id"))
    val a = actions.withWatermark("ts", watermarkDelay)
      .select(col(key).as("__k2"), col("ts").as("action_ts"),
        col("event_id").as("action_id"), col("value"))
    t.join(a, expr(
      s"""__k = __k2 AND
         |trigger_ts <= action_ts AND
         |trigger_ts >= action_ts - INTERVAL $horizon""".stripMargin))
      .select(col("__k").as(key), col("trigger_id"), col("action_id"),
        col("trigger_ts"), col("action_ts"), col("value"))
  }

  /** Stream–static enrichment: join the unbounded stream against a static
    * dimension (the bronze→dim lookup shape). The static side broadcasts
    * per micro-batch; no state is kept. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  final case class BandedDoc(doc_id: Long, ts: Timestamp, band: Int, bk: String)
  final case class BucketState(docIds: List[Long])
  final case class NearDupVerdict(doc_id: Long, band: Int, matched_doc: Long)

  /** Streaming near-duplicate pre-filter — the online analog of the
    * batch [[graft.operators.MinHashLsh]] candidate join. Each incoming
    * doc gets its k=4 minhash signature PER ROW (the codegen'd
    * `minhash_sig` expression needs no aggregation, which keeps this
    * query at a single stateful operator), is banded 2×2 exactly like
    * the batch operator, and probes per-(band, bucket) state: a doc
    * landing in a non-empty bucket is flagged against the bucket's
    * first-seen doc (the keeper).
    *
    * Scale/state bounds: bucket membership is capped at `maxBucket` ids
    * (a boilerplate mega-bucket stores K ids, not millions — later docs
    * still flag against the keeper but stop growing state), and idle
    * buckets are evicted by event-time timeout `bucketTtlMs` past their
    * last arrival once the watermark passes. Emission is ≤ 2 verdicts
    * per doc — linear, no pair blowup. */
  def nearDupFilter(docs: DataFrame, maxBucket: Int = 64,
                    watermarkDelay: String = "10 minutes",
                    bucketTtlMs: Long = 60 * 60 * 1000L): Dataset[NearDupVerdict] = {
    import docs.sparkSession.implicits._
    val sigCol = graft.functions.MinHashSig(col("text"))
    val banded = docs.withColumn("__sig", sigCol)
      .filter(col("__sig").isNotNull)
      .select(col("doc_id"), col("ts"), explode(array(
        struct(lit(1).as("band"),
          concat(element_at(col("__sig"), 1), element_at(col("__sig"), 2)).as("bk")),
        struct(lit(2).as("band"),
          concat(element_at(col("__sig"), 3), element_at(col("__sig"), 4)).as("bk"))))
        .as("b"))
      .select(col("doc_id"), col("ts"), col("b.band"), col("b.bk"))
      .withWatermark("ts", watermarkDelay)
      .as[BandedDoc]
    banded.groupByKey(d => (d.band, d.bk))
      .flatMapGroupsWithState[BucketState, NearDupVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic arrival order within the micro-batch
            val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            var members = state.getOption.map(_.docIds).getOrElse(Nil)
            val out = Seq.newBuilder[NearDupVerdict]
            var maxTs = Long.MinValue
            sorted.foreach { d =>
              maxTs = math.max(maxTs, d.ts.getTime)
              if (members.nonEmpty && !members.contains(d.doc_id))
                out += NearDupVerdict(d.doc_id, band, members.head)
              if (members.size < maxBucket && !members.contains(d.doc_id))
                members = members :+ d.doc_id
            }
            state.update(BucketState(members))
            state.setTimeoutTimestamp(maxTs + bucketTtlMs)
            out.result().iterator
          }
      }
  }

  /** Streaming decontamination filter — the online analog of the batch
    * eval-overlap scrub (q57): each arriving doc is flagged if any of its
    * distinct n-gram spans appears in the (static, tiny-by-construction)
    * held-out gram set. The gram set broadcasts — benchmarks are MBs
    * while the stream is unbounded — so the stream side never shuffles
    * for the probe; the only state is the `dropDuplicatesWithinWatermark`
    * on doc_id that collapses multi-gram hits to one verdict per doc,
    * bounded by the watermark horizon.
    *
    * `evalGrams` must be a static single-column (`g`) DataFrame. */
  def decontaminate(docs: DataFrame, evalGrams: DataFrame, n: Int = 8,
                    watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        explode(array_distinct(graft.functions.WordNgrams(col("text"), n))).as("g"))
      .join(org.apache.spark.sql.functions.broadcast(evalGrams), Seq("g"), "left_semi")
      .select("doc_id", "ts")
      .dropDuplicatesWithinWatermark("doc_id")

  final case class FunnelProbe(doc_id: Long, ts: Timestamp, kind: String,
                               key: String, sig: Seq[String])
  final case class FunnelMember(doc_id: Long, sig: Seq[String])
  final case class FunnelBucketState(members: List[FunnelMember],
                                     closed: Boolean)
  final case class FunnelEvidence(doc_id: Long, kind: String,
                                  matched_doc: Long)

  /** The COMPOSED streaming curation funnel — one stream through exact
    * dedup → near-dup → quality → decontamination, the online form of
    * the batch capstone q75/q107 (`TrainData.funnelStages`). Each
    * individual stage already had a pinned streaming twin; this is the
    * composition with per-stage drop ATTRIBUTION, emitting a verdict
    * LOG: evidence rows (`kind` = `exact_dup` / `near_dup`, with the
    * matched doc) from the stateful stages plus one `scored` row per
    * doc carrying the row-local quality/contamination flags.
    * [[funnelAttribution]] is the batch rollup over that log — stage =
    * FIRST firing, q75's rule — which is exactly the shape of the
    * production report job a pipeline runs over its streamed-out
    * verdict log.
    *
    * One stateful operator serves BOTH stateful stages: exact-hash
    * keeper state and LSH band-bucket state live in a single
    * flatMapGroupsWithState keyed by (kind, key) — chaining two
    * flatMapGroupsWithState operators in one query is unsupported, and
    * one keyed store is also one shuffle. Exact state is O(1) per
    * distinct text (the keeper id); bucket state stores (id, signature)
    * members so strong-match (≥ `strongMatch` of 4 signature components
    * agreeing — the batch `LshStrongMatch` rule) evaluates in-operator.
    *
    * Quality and contamination are ROW-LOCAL: the quality score is the
    * shared batch expression (`TrainData.qualityScore`), and the eval
    * gram set rides as ONE array cell in a 1-row broadcast (benchmarks
    * are MBs; the smallest-faithful-model rule) probed with
    * `arrays_overlap` — no explode, no dedup state.
    *
    * Divergences from the batch funnel — all inherent to online
    * processing, all spec-guarded on the pinned corpus:
    * (a) CLOSURE: the batch near-dup stage drops every non-root member
    * of a strong-pair CONNECTED COMPONENT — a doc whose only strong
    * neighbors arrive later is kept by the stream (it cannot see the
    * future) but dropped by the batch closure when a later neighbor
    * links it to an earlier root; (b) CAP: the batch bucket cap
    * retroactively drops ALL pairs of an oversized bucket, while the
    * stream closes a bucket only from the (maxBucket+1)-th arrival on;
    * (c) KEEPER ORDER: the stream's keeper (exact and near-dup) is
    * FIRST ARRIVAL while the batch keeper/component root is MIN doc_id
    * — under out-of-order arrival the stream can flag the very doc the
    * batch keeps and vice versa; (d) TTL: keeper/bucket state is
    * evicted `bucketTtlMs` past its last event-time sighting, so an
    * exact duplicate arriving later than that becomes a fresh keeper
    * where the unbounded batch join still flags it (the
    * dropDuplicatesWithinWatermark semantics every watermarked dedup
    * has). Feeding docs in doc_id order with live state collapses (c)
    * and (d), which is exactly what the spec pins: EXACT per-doc stage
    * equality with q75 on the gated corpus (where (a)/(b) don't fire
    * either). There is no in-general subset guarantee — attribution
    * under reordering is first-arrival semantics, the natural online
    * policy. */
  def curationFunnel(docs: DataFrame, evalGrams: DataFrame,
                     qualityMin: Long = 400L,
                     n: Int = graft.queries.TrainData.SpanN,
                     strongMatch: Int = 3, maxBucket: Int = 64,
                     watermarkDelay: String = "10 minutes",
                     bucketTtlMs: Long = 60 * 60 * 1000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // row-local leg: quality + contamination flags, one `scored` row/doc
    val evalRow = evalGrams.agg(collect_set(col("g")).as("__eval"))
      .select(pmod(hash(col("__eval")), lit(1)).as("__k"), col("__eval"))
      .localCheckpoint() // materialize the gram rollup once, not per batch
    // source + token mass ride the scored row so the verdict log is
    // self-sufficient for the q107-shaped (source, stage) report
    // ([[funnelSourceAttribution]]); a source-less stream still runs —
    // its report just lands under one NULL source.
    val srcCol = if (docs.columns.contains("source")) col("source")
                 else lit(null).cast("string")
    val scored = docs
      .withColumn("__k", pmod(hash(col("doc_id")), lit(1)))
      .join(broadcast(evalRow), Seq("__k"))
      .select(col("doc_id"), lit("scored").as("kind"),
        lit(null).cast("long").as("matched_doc"),
        coalesce(graft.queries.TrainData.qualityScore < qualityMin,
          lit(false)).as("lowq"),
        coalesce(arrays_overlap(
          array_distinct(graft.functions.WordNgrams(col("text"), n)),
          col("__eval")), lit(false)).as("contam"),
        srcCol.as("source"),
        // q107's token grain: whitespace split, NULL text stays NULL
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // stateful leg: one probe row per state cell a doc touches — its
    // exact-hash cell (NULL text shares one sentinel cell, the batch
    // rule) and, when it has a signature, its two band buckets
    val sigCol = graft.functions.MinHashSig(col("text"))
    val h = coalesce(sha2(col("text"), 256), lit("__null_text__"))
    val probes = docs
      .withColumn("__sig", sigCol)
      .select(col("doc_id"), col("ts"),
        coalesce(col("__sig"), typedLit(Seq.empty[String])).as("sig"),
        explode(array_compact(array(
          struct(lit("exact").as("kind"), h.as("key")),
          when(col("__sig").isNotNull,
            struct(lit("band").as("kind"),
              concat(lit("1:"), element_at(col("__sig"), 1),
                element_at(col("__sig"), 2)).as("key"))),
          when(col("__sig").isNotNull,
            struct(lit("band").as("kind"),
              concat(lit("2:"), element_at(col("__sig"), 3),
                element_at(col("__sig"), 4)).as("key")))))).as("p"))
      .select(col("doc_id"), col("ts"), col("p.kind"), col("p.key"), col("sig"))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelProbe]
    val evidence = probes.groupByKey(p => (p.kind, p.key))
      .flatMapGroupsWithState[FunnelBucketState, FunnelEvidence](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((kind, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic arrival order within the micro-batch
            val sorted = rows.toSeq.sortBy(p => (p.ts.getTime, p.doc_id))
            var st = state.getOption
              .getOrElse(FunnelBucketState(Nil, closed = false))
            val out = Seq.newBuilder[FunnelEvidence]
            var maxTs = Long.MinValue
            sorted.foreach { p =>
              maxTs = math.max(maxTs, p.ts.getTime)
              kind match {
                case "exact" =>
                  st.members match {
                    case keeper :: _ =>
                      if (keeper.doc_id != p.doc_id)
                        out += FunnelEvidence(p.doc_id, "exact_dup", keeper.doc_id)
                    case Nil =>
                      st = st.copy(members = List(FunnelMember(p.doc_id, Nil)))
                  }
                case "band" =>
                  if (!st.closed) {
                    st.members.find(m => m.doc_id != p.doc_id &&
                        m.sig.zip(p.sig).count { case (a, b) => a == b }
                          >= strongMatch)
                      .foreach(m =>
                        out += FunnelEvidence(p.doc_id, "near_dup", m.doc_id))
                    if (!st.members.exists(_.doc_id == p.doc_id)) {
                      if (st.members.size < maxBucket)
                        st = st.copy(members =
                          st.members :+ FunnelMember(p.doc_id, p.sig))
                      else
                        // boilerplate bucket: the batch cap's online
                        // form — stop flagging AND drop the stored
                        // members (state stays bounded)
                        st = FunnelBucketState(Nil, closed = true)
                    }
                  }
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(maxTs + bucketTtlMs)
            out.result().iterator
          }
      }
    scored.unionByName(evidence.toDF()
      .select(col("doc_id"), col("kind"), col("matched_doc"),
        lit(null).cast("boolean").as("lowq"),
        lit(null).cast("boolean").as("contam"),
        lit(null).cast("string").as("source"),
        lit(null).cast("long").as("n_tok")))
  }

  /** Batch rollup of a [[curationFunnel]] verdict log into q75's
    * first-firing stage attribution — the report job a pipeline runs
    * over the streamed-out log. One partial-aggregated groupBy. */
  def funnelAttribution(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("doc_id").agg(
      max(when(col("kind") === "exact_dup", 1).otherwise(0)).as("__ex"),
      max(when(col("kind") === "near_dup", 1).otherwise(0)).as("__nd"),
      max(when(col("kind") === "scored" && col("lowq"), 1).otherwise(0))
        .as("__lq"),
      max(when(col("kind") === "scored" && col("contam"), 1).otherwise(0))
        .as("__ct"))
    .select(col("doc_id"),
      when(col("__ex") === 1, "1_exact_dup")
        .when(col("__nd") === 1, "2_near_dup")
        .when(col("__lq") === 1, "3_low_quality")
        .when(col("__ct") === 1, "4_contaminated")
        .otherwise("5_kept").as("stage"))

  /** The (source, stage) rollup of a [[curationFunnel]] verdict log —
    * q107's sourcing report (doc AND token mass per cell) produced from
    * the streamed-out log alone: per-doc first-firing stage
    * ([[funnelAttribution]]) joined back to the doc's own `scored` row,
    * which carries source and token mass precisely so this report
    * needs no second look at the corpus. Two partial-aggregated
    * groupBys plus one equi-join on doc_id — the same shapes as the
    * batch q107 it is spec-pinned equal to on the gated corpus. */
  def funnelSourceAttribution(verdicts: DataFrame): DataFrame = {
    // both join branches descend from `verdicts` — re-key the scored
    // side so the self-join's attributes never collide
    val meta = verdicts.filter(col("kind") === "scored")
      .select(col("doc_id").as("__sid"), col("source"), col("n_tok"))
    val staged = funnelAttribution(verdicts)
    staged.join(meta, staged("doc_id") === meta("__sid"))
      .groupBy("source", "stage")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"))
  }

  /** A vocab at or under this size may ride the plan as a `typedLit`
    * map literal; above it the LM ships as BROADCAST DATA instead (see
    * [[surprisalFilter]]) — a plan tree is re-serialized per micro-batch
    * and fed through codegen, so an unbounded literal there is a
    * plan-size bomb long before executor memory becomes one. */
  private[graft] val SurprisalLiteralMaxVocab = 4096

  /** Streaming LM-surprisal quality filter — the online form of q156
    * (`TrainData2.surprisalScores` + bucket): the unigram LM is
    * BATCH-trained model state (vocab-sized, like IvfFlat's centroids)
    * handed in as a driver-side map, and each arriving doc scores
    * ROW-LOCALLY — per-token rarity lookup (OOV tokens take
    * `oovRarity`, the rarity floor-log2(T) of a count-1 word), integer
    * sum, centi-rarity bucket against the same constants the batch
    * query gates. STATELESS by construction: no shuffle, no watermark,
    * no state store — append mode at any rate.
    *
    * The LM reaches the scorer by a size census over the vocab (a
    * driver-side scalar — the map is already in hand): at or under
    * [[SurprisalLiteralMaxVocab]] entries it inlines as a `typedLit`
    * plan literal (zero join, pure codegen); above that it becomes a
    * ONE-ROW static DataFrame holding the map, broadcast-joined onto
    * the stream via the non-foldable `pmod(hash(·), 1)` key (the
    * codebase's 1-row BroadcastHashJoin idiom — never a cartesian), so
    * a production 100M-entry vocab ships once per executor as broadcast
    * DATA and the plan stays constant-size. `force` pins a path for
    * tests ("literal" | "broadcast"); StreamsSpec pins batch equality
    * through BOTH. Null-text rows are dropped here because the batch
    * kernel's explode drops them too. */
  def surprisalFilter(docs: DataFrame, lm: Map[String, Long], oovRarity: Long,
                      headMax: Long = graft.queries.TrainData2.SurprisalHeadMax,
                      midMax: Long = graft.queries.TrainData2.SurprisalMidMax,
                      force: Option[String] = None): DataFrame = {
    require(force.forall(Set("literal", "broadcast")),
      s"surprisal_filter: force must be literal|broadcast, got $force")
    val useLiteral = force.map(_ == "literal")
      .getOrElse(lm.size <= SurprisalLiteralMaxVocab)
    val base = docs
      .filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
    val withLm =
      if (useLiteral) base.withColumn("__lm", typedLit(lm))
      else {
        val spark = docs.sparkSession
        import spark.implicits._
        // the whole vocab as ONE map cell in a one-row static frame:
        // the join ships it as broadcast data, the plan carries only
        // the join node — __c (an agg output) keeps the key
        // non-foldable so Catalyst cannot constant-fold the equi-join
        // into a BroadcastNestedLoopJoin
        val lmRow = lm.toSeq.toDF("w", "r")
          .agg(map_from_entries(collect_list(struct(col("w"), col("r"))))
            .as("__lm"), count(lit(1)).as("__c"))
          .select(pmod(hash(col("__c")), lit(1)).as("__k"), col("__lm"))
          .localCheckpoint() // materialize the model rollup ONCE — the
          // stream-static join would otherwise re-aggregate the whole
          // vocab into the map on every micro-batch
        base.withColumn("__k", pmod(hash(col("doc_id")), lit(1)))
          .join(broadcast(lmRow), "__k")
      }
    val centi = expr("score * 100 div n_tok")
    withLm
      .withColumn("score", aggregate(
        transform(col("toks"),
          w => coalesce(element_at(col("__lm"), w), lit(oovRarity))),
        lit(0L), (acc, x) => acc + x))
      .withColumn("bucket",
        when(centi <= headMax, "head")
          .when(centi <= midMax, "middle")
          .otherwise("tail"))
      .select("doc_id", "ts", "n_tok", "score", "bucket")
  }

  /** Streaming ANN index INGESTION — the online form of q162's frozen-
    * model append: each arriving (vec_id, ts, embedding) row is
    * coarse-assigned ([[graft.operators.IvfFlat.assign]] — argmax
    * cosine over the trained centroids, ties → lowest id) and
    * PQ-encoded ([[graft.operators.PqAdc.encode]] — argmin-L2² per
    * subspace) under BATCH-trained model state, emitting the
    * (cluster, codes) cell the inverted index files the vector under.
    * ROW-LOCAL and STATELESS: both quantizers are fixed-size model
    * state (K×dim centroids + M×K×subDim codewords — the
    * IvfFlat-centroid contract, bounded by the model, never the
    * corpus, so the plan-literal transport is safe here), no shuffle,
    * no watermark, no state store — append mode at any rate. Batch
    * equality on shared vectors is pinned in StreamsSpec; the sink
    * side is a partitioned append on `cluster` (the index's natural
    * layout), which [[incrementalGoldSink]]'s dynamic-overwrite shape
    * already demonstrates. */
  def annEncodeFilter(vecs: DataFrame, centroids: Seq[Array[Float]],
                      codebooks: Seq[Seq[Array[Double]]], subDim: Int): DataFrame =
    graft.operators.PqAdc.encode(
        graft.operators.IvfFlat.assign(vecs, centroids), codebooks, subDim)
      .select("vec_id", "ts", "cluster", "codes")

  /** Streaming duplicated-span CUT-PLAN filter — the online form of
    * q159 (`TrainData2.spanRemovalPlan`): each arriving doc is scored
    * against a BATCH-trained set of duplicated-window digests (the hex
    * md5s of WinW-word windows the batch census saw ≥ 2×, handed in as
    * a one-column `h` DataFrame), and its removal plan — span count,
    * words removed, words kept — computes ROW-LOCALLY: window digests
    * are per-row array ops, the digest-set membership probe rides the
    * one-row map broadcast ([[surprisalFilter]]'s transport — the set
    * ships as broadcast DATA via the non-foldable `pmod(hash)` key,
    * never as a plan literal), and the batch kernel's run detection /
    * span threshold / interval merge replay as two `aggregate` folds
    * over the doc's own dup positions. STATELESS: no shuffle, no
    * watermark, no state store — append mode at any rate. Every
    * non-null-text doc emits a verdict (uncut docs report 0 spans —
    * a filter gives per-doc verdicts; the batch PLAN omits uncut docs
    * because it is an action list). Like every incremental-model path
    * here (q53/q83/bloom), duplicates NOVEL to the stream are invisible
    * until the next model refresh. Batch equality on shared docs is
    * pinned in StreamsSpec. */
  def cutPlanFilter(docs: DataFrame, dupDigests: DataFrame): DataFrame = {
    import graft.queries.TrainData2.{MinCutSpan, WinW}
    val minRun = MinCutSpan - WinW + 1
    // the duplicated-digest set as ONE map cell in a one-row static
    // frame — broadcast data, constant-size plan (see surprisalFilter)
    val setRow = dupDigests
      .agg(map_from_entries(collect_list(struct(col("h"), lit(true))))
        .as("__set"), count(lit(1)).as("__c"))
      .select(pmod(hash(col("__c")), lit(1)).as("__k"), col("__set"))
      .localCheckpoint() // materialize ONCE: re-running this per
      // micro-batch would replay whatever batch query produced the
      // digest set, plus the map rollup, at every trigger
    // ascending 1-based positions whose WinW-word window digest is in
    // the trained set (empty when the doc is shorter than one window)
    val posArr = when(size(col("toks")) < WinW, array().cast("array<int>"))
      .otherwise(filter(
        transform(sequence(lit(1), size(col("toks")) - (WinW - 1)),
          i => when(element_at(col("__set"),
            md5(concat_ws(" ", slice(col("toks"), i, lit(WinW))))).isNotNull, i)),
        x => x.isNotNull))
    // fold 1 — the batch kernel's RUN detection + span threshold: close
    // a run when the position chain breaks; a closed run of length
    // ≥ minRun becomes the word span [start, prev + WinW − 1]
    def closed(prev: Column, start: Column) =
      when(prev >= 0 && prev - start + 1 >= minRun,
        array(struct(start.as("s"), (prev + (WinW - 1)).as("e"))))
        .otherwise(array().cast("array<struct<s:int,e:int>>"))
    val spansCol = aggregate(
      col("__pos"),
      struct(lit(-999).as("prev"), lit(-999).as("start"),
        array().cast("array<struct<s:int,e:int>>").as("sp")),
      (acc, p) => {
        val (prev, start, sp) =
          (acc.getField("prev"), acc.getField("start"), acc.getField("sp"))
        when(p === prev + 1, struct(p.as("prev"), start.as("start"), sp.as("sp")))
          .otherwise(struct(p.as("prev"), p.as("start"),
            concat(sp, closed(prev, start)).as("sp")))
      },
      acc => concat(acc.getField("sp"),
        closed(acc.getField("prev"), acc.getField("start"))))
    // fold 2 — the batch kernel's interval MERGE over the (sorted)
    // spans: overlapping or adjacent word ranges collapse
    val mergedCol = aggregate(
      col("__spans"),
      struct(lit(-1).as("cs"), lit(-1).as("ce"),
        array().cast("array<struct<s:int,e:int>>").as("out")),
      (acc, sp) => {
        val (cs, ce, out) =
          (acc.getField("cs"), acc.getField("ce"), acc.getField("out"))
        val (s, e) = (sp.getField("s"), sp.getField("e"))
        when(cs < 0, struct(s.as("cs"), e.as("ce"), out.as("out")))
          .when(s <= ce + 1,
            struct(cs.as("cs"), greatest(ce, e).as("ce"), out.as("out")))
          .otherwise(struct(s.as("cs"), e.as("ce"),
            concat(out, array(struct(cs.as("s"), ce.as("e")))).as("out")))
      },
      acc => when(acc.getField("cs") >= 0,
        concat(acc.getField("out"),
          array(struct(acc.getField("cs").as("s"), acc.getField("ce").as("e")))))
        .otherwise(acc.getField("out")))
    docs
      .filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("__k", pmod(hash(col("doc_id")), lit(1)))
      .join(broadcast(setRow), "__k")
      .withColumn("__pos", posArr)
      .withColumn("__spans", spansCol)
      .withColumn("__merged", mergedCol)
      .withColumn("n_spans", size(col("__merged")).cast("long"))
      .withColumn("removed_words", coalesce(aggregate(col("__merged"), lit(0L),
        (a, sp) => a + sp.getField("e") - sp.getField("s") + 1), lit(0L)))
      .withColumn("kept_words", col("n_tok") - col("removed_words"))
      .select("doc_id", "ts", "n_tok", "n_spans", "removed_words", "kept_words")
  }

  /** Streaming BM25 relevance filter — the online form of q158
    * (`TrainData2.bm25PerDoc` + top-k): score each arriving doc against a
    * fixed query-term set with BATCH-trained model state (the per-term
    * document-frequency census `dfm` and corpus totals `t` tokens /
    * `n` docs — term-count-sized, like [[surprisalFilter]]'s LM), keep
    * docs that hit at least one term. ROW-LOCAL and STATELESS: per-term
    * tf comes from an array filter over the doc's own tokens, the
    * cleared-fraction integer score (`TrainData2.Bm25ScoreExpr` with
    * df/t/n inlined as literals — same truncating arithmetic) needs no
    * shuffle, no watermark, no state store — append mode at any rate.
    * Zero-tf terms contribute exactly 0, so the per-doc score equals the
    * batch kernel's hit-terms-only sum; null-text rows are dropped like
    * the batch explode drops them. Batch equality is pinned in
    * StreamsSpec. A top-k over the stream is a WINDOWED question
    * (top-k-per-what?) — compose with a watermarked window agg when
    * needed; the unbounded-stream global top-k is deliberately absent. */
  def bm25Filter(docs: DataFrame, dfm: Map[String, Long],
                 t: Long, n: Long): DataFrame = {
    // loud failure on degenerate model state: an empty census would
    // otherwise die as an AnalysisException on a malformed score
    // expression, and a zero df as a raw division error mid-stream
    require(dfm.nonEmpty, "bm25_filter: empty term census — no terms to score")
    require(n > 0 && t >= n,
      s"bm25_filter: degenerate corpus totals (t=$t docs-tokens, n=$n docs)")
    require(dfm.values.forall(df => df > 0 && df <= n),
      s"bm25_filter: every term df must be in [1, n=$n], got $dfm")
    // int64 headroom (same bound as the batch kernel's comment): the
    // score numerator is ≤ 63·22·tf·t·1000, safe while tf·t < 6.6e12.
    // The static half (t) is checked here; the data half (per-term
    // tf < 2048 — nothing stops a spam doc from repeating a query term
    // thousands of times) gets a PER-ROW raise_error below, so an
    // overflow fails loud mid-stream instead of silently wrapping.
    require(t < Long.MaxValue / (64L * 22L * 1000L * 2048L),
      s"bm25_filter: t=$t exceeds the int64 score headroom assumed for " +
        "per-term tf < 2048 — promote the score expression to decimal(38,0)")
    val terms = dfm.keys.toSeq.sorted
    val withTf = terms.zipWithIndex.foldLeft(
      docs.filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("dl", size(col("toks")).cast("long"))) {
      case (d, (w, i)) =>
        d.withColumn(s"tf_$i",
          size(filter(col("toks"), x => x === lit(w))).cast("long"))
    }
    val score = terms.zipWithIndex.map { case (w, i) =>
      // integer log-idf: floor(log2(n·100/df)), the driver-side mirror
      // of the batch kernel's length(bin()) − 1 floor-log2 idiom
      val idf = 63 - java.lang.Long.numberOfLeadingZeros(n * 100L / dfm(w))
      s"($idf * 22 * tf_$i * $t * 1000 div (10 * $t * tf_$i + 3 * $t + 9 * dl * $n))"
    }.mkString(" + ")
    val nTerms = terms.indices.map(i =>
      s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val nHits = terms.indices.map(i => s"tf_$i").mkString(" + ")
    val tfOverflow = terms.indices.map(i => s"tf_$i >= 2048").mkString(" OR ")
    val guarded = s"CASE WHEN $tfOverflow THEN CAST(raise_error(" +
      "'bm25_filter: per-term tf >= 2048 exceeds the int64 score headroom" +
      s" - promote the score expression to decimal(38,0)') AS BIGINT) " +
      s"ELSE $score END"
    withTf
      .withColumn("score_fp", expr(guarded).cast("long"))
      .withColumn("n_terms_hit", expr(nTerms).cast("long"))
      .withColumn("n_hits", expr(nHits).cast("long"))
      .filter(col("n_hits") > 0)
      .select("doc_id", "ts", "dl", "score_fp", "n_terms_hit", "n_hits")
  }

  /** Streaming BPE tokenize filter — the online form of q163
    * (`TrainData2.bpeDocTokens`): count each arriving doc's tokens
    * under BATCH-trained merges (q82's merge records, handed in as one
    * (L, R) pair list per round). The model state here is the MERGE
    * LIST itself — bytes, not the vocabulary: each word's characters
    * fold through the trained rounds row-locally (the batch
    * `bpeApply` shape — scan the round-input array left to right,
    * emit the merged symbol where (s[i], s[i+1]) is a selected pair,
    * skip i+1), so a word the training corpus NEVER SAW tokenizes
    * exactly as the frozen model prescribes — no OOV fallback, no
    * vocab lookup to go stale. In-vocab words reproduce the batch
    * counts by construction (the batch vocab path is the same fold
    * memoized at word grain; pinned in StreamsSpec, including an
    * unseen word's replay). ROW-LOCAL and STATELESS: no shuffle, no
    * watermark, no state store — append mode at any rate. Empty
    * tokens (impossible under the single-space corpus contract) count
    * 0 symbols. */
  def bpeTokenizeFilter(docs: DataFrame,
                        merges: Seq[Seq[(String, String)]]): DataFrame =
    // the per-word fold is the SHARED kernel (one trained round over a
    // symbol array — the literal-pair twin of the batch fold), now in
    // TrainData2.bpeTokLenCol so the stream gate and the
    // persisted-model serve (q173) cannot drift
    docs.filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("ws_tok", size(col("toks")).cast("long"))
      .withColumn("bpe_tok", aggregate(
        transform(col("toks"),
          w => graft.queries.TrainData2.bpeTokLenCol(w, merges)),
        lit(0L), (a, x) => a + x))
      .withColumn("fertility_pm", expr("bpe_tok * 1000 div ws_tok"))
      .select("doc_id", "ts", "ws_tok", "bpe_tok", "fertility_pm")

  /** Streaming unigram-LM tokenize filter — the online form of q165
    * (`TrainData3.uniSegCol` at doc grain): count each arriving doc's
    * pieces under the BATCH-trained unigram model. The model state is
    * the trained (piece → cost) map plus the OOV single-char cost —
    * vocab-sized by the training caps (alphabet + UniMultiCap entries),
    * so a plan literal is the right transport (the bounded-by-model
    * rule; contrast surprisalFilter's census-selected broadcast for
    * vocab-SIZED state). Each word runs the SAME row-local Viterbi fold
    * the batch side ships — an unseen word (even with unseen CHARS)
    * segments exactly as the frozen model prescribes, because the OOV
    * cost is part of the model, not a fallback heuristic. ROW-LOCAL and
    * STATELESS: no shuffle, no watermark, no state store — append mode
    * at any rate. Batch equality and the OOV replay are pinned in
    * StreamsSpec. */
  def uniTokenizeFilter(docs: DataFrame, vocab: Map[String, Long],
                        oovCost: Long): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("ws_tok", size(col("toks")).cast("long"))
      .withColumn("uni_tok", aggregate(
        transform(col("toks"), w =>
          size(graft.queries.TrainData3.uniSegCol(w, vocab, oovCost))
            .cast("long")),
        lit(0L), (a, x) => a + x))
      .withColumn("fertility_pm", expr("uni_tok * 1000 div ws_tok"))
      .select("doc_id", "ts", "ws_tok", "uni_tok", "fertility_pm")

  /** Streaming trained-classifier QUALITY GATE — the online form of
    * q167's scoring half (`TrainData3.nbDocMargins`): each arriving doc
    * is scored against the BATCH-trained hashed-bigram Naive-Bayes
    * model (`TrainData3.nbModel` — the per-bucket margin deltas
    * `w_present − w_absent` plus the model-constant bias), emitting the
    * integer margin and the keep/drop verdict the curation gate routes
    * on. ROW-LOCAL and STATELESS: the scoring column IS the batch
    * scorer's (`TrainData3.nbMarginCol` — the codegen'd
    * [[graft.functions.HashBucketSet]] bucket-set kernel + one fold
    * adding the present buckets' deltas to the bias); one kernel, two
    * deployment shapes, so stream and batch cannot drift. Model
    * transport is a plan literal: exactly NbBuckets longs + one
    * scalar — bounded by the model like [[annEncodeFilter]]'s
    * centroids, far under the [[SurprisalLiteralMaxVocab]] line, so no
    * join node is ever needed. Null-text rows are dropped (the batch
    * relation scores them to a NULL keep label; a stream gate routes,
    * so it drops); a no-bigram doc scores margin = bias (the empty
    * bucket set). Batch equality pinned per-doc in StreamsSpec. */
  def nbScoreFilter(docs: DataFrame, weights: IndexedSeq[Long],
                    bias: Long): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("margin",
        graft.queries.TrainData3.nbMarginCol(col("text"), weights, bias))
      .withColumn("pred_keep", col("margin") >= 0)
      .select("doc_id", "ts", "margin", "pred_keep")

  /** Streaming DSIR importance gate — the online form of q169's scoring
    * half (`TrainData3.dsirSelect`): each arriving doc's importance
    * logit is computed under the BATCH-trained model
    * (`TrainData3.dsModel` — DsBuckets per-bucket deltas + the
    * Laplace-normalizer shift) by the batch selector's own column
    * (`TrainData3.dsLogitCol` — one kernel, two deployment shapes), and
    * routed against a THRESHOLD. The threshold replaces the batch
    * query's global top-⌈n/4⌉ rank because a stream has no corpus to
    * rank against — this is exactly the 100 TB deployment SCALE.md
    * prescribes for the batch side too. The threshold's ONE producer
    * is `TrainData3.dsirCut` — the batch selector's own scoring
    * column and two-step orderCut refinement, so stream and batch
    * constants share a source of truth by construction (StreamsSpec
    * pins the streamed set against both forced batch plans); dsirCut
    * also reports whether a pure `>= T` gate is EXACT (the at-T tie
    * group lands whole) or admits that one tie group's remainder.
    * ROW-LOCAL and STATELESS; model transport is a plan literal
    * (DsBuckets longs + two scalars). Null-text rows are dropped;
    * a no-bigram doc scores logit 0 (the empty occurrence list).
    * Batch equality pinned per-doc in StreamsSpec. */
  def dsirScoreFilter(docs: DataFrame, weights: IndexedSeq[Long],
                      shift: Long, threshold: Long): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("logit",
        graft.queries.TrainData3.dsLogitCol(col("text"), weights, shift))
      .withColumn("sel", col("logit") >= threshold)
      .select("doc_id", "ts", "logit", "sel")

  /** Streaming DSIR census maintenance — the TRAIN side of the
    * importance-resampling lifecycle ([[dsirScoreFilter]] is the serve
    * side): each arriving doc's bigram-bucket occurrences accumulate
    * into the DsBuckets-cell (b, target-count, raw-count) census, and
    * the running aggregation state IS the trainer's input — it is
    * LITERALLY `TrainData3.dsCensus` applied to the stream, because
    * census merge is counter addition ([[cmsCells]]' algebra: per-batch
    * increments commute with stored counters, so after any prefix the
    * state equals the batch census of the rows seen so far, pinned in
    * StreamsSpec). Refreshing the model is then a 64-row read +
    * [[graft.queries.TrainData3 dsModel]]'s driver-side log math — no
    * corpus re-scan, which is what makes periodic model refresh cheap
    * at ingest rates. State bounded at DsBuckets rows by construction;
    * no watermark (a monotone running census). Run with Update/Complete
    * output mode. */
  def dsCensusCells(docs: DataFrame): DataFrame =
    graft.queries.TrainData3.dsCensus(docs)

  /** Streaming NB census maintenance — the TRAIN side of the trained-
    * quality-classifier lifecycle ([[nbScoreFilter]] is the serve side;
    * [[dsCensusCells]] is the DSIR twin, same algebra): each arriving
    * doc's distinct present buckets increment the per-bucket
    * (df_keep, df_drop) document frequencies, and the class census
    * rides along as cell b = −1 — the running aggregation state is
    * LITERALLY `TrainData3.nbCensus` applied to the stream, because
    * every cell is a counter and census merge is counter addition.
    * After any prefix the state equals the batch census of the rows
    * seen so far (pinned in StreamsSpec), so refreshing the served
    * model is a ≤65-row read + `TrainData3.nbModelFromCensus`'s
    * driver-side log math — no corpus re-scan, the same cheap-refresh
    * story DSIR got. NULL-text rows count nowhere (batch parity).
    * State bounded at NbBuckets + 1 rows by construction; no watermark
    * (a monotone running census). Run with Update/Complete output
    * mode. */
  def nbCensusCells(docs: DataFrame): DataFrame =
    graft.queries.TrainData3.nbCensus(docs)

  /** Streaming count-min sketch maintenance — the online form of the
    * batch heavy-hitter sketch (q81, `operators/CountMin`): each arriving
    * doc's tokens hash into the depth×256 counter matrix via the same
    * md5-nibble rows, and the running aggregation state IS the sketch.
    * CMS merge is counter addition, so each micro-batch's increments
    * commute with the stored counters — the same algebra that makes the
    * batch sketch shard-mergeable makes it stream-updatable, and after
    * any prefix of the stream the state equals the batch sketch of the
    * rows seen so far (pinned in StreamsSpec). No watermark: the sketch
    * is a monotone running total, not a windowed result, and its state
    * is bounded at ≤ depth×256 rows by construction — the rare stateful
    * aggregation that needs no eviction to stay finite. Run with
    * Update/Complete output mode. */
  def cmsCells(docs: DataFrame, depth: Int = 4): DataFrame =
    graft.operators.CountMin.cells(
      docs.select(explode(split(col("text"), " ")).as("w")), depth)

  /** Streaming histogram-quantile maintenance — the online form of the
    * batch mergeable quantile sketch (q79/q83): each arriving doc's
    * length lands in its equi-width bin (`n_chars div 16`, capped at
    * 255) and the running (bin, cnt) aggregation state IS the
    * histogram. Like [[cmsCells]], merge = addition, so micro-batch
    * increments commute with stored counters, state equals the batch
    * histogram of every prefix (StreamsSpec), and the state is bounded
    * at ≤ 256 rows with no watermark needed — quantile read-out
    * (q79's `histQuantiles`) runs downstream on the tiny materialized
    * state, never on the stream. Completes the streaming sketch
    * family: distinct (HLL, batch q71), frequency ([[cmsCells]]),
    * quantiles (this). Run with Update/Complete output mode. */
  def histCells(docs: DataFrame, binWidth: Int = 16, maxBin: Int = 255): DataFrame =
    docs.select(least(expr(s"n_chars div $binWidth"), lit(maxBin.toLong)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Streaming near-dup CLUSTER-LABEL maintenance — the batch q99
    * incremental merge run per micro-batch: each batch carries candidate
    * PAIRS (doc_a, doc_b) from an upstream near-dup filter
    * ([[nearDupFilter]] / MinHashLsh.candidatesAcross), and the sink
    * merges them into a persistent (node, comp) label table by running
    * connected components over the stored labels AS star edges plus the
    * batch pairs — the prior batches' raw pair sets are never re-read,
    * only the node-sized label state. After every micro-batch the table
    * equals the batch clustering of ALL pairs seen so far (pinned in
    * StreamsSpec), which is exactly q99's merge == full-recompute
    * contract made continuous.
    *
    * IDEMPOTENCE: replaying a committed micro-batch unions pairs whose
    * connectivity the labels already encode — components are unchanged,
    * the state rewrites verbatim (the [[scd2Sink]] restart contract;
    * min-label components are a pure function of accumulated
    * connectivity, with no wall-clock or batch-id dependence).
    *
    * Scale: per batch, CC input = |batch pairs| + |stored labels|;
    * labels are node-sized (only docs in some duplicate cluster) and the
    * stored side is already a star forest, so the contraction converges
    * in ~one round (or routes straight to the bounded local finish). A
    * label table too large to rewrite per batch wants the
    * partition-splice shape of [[incrementalGoldSink]] keyed on
    * pmod(hash(node)). */
  def clusterLabelSink(pairs: DataFrame, labelPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = b.sparkSession
        val fresh = b.toDF().select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"))
        val stored =
          if (new org.apache.hadoop.fs.Path(labelPath).getFileSystem(
              spark.sparkContext.hadoopConfiguration)
              .exists(new org.apache.hadoop.fs.Path(labelPath)))
            spark.read.parquet(labelPath)
              .select(col("node").as("doc_a"), col("comp").as("doc_b"))
          else fresh.limit(0)
        val labels = graft.operators.ConnectedComponents(
          fresh.unionByName(stored), "doc_a", "doc_b")
        graft.engine.Pipeline.overwriteParquet(labels, labelPath)
        ()
      }
      .start()

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

  /** Streaming SCD2 dimension maintenance — the silver layer's last
    * batch-only piece made continuous: each micro-batch of (key, attrs,
    * version-timestamp) rows is collapsed to its latest version per key
    * and applied onto the dimension's parquet state with the SAME
    * [[graft.engine.Silver.scd2Apply]] the batch path uses (expire
    * changed keys, insert new current versions), so the two paths cannot
    * diverge semantically. Intermediate versions WITHIN one micro-batch
    * collapse to the latest — the reference's batch loader does the same
    * to a crawl batch (silver_etl.py:145-181).
    *
    * IDEMPOTENCE PIN — the effective-from timestamp is derived from the
    * BATCH (max of `effectiveCol`), never from wall-clock: scd2Apply
    * stamps `valid_from` on inserts and `valid_to` on expirations with
    * it, so a wall-clock stamp would make a replayed micro-batch (the
    * standard restart window: offsets logged, commit marker torn) write
    * a DIFFERENT state than the original run — same-attrs rows wouldn't
    * re-expire (change detection sees no diff), but a key that changed
    * twice across the tear would version at a drifted boundary. With the
    * batch-derived stamp, re-applying a committed batch detects zero
    * changes against the already-applied state and rewrites it verbatim
    * — convergence proven on disk by StreamRestartSpec.
    *
    * Scale: the per-batch rewrite is DIM-sized (key cardinality), not
    * corpus-sized — the SCD2 join is batch-vs-current on the key, both
    * sides one row per key, broadcastable when the batch is small. The
    * swap-rewrite keeps a `__old` backup until the new snapshot lands
    * ([[graft.engine.Pipeline.overwriteParquet]]); a dimension too large
    * to rewrite per batch wants the partition-splice shape of
    * [[incrementalGoldSink]] keyed on a stable hash of the key. */
  def scd2Sink(batches: DataFrame, dimPath: String, checkpoint: String,
               key: String, attrs: Seq[String],
               effectiveCol: String = "ingestion_timestamp")
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // empty micro-batch = no-op (see incrementalGoldSink: an empty
        // write would poison later reads and replay forever)
        if (!b.isEmpty) {
          val spark = b.sparkSession
          // materialize once: the batch feeds the effective-stamp probe,
          // the dedup and the apply
          val batch = b.toDF().localCheckpoint()
          val effType = batch.schema(effectiveCol).dataType
          val eff = lit(batch.agg(max(col(effectiveCol))).head.get(0)).cast(effType)
          val latest = graft.engine.Silver.dedupLatest(
            batch, Seq(key), Seq(col(effectiveCol).desc))
            .select((key +: attrs).map(col): _*)
          val current = graft.engine.Pipeline.readRecoverable(spark, dimPath)
            .getOrElse(latest.limit(0)
              .withColumn("valid_from", lit(null).cast(effType))
              .withColumn("valid_to", lit(null).cast(effType))
              .withColumn("is_current", lit(true)))
          val next = graft.engine.Silver.scd2Apply(current, latest, key, attrs, eff)
          // localCheckpoint materializes the new state BEFORE the swap
          // rewrites the very files it was read from
          graft.engine.Pipeline.overwriteParquet(next.localCheckpoint(), dimPath)
        }
        ()
      }
      .start()

  /** Continuous gold maintenance — the streaming analog of the batch
    * partition-splice MV refresh (`Gold.dailySummaryIncremental`, q50):
    * each micro-batch of fact rows
    *
    *   1. upserts ONLY the touched `date_key` partitions of the
    *      date-partitioned fact layer (dynamic partition overwrite;
    *      keep-latest per `idCol` within the partition), and
    *   2. splice-refreshes the daily-summary MV for exactly those dates
    *      (broadcast anti-join on the touched keys + recompute from the
    *      pruned fact scan).
    *
    * At 100 TB a micro-batch touches a handful of dates out of
    * thousands: the full fact is never rescanned, untouched MV rows are
    * never recomputed, and the per-batch work is proportional to the
    * touched partitions. Restart safety is the foreachBatch idempotence
    * contract (as [[upsertSink]]): replaying a committed batch re-derives
    * the same partition contents and the same MV rows. `dimDate` is the
    * static date dimension the MV joins.
    *
    * PRECONDITIONS (each fails loudly or is documented, never silent):
    *   - `date_key` must be immutable per `idCol` — true here because it
    *     derives from the toot's `created_at` (event time, fixed across
    *     re-crawls). A row whose partition key CHANGED between versions
    *     would leave its stale copy in the old partition, since the
    *     upsert deliberately never rescans untouched partitions;
    *     partition keys that can mutate need a batch compaction pass.
    *   - `orderCol` must be a version column strictly increasing across
    *     re-crawls of the same id — ingestion time, like the batch
    *     upsert ([[graft.engine.Pipeline.upsertBronze]]). Event time
    *     would TIE on every re-crawl and pick an arbitrary winner.
    *   - `dimDate` is the pre-populated calendar dimension (standard
    *     warehouse practice: decades of rows); a batch touching a date
    *     it doesn't cover throws rather than silently dropping the date
    *     from the MV (the daily summary inner-joins the date dim).
    *
    * Durability: directory swaps keep a `__old` backup until the new
    * snapshot is in place and reads recover it after a crash
    * ([[graft.engine.Pipeline.readRecoverable]]). The dynamic partition
    * overwrite of the fact itself has the usual vanilla-parquet
    * commit window (no transaction log); on a production lake this
    * exact merge maps 1:1 onto a table format's atomic
    * `MERGE INTO` / `REPLACE WHERE`. */
  def incrementalGoldSink(factDeltas: DataFrame, dimDate: DataFrame,
                          lake: String, checkpoint: String,
                          idCol: String = "toot_id",
                          orderCol: String = "ingestion_timestamp")
      : org.apache.spark.sql.streaming.StreamingQuery =
    factDeltas.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = b.sparkSession
        val factPath = s"$lake/silver/fact"
        val mvPath = s"$lake/gold/daily_engagement_summary"
        // An empty micro-batch must be a no-op: writing it on a fresh
        // lake would create a data-less fact dir that poisons every
        // later read ("unable to infer schema") — and the batch would
        // never commit, replaying the failure forever.
        if (!b.isEmpty) {
          // materialize once: `batch` feeds the touched-key probe, the
          // merge and the MV delta — re-evaluating a file-backed source
          // would rescan its input per action
          val batch = b.toDF().localCheckpoint()
          val touched = batch.select("date_key").distinct()
          val uncovered = touched
            .join(dimDate.select("date_key"), Seq("date_key"), "left_anti").count()
          require(uncovered == 0,
            s"incrementalGoldSink: $uncovered touched date_key(s) missing from " +
              "dimDate — extend the calendar dimension (silently dropping " +
              "dates from the MV is worse than failing the batch)")
          // merge batch into the touched partitions only; localCheckpoint
          // materializes the merge BEFORE the dynamic overwrite rewrites
          // the very partitions it was read from
          val existingTouched =
            graft.engine.Pipeline.readRecoverable(spark, factPath)
              .map(_.join(broadcast(touched), Seq("date_key"), "left_semi"))
              .getOrElse(batch.limit(0))
          val merged = graft.engine.Silver.dedupLatest(
            existingTouched.unionByName(batch), Seq(idCol),
            Seq(col(orderCol).desc)).localCheckpoint()
          merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date_key").parquet(factPath)
          // splice-refresh the MV for the touched dates — the same helper
          // the batch path uses (q50), so the semantics cannot diverge
          val factNow = spark.read.parquet(factPath)
          val existingMv = graft.engine.Pipeline.readRecoverable(spark, mvPath)
            .getOrElse(graft.engine.Gold.dailySummary(factNow.limit(0), dimDate))
          graft.engine.Pipeline.overwriteParquet(
            graft.engine.Gold.dailySummaryIncremental(existingMv, factNow,
              batch, dimDate).localCheckpoint(),
            mvPath)
        }
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
