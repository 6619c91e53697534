package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates tumbling windows and drops late data past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.windowedCounts(in.toDF(), watermarkDelay = "10 minutes",
        windowLen = "1 hour")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.00),
        Event(2, ts("2024-01-01 10:45:00"), 2, "click", 2.00),
        Event(3, ts("2024-01-01 11:05:00"), 1, "view", 3.00))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      in.addData(Event(4, ts("2024-01-01 13:00:00"), 1, "click", 4.00))
      q.processAllAvailable()
      // this event is far behind the watermark -> dropped
      in.addData(Event(5, ts("2024-01-01 10:10:00"), 3, "click", 99.00))
      q.processAllAvailable()
      in.addData(Event(6, ts("2024-01-01 15:00:00"), 1, "click", 0.50))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.00)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L, 3.00)))
      // the late row for 10:00 must NOT appear as an extra window emission
      assert(!rows.exists { case (w, t, _, v) => w == "2024-01-01 10:00:00.0" && v == 99.00 })
    } finally q.stop()
  }

  test("dedupStream keeps first arrival per event_id") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:02:00"), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(1, ts("2024-01-01 10:03:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("correlate matches actions to in-horizon triggers per key, stream-stream") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = Streams.correlate(clicks.toDF(), buys.toDF(), key = "user_id",
        horizon = "1 hour")
      .writeStream.format("memory").queryName("corr").outputMode("append").start()
    try {
      clicks.addData(
        Event(10, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Event(11, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
        Event(12, ts("2024-01-01 08:00:00"), 2, "click", 0.0)) // stale for buy at 10:40
      buys.addData(
        Event(20, ts("2024-01-01 10:40:00"), 1, "buy", 9.99),
        Event(21, ts("2024-01-01 10:40:00"), 2, "buy", 5.00))
      q.processAllAvailable()
      // advance both watermarks so results flush
      clicks.addData(Event(13, ts("2024-01-01 13:00:00"), 9, "click", 0.0))
      buys.addData(Event(22, ts("2024-01-01 13:00:00"), 9, "buy", 0.0))
      q.processAllAvailable()
      val rows = spark.table("corr")
        .select("trigger_id", "action_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // user 1's buy attributes to BOTH in-horizon clicks; user 2's click
      // is outside the 1h horizon → no match
      assert(rows.contains((10L, 20L)) && rows.contains((11L, 20L)), rows)
      assert(!rows.exists(_._2 == 21L), s"stale trigger matched: $rows")
    } finally q.stop()
  }

  test("attribute: streaming credits equal batch q124 semantics, out of order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // 1-hour horizon to keep the fixture compact; 0s delay so the
    // watermark tracks max event time exactly
    val q = Streams.attribute(in.toDS(), horizonMs = 3600L * 1000L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      // batch 1, deliberately out of event-time order within the batch
      in.addData(
        Event(5, ts("2024-01-01 10:20:00"), 1, "purchase", 1.01), // 101 cents
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
        Event(3, ts("2024-01-01 10:10:00"), 1, "view", 0.0), // ignored type
        Event(7, ts("2024-01-01 09:00:00"), 2, "click", 0.0), // dies unclaimed
        Event(8, ts("2024-01-01 10:20:00"), 3, "purchase", 5.00)) // zero-touch
      q.processAllAvailable()
      // batch 2: a later click pairs with a later purchase; duplicate
      // purchase timestamps keep the max event_id (q124's dedup rule);
      // the far tick finalizes everything
      in.addData(
        Event(9, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
        Event(11, ts("2024-01-01 10:45:00"), 1, "purchase", 0.50),
        Event(10, ts("2024-01-01 10:45:00"), 1, "purchase", 0.99))
      q.processAllAvailable()
      in.addData(Event(99, ts("2024-01-02 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("attr").as[Streams.Attribution].collect()
        .map(a => (a.user_id, a.p_id, a.cents, a.n_touches,
          a.credit_base, a.credit_last)).toSet
      // purchase 5 claims clicks 1+2 (first-purchase-wins): 101 = 50+51;
      // purchase 11 (max id at 10:45) claims click 9: 50 cents whole;
      // user 2's click never meets a purchase, user 3's purchase has no
      // touches — neither emits
      assert(rows == Set(
        (1L, 5L, 101L, 2L, 50L, 51L),
        (1L, 11L, 50L, 1L, 50L, 50L)), rows)
      // conservation: Σ credits == cents on every row
      spark.table("attr").as[Streams.Attribution].collect().foreach(a =>
        assert(a.credit_base * (a.n_touches - 1) + a.credit_last == a.cents))
    } finally q.stop()
  }

  test("debounce keeps exactly the batch burst-leaders, out of order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.debounce(in.toDS(), windowMs = 5000L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("deb").outputMode("append").start()
    try {
      // burst for (user 1, click): 10:00:00, :03, :06 (each within 5 s of
      // the PREVIOUS — one burst, only the first kept) — fed out of order
      in.addData(
        Event(2, ts("2024-01-01 10:00:03"), 1, "click", 0.0),
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Event(3, ts("2024-01-01 10:00:06"), 1, "click", 0.0),
        Event(4, ts("2024-01-01 10:00:20"), 1, "click", 0.0), // new burst
        Event(5, ts("2024-01-01 10:00:04"), 1, "view", 0.0))  // other key
      q.processAllAvailable()
      // watermark pass finalizes everything; key silence evicts state
      in.addData(Event(99, ts("2024-01-01 11:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val kept = spark.table("deb").as[Streams.Debounced].collect()
        .map(d => (d.user_id, d.event_type, d.event_id)).toSet
      assert(kept == Set((1L, "click", 1L), (1L, "click", 4L),
        (1L, "view", 5L)), kept)
    } finally q.stop()
  }

  test("correlate rejects malformed horizons and colliding key names at the call site") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val badHorizon = intercept[IllegalArgumentException](
      Streams.correlate(clicks.toDF(), buys.toDF(), key = "user_id",
        horizon = "1 fortnight"))
    assert(badHorizon.getMessage.contains("horizon"), badHorizon.getMessage)
    val badKey = intercept[IllegalArgumentException](
      Streams.correlate(clicks.toDF(), buys.toDF(), key = "__k"))
    assert(badKey.getMessage.contains("internal join alias"), badKey.getMessage)
  }

  test("enrich joins the stream to a static broadcast dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = Streams.enrich(in.toDF(), dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enr").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("gold")), (2L, None)))
    } finally q.stop()
  }

  test("toParquet file sink recovers from the checkpoint without re-emitting") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (out, cp) = (s"$base/out", s"$base/cp")
    val in = MemoryStream[Event]
    def stream = in.toDF().select(col("event_id"), col("event_type"), col("value"))

    val q1 = Streams.toParquet(stream, out, cp)
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 10:02:00"), 2, "click", 3.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() == 3)

    // simulate a crash/restart: a NEW query over the same checkpoint must
    // resume after batch 0 — the 3 committed rows are not emitted again.
    in.addData(
      Event(4, ts("2024-01-01 10:03:00"), 2, "view", 4.0),
      Event(5, ts("2024-01-01 10:04:00"), 3, "click", 5.0))
    val q2 = Streams.toParquet(stream, out, cp)
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // exactly-once: no dups, no gaps
  }

  test("upsertSink merges each micro-batch keeping the latest row per id") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val in = MemoryStream[(String, Timestamp, Double)]
    val q = Streams.upsertSink(
      in.toDF().toDF("id", "ingestion_timestamp", "v"), base, s"$base/cp")
    try {
      in.addData(("a", ts("2024-01-01 10:00:00"), 1.0), ("b", ts("2024-01-01 10:00:00"), 2.0))
      q.processAllAvailable()
      // re-crawl batch: newer version of a, plus a new id
      in.addData(("a", ts("2024-01-01 11:00:00"), 9.0), ("c", ts("2024-01-01 11:00:00"), 3.0))
      q.processAllAvailable()
      val layer = spark.read.parquet(s"$base/bronze")
        .select("id", "v").as[(String, Double)].collect().toSet
      assert(layer == Set(("a", 9.0), ("b", 2.0), ("c", 3.0)))
    } finally q.stop()
  }

  test("decontaminate flags stream docs overlapping the static eval gram set") {
    implicit val sqlCtx = spark.sqlContext
    val evalText = "one two three four five six seven eight nine ten"
    val evalGrams = Seq(evalText).toDF("text")
      .select(explode(graft.functions.WordNgrams(col("text"), 8)).as("g"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.decontaminate(in.toDF().toDF("doc_id", "ts", "text"), evalGrams)
      .writeStream.format("memory").queryName("decon").outputMode("append").start()
    try {
      in.addData(
        // shares the 8-gram span "two three … nine" → contaminated
        (1L, ts("2024-01-01 10:00:00"), s"prefix $evalText suffix"),
        // same words, shuffled order → no 8-gram overlap
        (2L, ts("2024-01-01 10:01:00"), "ten one three two five four seven six nine eight"),
        (3L, ts("2024-01-01 10:02:00"), "completely unrelated content here with many words present"))
      q.processAllAvailable()
      val flagged = spark.table("decon").collect().map(_.getLong(0)).toSeq
      assert(flagged.sorted == Seq(1L), s"got ${flagged.toSeq}")
      assert(flagged.distinct.length == flagged.length,
        "multi-gram hits must collapse to one verdict per doc")
    } finally q.stop()
  }

  test("surprisalFilter matches batch q156 scoring through BOTH scorer paths; OOV takes the default") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the cat"),
      (3L, "rare words appear once only"),
      (4L, "the the the the the the"))
    // batch-train the unigram LM exactly as the shipping kernel derives
    // it: rarity = floor(log2(T div count))
    val allToks = corpus.flatMap(_._2.split(" ", -1))
    val t = allToks.length.toLong
    val lm = allToks.groupBy(identity).map { case (w, ws) =>
      w -> (63L - java.lang.Long.numberOfLeadingZeros(t / ws.length))
    }
    val oov = 63L - java.lang.Long.numberOfLeadingZeros(t)
    // batch reference: the SHIPPING kernel over the same corpus
    val batch = graft.queries.TrainData2.surprisalScores(
        corpus.toDF("doc_id", "text").withColumn("source", lit("s")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("score"))).toMap
    // the vocab census would pick "literal" for this tiny LM — force
    // EACH path and pin batch equality through both (the broadcast
    // path is the 100M-vocab plan; nothing but the LM transport
    // differs, so the outputs must be bit-identical)
    for (path <- Seq("literal", "broadcast")) {
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = Streams.surprisalFilter(
          in.toDF().toDF("doc_id", "ts", "text"), lm, oov,
          force = Some(path))
        .writeStream.format("memory").queryName(s"surp_$path")
        .outputMode("append").start()
      try {
        in.addData(corpus.zipWithIndex.map { case ((id, text), i) =>
          (id, ts(s"2024-01-01 10:0$i:00"), text)
        }: _*)
        q.processAllAvailable()
        val got = spark.table(s"surp_$path").collect()
          .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
        corpus.foreach { case (id, _) =>
          val (bTok, bScore) = batch(id)
          assert(got(id)._1 == bTok && got(id)._2 == bScore,
            s"[$path] doc $id: stream ${got(id)} vs batch ($bTok, $bScore)")
          val centi = bScore * 100 / bTok
          val bucket =
            if (centi <= graft.queries.TrainData2.SurprisalHeadMax) "head"
            else if (centi <= graft.queries.TrainData2.SurprisalMidMax) "middle"
            else "tail"
          assert(got(id)._3 == bucket, s"[$path] doc $id bucket")
        }
        // an unseen token scores at the OOV default; a null-text row is
        // dropped (the batch kernel's explode drops it too)
        in.addData((9L, ts("2024-01-01 10:09:00"), "the zzzunseen"),
          (10L, ts("2024-01-01 10:10:00"), null))
        q.processAllAvailable()
        val tail = spark.table(s"surp_$path").collect()
        val r9 = tail.find(_.getLong(0) == 9L).get
        assert(r9.getLong(3) == lm("the") + oov, s"[$path] OOV rarity not applied")
        assert(!tail.exists(_.getLong(0) == 10L),
          s"[$path] null-text row must be dropped")
      } finally q.stop()
    }
    // the census itself: a small vocab picks the literal plan (no join
    // node), a vocab over the cap picks the broadcast join — observable
    // as the one-row LM relation in the analyzed plan
    val small = Streams.surprisalFilter(
      spark.readStream.format("rate").load()
        .select(col("value").as("doc_id"), col("timestamp").as("ts"),
          lit("x").as("text")), lm, oov)
    assert(!small.queryExecution.analyzed.toString.contains("__k"),
      "small vocab must inline, not join")
    val big = (1 to Streams.SurprisalLiteralMaxVocab + 1)
      .map(i => s"w$i" -> 1L).toMap
    val bigQ = Streams.surprisalFilter(
      spark.readStream.format("rate").load()
        .select(col("value").as("doc_id"), col("timestamp").as("ts"),
          lit("x").as("text")), big, oov)
    assert(bigQ.queryExecution.analyzed.toString.contains("__k"),
      "over-cap vocab must take the broadcast join path")
  }

  test("annEncodeFilter matches batch assign+encode on shared vectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = 8; val subDim = 4
    // a tiny trained model: 2 centroids, 2 subspaces × 2 codewords
    val cents = Seq(
      Array.fill(dim)(1.0f),
      Array.tabulate(dim)(i => if (i < dim / 2) 1.0f else -1.0f))
    val cbs = Seq(
      Seq(Array(1.0, 1.0, 1.0, 1.0), Array(-1.0, -1.0, -1.0, -1.0)),
      Seq(Array(1.0, 1.0, 1.0, 1.0), Array(-1.0, -1.0, -1.0, -1.0)))
    val rows = Seq(
      (1L, Array.fill(dim)(0.9f)),
      (2L, Array.tabulate(dim)(i => if (i < dim / 2) 0.8f else -0.8f)),
      (3L, Array.fill(dim)(-0.5f)))
    // batch reference: the SHIPPING kernels over the same vectors
    val batch = graft.operators.PqAdc.encode(
        graft.operators.IvfFlat.assign(
          rows.toDF("vec_id", "embedding"), cents), cbs, subDim)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getSeq[Int](r.fieldIndex("codes")))).toMap
    val in = MemoryStream[(Long, Timestamp, Array[Float])]
    val q = Streams.annEncodeFilter(
        in.toDF().toDF("vec_id", "ts", "embedding"), cents, cbs, subDim)
      .writeStream.format("memory").queryName("annenc")
      .outputMode("append").start()
    try {
      in.addData(rows.zipWithIndex.map { case ((id, v), i) =>
        (id, ts(s"2024-01-01 10:0$i:00"), v)
      }: _*)
      q.processAllAvailable()
      val got = spark.table("annenc").collect().map(r =>
        r.getLong(0) -> (r.getInt(2), r.getSeq[Int](3))).toMap
      assert(got.keySet == batch.keySet)
      batch.foreach { case (id, b) =>
        assert(got(id) == b, s"vec $id: stream ${got(id)} vs batch $b")
      }
      // sanity: the fixture actually splits across clusters and codes
      assert(got.values.map(_._1).toSet.size == 2, "fixture must use both clusters")
      assert(got.values.map(_._2).toSet.size >= 2, "fixture must use both codewords")
    } finally q.stop()
  }

  test("cutPlanFilter matches batch spanRemovalPlan on shared docs; uncut docs report zeros") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def words(p: String, n: Int): Seq[String] = (1 to n).map(i => s"$p$i")
    val t = words("t", 60)
    val corpus = Seq(
      // the q159 fixture: T overlaps H1 on words 1..20 and H2 on
      // 15..50 → one MERGED 50-word cut; H1/H2 fully covered
      (1L, t.mkString(" ")),
      (2L, t.slice(0, 20).mkString(" ")),
      (3L, t.slice(14, 50).mkString(" ")),
      (4L, words("z", 40).mkString(" ")), // unique: zero-span verdict
      (5L, words("q", 5).mkString(" ")))  // shorter than one window
    // batch-train the model state exactly as the census defines it:
    // hex md5s of 10-word windows occurring ≥ 2 times corpus-wide
    def wins(text: String): Seq[String] =
      text.split(" ", -1).sliding(10).filter(_.length == 10)
        .map(_.mkString(" ")).toSeq
    val dupDigests = corpus.flatMap(d => wins(d._2))
      .groupBy(identity).filter(_._2.length >= 2).keys.map { w =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.toSeq
    // batch reference: the SHIPPING kernel over the same corpus
    val batch = graft.queries.TrainData2.spanRemovalPlan(
        corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.cutPlanFilter(
        in.toDF().toDF("doc_id", "ts", "text"), dupDigests.toDF("h"))
      .writeStream.format("memory").queryName("cutplan")
      .outputMode("append").start()
    try {
      in.addData(corpus.zipWithIndex.map { case ((id, text), i) =>
        (id, ts(s"2024-01-01 10:0$i:00"), text)
      } :+ ((9L, ts("2024-01-01 10:09:00"), null.asInstanceOf[String])): _*)
      q.processAllAvailable()
      val got = spark.table("cutplan").collect().map(r =>
        r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      // cut docs carry exactly the batch plan (incl. the interval merge)
      batch.foreach { case (id, b) =>
        assert(got(id) == b, s"doc $id: stream ${got(id)} vs batch $b")
      }
      // uncut and sub-window docs emit zero-span verdicts (the batch
      // PLAN omits them; the streaming FILTER verdicts every doc)
      assert(got(4L) == ((0L, 0L, 40L)) && got(5L) == ((0L, 0L, 5L)),
        s"uncut verdicts: ${got(4L)} ${got(5L)}")
      assert(!got.contains(9L), "null-text row must be dropped")
    } finally q.stop()
  }

  test("bm25Filter matches batch bm25PerDoc on shared docs; no-hit and null docs drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, "dup dup customer join scan"),
      (2L, "customer spark spark spark row row row row"),
      (3L, "join scan hash row filter sort"),
      (4L, "dup spark customer dup"))
    val terms = Seq("dup", "customer", "spark")
    // batch-train the model state exactly as the kernel derives it
    val t = corpus.map(_._2.split(" ", -1).length.toLong).sum
    val n = corpus.length.toLong
    val dfm = terms.map(w =>
      w -> corpus.count(_._2.split(" ", -1).contains(w)).toLong).toMap
    // batch reference: the SHIPPING kernel over the same corpus
    val batch = graft.queries.TrainData2.bm25PerDoc(
        corpus.toDF("doc_id", "text"), terms)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dl"), r.getAs[Long]("score_fp"),
          r.getAs[Long]("n_terms_hit"), r.getAs[Long]("n_hits"))).toMap
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.bm25Filter(
        in.toDF().toDF("doc_id", "ts", "text"), dfm, t, n)
      .writeStream.format("memory").queryName("bm25").outputMode("append").start()
    try {
      in.addData(corpus.zipWithIndex.map { case ((id, text), i) =>
        (id, ts(s"2024-01-01 10:0$i:00"), text)
      } :+ ((9L, ts("2024-01-01 10:09:00"), null.asInstanceOf[String])): _*)
      q.processAllAvailable()
      val got = spark.table("bm25").collect().map(r =>
        r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      // doc 3 has zero query-term hits: dropped in BOTH engines; doc 9 is null text
      assert(got.keySet == batch.keySet && !got.contains(3L) && !got.contains(9L))
      batch.foreach { case (id, b) =>
        assert(got(id) == b, s"doc $id: stream ${got(id)} vs batch $b")
      }
      // non-degenerate: the planted-rare term outscores the frequent ones
      assert(got(4L)._2 > got(2L)._2, "rare-term doc must outscore spam doc")
    } finally q.stop()
  }

  test("nbScoreFilter matches batch nbDocMargins per doc under the frozen model") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the TrainData3Spec planted corpus: 10 long a-vocab docs (keep
    // label) + 10 short b-vocab docs (drop) — margins separate by sign
    val keepText = (0 until 40).map(i => s"a$i").mkString(" ")
    val dropText = (0 until 10).map(i => s"b$i").mkString(" ")
    val corpus = (0L until 10L).map(i => i -> keepText) ++
      (10L until 20L).map(i => i -> dropText)
    val docsDf = corpus.toDF("doc_id", "text")
    // batch-train with the SHIPPING kernel; batch-score with the
    // SHIPPING per-doc relation
    val (weights, bias) = graft.queries.TrainData3.nbModel(docsDf)
    val batch = graft.queries.TrainData3.nbDocMargins(docsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.nbScoreFilter(
        in.toDF().toDF("doc_id", "ts", "text"), weights, bias)
      .writeStream.format("memory").queryName("nbscore")
      .outputMode("append").start()
    try {
      in.addData(corpus.zipWithIndex.map { case ((id, text), i) =>
        (id, ts(f"2024-01-01 10:${i % 60}%02d:00"), text)
      }: _*)
      // plus: a no-bigram doc (margin = bias exactly, batch's
      // coalesce(mp, 0) shape) and a null-text row (dropped)
      in.addData((90L, ts("2024-01-01 11:00:00"), "solo"),
        (91L, ts("2024-01-01 11:01:00"), null.asInstanceOf[String]))
      q.processAllAvailable()
      val got = spark.table("nbscore").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
      batch.foreach { case (id, m) =>
        assert(got(id) == ((m, m >= 0)),
          s"doc $id: stream ${got(id)} vs batch margin $m")
      }
      assert(got(90L) == ((bias, bias >= 0)), s"no-bigram doc: ${got(90L)}")
      assert(!got.contains(91L), "null-text row must be dropped")
      // the planted signal survives the stream: keep docs positive,
      // drop docs negative
      (0L until 10L).foreach(id => assert(got(id)._2, s"doc $id not kept"))
      (10L until 20L).foreach(id => assert(!got(id)._2, s"doc $id not dropped"))
    } finally q.stop()
  }

  test("dsirScoreFilter matches batch dsirSelect logits; the threshold routes like the batch rank") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the TrainData3Spec planted DSIR corpus: 4 en + 4 de docs over the
    // t-vocabulary, 8 fr docs over the disjoint u-vocabulary — batch
    // selects the top-4 = exactly 4 of the t-docs
    val tText = (0 until 30).map(i => s"t${i % 7}").mkString(" ")
    val uText = (0 until 30).map(i => s"u${i % 7}").mkString(" ")
    val corpus = (0L until 4L).map(i => (i, "en", tText)) ++
      (4L until 8L).map(i => (i, "de", tText)) ++
      (8L until 16L).map(i => (i, "fr", uText))
    val docsDf = corpus.toDF("doc_id", "lang", "text")
    val (weights, shift) = graft.queries.TrainData3.dsModel(docsDf)
    val batch = graft.queries.TrainData3.dsirSelect(docsDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // the online gate routes on a threshold, not a rank, and the
    // threshold's one producer is dsirCut — the batch selector's own
    // scoring + refinement, shared by construction. On this corpus
    // all 8 t-docs tie at the cut with budget 4, so dsirCut reports
    // exact=false and the >= T gate admits the WHOLE tie group —
    // sel ⊇ batch sel, nothing below T.
    val (tLogit, exact) = graft.queries.TrainData3.dsirCut(docsDf)
    assert(!exact, "the planted 8-way tie with budget 4 cannot be exact")
    val uLogit = batch(8L)._1
    assert(tLogit > uLogit, s"planted separation missing: $tLogit vs $uLogit")
    assert(tLogit == batch(0L)._1, "dsirCut must return the boundary t-logit")
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.dsirScoreFilter(
        in.toDF().toDF("doc_id", "ts", "text"), weights, shift,
        threshold = tLogit)
      .writeStream.format("memory").queryName("dsirscore")
      .outputMode("append").start()
    try {
      in.addData(corpus.zipWithIndex.map { case ((id, _, text), i) =>
        (id, ts(f"2024-01-01 10:${i % 60}%02d:00"), text)
      }: _*)
      in.addData((90L, ts("2024-01-01 11:00:00"), "solo"),
        (91L, ts("2024-01-01 11:01:00"), null.asInstanceOf[String]))
      q.processAllAvailable()
      val got = spark.table("dsirscore").collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
      batch.foreach { case (id, (logit, _)) =>
        assert(got(id)._1 == logit,
          s"doc $id: stream logit ${got(id)._1} vs batch $logit")
      }
      // every t-doc passes the gate, every u-doc is rejected
      (0L until 8L).foreach(id => assert(got(id)._2, s"t-doc $id rejected"))
      (8L until 16L).foreach(id => assert(!got(id)._2, s"u-doc $id passed"))
      assert(got(90L)._1 == 0L, s"no-bigram doc logit: ${got(90L)._1}")
      assert(!got.contains(91L), "null-text row must be dropped")
    } finally q.stop()
  }

  test("dsirScoreFilter under dsirCut covers the gated corpus' batch selection — both forced plans") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // stream and batch share ONE model (dsModelDir) and ONE threshold
    // producer (dsirCut — the batch selector's own scoring +
    // refinement), so on the gated corpus the streamed >= T set must
    // cover the batch set under BOTH forced batch plans and admit
    // nothing below T; exact cuts reproduce the set exactly, inexact
    // cuts over-admit only the boundary tie group.
    val dir = "/root/testdata/sf0.001"
    val docsDf = graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val model = graft.queries.TrainData3.dsModelDir(spark, dir)
    val (t, exact) = graft.queries.TrainData3.dsirCut(docsDf, Some(model))
    def batchSel(force: String) = graft.queries.TrainData3
      .dsirSelect(docsDf, Some(force), model = Some(model))
      .filter(col("sel")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rankSel = batchSel("rank")
    assert(rankSel == batchSel("threshold"),
      "forced batch plans must agree before the stream pin means anything")
    val rows = docsDf.collect().map(r => (r.getLong(0),
      ts("2024-01-01 10:00:00"), if (r.isNullAt(2)) null else r.getString(2)))
    // the stream gate ROUTES, so it drops null-text rows (batch scores
    // them 0) — the pin compares on the non-null-text population
    val nonNullIds = rows.filter(_._3 != null).map(_._1).toSet
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.dsirScoreFilter(
        in.toDF().toDF("doc_id", "ts", "text"), model._1, model._2,
        threshold = t)
      .writeStream.format("memory").queryName("dsirgate")
      .outputMode("append").start()
    try {
      in.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("dsirgate").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      val sel = streamed.filter(_._3).map(_._1).toSet
      val batchNN = rankSel & nonNullIds
      assert((batchNN -- sel).isEmpty,
        s"stream dropped batch-selected docs: ${batchNN -- sel}")
      streamed.foreach { case (id, logit, s) =>
        assert(s == (logit >= t), s"doc $id: sel=$s at logit $logit, T=$t") }
      if (exact) assert(sel == batchNN,
        s"exact cut must reproduce the batch set: ${sel.diff(batchNN)}")
      else {
        val byId = streamed.map(r => r._1 -> r._2).toMap
        (sel -- batchNN).foreach(id => assert(byId(id) == t,
          s"over-admitted doc $id at logit ${byId(id)} != boundary $t"))
      }
    } finally q.stop()
  }

  test("bpeTokenizeFilter matches batch bpeDocTokens on shared docs; unseen words replay the frozen merges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((1L, "abab abab c"), (2L, "abab ab"))
    // batch-train the model state with the SHIPPING rounds: (a,b) then
    // (ab,ab); the third round finds no adjacent pair and emits nothing
    val syms0 = graft.queries.TrainData2.bpeCharSyms(
      corpus.toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f")))
    val (merges, _) = (1 to 3).foldLeft(
        (Seq.empty[Seq[(String, String)]], syms0)) { case ((acc, s), k) =>
      val (s2, rec) = graft.queries.TrainData2.bpeRound(s, k)
      val pairs = rec.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      (if (pairs.nonEmpty) acc :+ pairs else acc, s2)
    }
    assert(merges == Seq(Seq(("a", "b")), Seq(("ab", "ab"))), merges)
    // batch reference: the SHIPPING doc-grain kernel over the same corpus
    val batch = graft.queries.TrainData2.bpeDocTokens(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.bpeTokenizeFilter(
        in.toDF().toDF("doc_id", "ts", "text"), merges)
      .writeStream.format("memory").queryName("bpetok")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 10:00:00"), corpus(0)._2),
        (2L, ts("2024-01-01 10:01:00"), corpus(1)._2),
        // OOV: neither word was in the training corpus — "ababab" must
        // replay the frozen merges on its own chars (round 1 takes the
        // odd-parity (a,b) matches -> [ab,ab,ab]; round 2's (ab,ab)
        // run merges greedily -> [abab, ab] = 2 tokens), "zz" stays 2
        (7L, ts("2024-01-01 10:02:00"), "ababab zz"),
        (9L, ts("2024-01-01 10:03:00"), null.asInstanceOf[String]))
      q.processAllAvailable()
      val got = spark.table("bpetok").collect().map(r =>
        r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      batch.foreach { case (id, (ws, bpe)) =>
        assert(got(id) == ((ws, bpe, bpe * 1000 / ws)),
          s"doc $id: stream ${got(id)} vs batch ($ws, $bpe)")
      }
      assert(got(7L) == ((2L, 4L, 2000L)), s"OOV replay: ${got(7L)}")
      assert(!got.contains(9L), "null-text row must be dropped")
    } finally q.stop()
  }

  test("uniTokenizeFilter matches the batch unigram segmentation; unseen chars pay the model's OOV cost") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // train the frozen model on the planted corpus of TrainData3Spec
    // ("aaaa"×10, "b"×1 → vocab {aaaa:128, b:2560}, oov 3584 — all
    // hand-derived there); the stream must reproduce the batch
    // segmentation and handle a never-seen char via the OOV cost
    val (vocab, oov) = graft.queries.TrainData3.uniModelFromWords(
      Seq(("aaaa", 10L), ("b", 1L)).toDF("w", "f"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.uniTokenizeFilter(
        in.toDF().toDF("doc_id", "ts", "text"), vocab, oov)
      .writeStream.format("memory").queryName("unitok")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 10:00:00"), "aaaa b aaaa"), // 3 ws → 3 pieces
        // "aaaab": [aaaa, b] (128+2560 beats any char split); "zz" is
        // all-OOV → 2 single-char pieces at cost 3584 each
        (2L, ts("2024-01-01 10:01:00"), "aaaab zz"),
        (9L, ts("2024-01-01 10:02:00"), null.asInstanceOf[String]))
      q.processAllAvailable()
      val got = spark.table("unitok").collect().map(r =>
        r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got(1L) == ((3L, 3L, 1000L)), s"doc 1: ${got(1L)}")
      assert(got(2L) == ((2L, 4L, 2000L)), s"doc 2: ${got(2L)}")
      assert(!got.contains(9L), "null-text row must be dropped")
    } finally q.stop()
  }

  test("nearDupFilter flags docs sharing a band bucket against the keeper") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.nearDupFilter(in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("ndf").outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "the quick brown fox jumps"))
      q.processAllAvailable()
      in.addData(
        (2L, ts("2024-01-01 10:01:00"), "the quick brown fox jumps"), // exact dup
        (3L, ts("2024-01-01 10:02:00"), "completely different words entirely"),
        (4L, ts("2024-01-01 10:03:00"), "solo")) // 1 token: no signature
      q.processAllAvailable()
      val verdicts = spark.table("ndf").as[Streams.NearDupVerdict].collect()
        .map(v => (v.doc_id, v.band, v.matched_doc)).toSet
      // doc 2 collides with doc 1 in BOTH bands; docs 3 and 4 are clean
      assert(verdicts == Set((2L, 1, 1L), (2L, 2, 1L)))
    } finally q.stop()
  }

  test("incrementalGoldSink: fact partition upsert + MV splice == full recompute") {
    implicit val sqlCtx = spark.sqlContext
    val lake = java.nio.file.Files.createTempDirectory("graft-gold-stream").toString
    val dimDate = Seq(
      (20240101, "2024-01-01", 2024, 1, "Monday", false),
      (20240102, "2024-01-02", 2024, 1, "Tuesday", false))
      .toDF("date_key", "full_date_s", "year", "month", "day_name", "is_weekend")
      .withColumn("full_date", col("full_date_s").cast("date")).drop("full_date_s")
    val in = MemoryStream[(String, Int, Long, Timestamp, Timestamp, Long, Long, Long, Long, String, String)]
    val q = Streams.incrementalGoldSink(
      in.toDF().toDF("toot_id", "date_key", "account_key", "created_at",
        "ingestion_timestamp", "replies_count", "reblogs_count",
        "favourites_count", "total_engagement", "sentiment_label", "language"),
      dimDate, lake, s"$lake/cp")
    def mvOnDisk = spark.read.parquet(s"$lake/gold/daily_engagement_summary")
    def factOnDisk = spark.read.parquet(s"$lake/silver/fact")
    def fullRecompute = graft.engine.Gold.dailySummary(factOnDisk, dimDate)
    try {
      in.addData(
        ("t1", 20240101, 10L, ts("2024-01-01 01:00:00"), ts("2024-01-02 00:00:00"), 1L, 1L, 1L, 3L, "Positive", "en"),
        ("t2", 20240101, 11L, ts("2024-01-01 02:00:00"), ts("2024-01-02 00:00:00"), 0L, 2L, 2L, 4L, "Negative", "en"),
        ("t3", 20240102, 10L, ts("2024-01-02 01:00:00"), ts("2024-01-02 00:00:00"), 5L, 0L, 0L, 5L, "Positive", "fr"))
      q.processAllAvailable()
      assert(factOnDisk.count() == 3)
      assert(mvOnDisk.collect().toSet == fullRecompute.collect().toSet)
      val day2Before = mvOnDisk.filter(col("date_key") === 20240102).collect().toSeq

      // re-crawl t1: SAME created_at (event time is immutable), newer
      // ingestion_timestamp decides the winner; plus new t4, day 1 only
      in.addData(
        ("t1", 20240101, 10L, ts("2024-01-01 01:00:00"), ts("2024-01-03 00:00:00"), 9L, 9L, 9L, 27L, "Positive", "en"),
        ("t4", 20240101, 12L, ts("2024-01-01 03:00:00"), ts("2024-01-03 00:00:00"), 1L, 0L, 0L, 1L, "Neutral", "en"))
      q.processAllAvailable()
      // t1 upserted (not duplicated), t4 appended, day-2 partition untouched
      assert(factOnDisk.count() == 4)
      assert(factOnDisk.filter(col("toot_id") === "t1")
        .collect()(0).getAs[Long]("total_engagement") == 27L)
      assert(mvOnDisk.collect().toSet == fullRecompute.collect().toSet)
      assert(mvOnDisk.filter(col("date_key") === 20240102).collect().toSeq == day2Before)
    } finally q.stop()
  }

  test("file-source near-dup pipeline survives kill-and-restart on disk") {
    // End-to-end on real files (MemoryStream above proves logic; this
    // proves the DISK contract): parquet file source → nearDupFilter →
    // checkpointed parquet sink, killed mid-stream and restarted over the
    // same checkpoint. The restart must (a) not re-emit committed batches
    // — file-sink commit log — and (b) restore the bucket STATE STORE, so
    // a post-restart duplicate still flags against the pre-restart keeper.
    val base = java.nio.file.Files.createTempDirectory("graft-file-stream").toString
    val (inDir, out, cp) = (s"$base/in", s"$base/out", s"$base/cp")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, ts TIMESTAMP, text STRING")
    def addFile(rows: (Long, Timestamp, String)*): Unit =
      rows.toSeq.toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(inDir)
    def start() = Streams.toParquet(
      Streams.nearDupFilter(spark.readStream.schema(schema).parquet(inDir)).toDF(),
      out, cp)

    addFile(
      (1L, ts("2024-01-01 10:00:00"), "the quick brown fox jumps"),
      (2L, ts("2024-01-01 10:01:00"), "the quick brown fox jumps"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill after batch commit

    addFile((3L, ts("2024-01-01 10:02:00"), "the quick brown fox jumps"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val verdicts = spark.read.parquet(out).as[Streams.NearDupVerdict]
      .collect().map(v => (v.doc_id, v.band, v.matched_doc)).toList.sorted
    // doc 2's verdicts exactly once (no re-emission on restart); doc 3
    // flags against keeper 1 from the RESTORED state store, both bands
    assert(verdicts == List((2L, 1, 1L), (2L, 2, 1L), (3L, 1, 1L), (3L, 2, 1L)))
  }

  test("sessionize closes sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS(), gapMs = 10 * 60 * 1000L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // burst for user 1 and a lone event for user 2
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
        Event(3, ts("2024-01-01 10:07:00"), 2, "view", 5.0))
      q.processAllAvailable()
      // a much later event: splits user 1's session in-function AND pushes
      // the watermark past user 2's timeout (10:17)
      in.addData(Event(4, ts("2024-01-01 11:00:00"), 1, "click", 3.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Streams.Session].collect()
        .map(s => (s.user_id, s.session_start.toString, s.session_end.toString,
          s.n_events, s.total_value)).toSet
      assert(sessions.contains(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", 2L, 3.0)))
      assert(sessions.contains(
        (2L, "2024-01-01 10:07:00.0", "2024-01-01 10:07:00.0", 1L, 5.0)))
      assert(sessions.size == 2) // user 1's second session still open
    } finally q.stop()
  }

  test("cmsCells streaming state equals the batch sketch after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.cmsCells(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms").outputMode("complete").start()

    def sketchOf(texts: Seq[String]): Set[(Int, Int, Long)] =
      graft.operators.CountMin.cells(
        texts.toDF("text").select(explode(split(col("text"), " ")).as("w")))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

    def state(): Set[(Int, Int, Long)] = spark.table("cms")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

    try {
      val b1 = Seq("spark join hash join", "row scan row")
      in.addData(b1.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      q.processAllAvailable()
      assert(state() == sketchOf(b1)) // prefix 1: state == batch sketch

      // a second micro-batch ADDS counters (CMS merge), never rebuilds
      val b2 = Seq("join join join", "hash value")
      in.addData(b2.zipWithIndex.map { case (t, i) => (10L + i, t) }: _*)
      q.processAllAvailable()
      assert(state() == sketchOf(b1 ++ b2)) // prefix 2: still == batch of all
      // bounded state: never more than depth x width cells
      assert(state().size <= 4 * graft.operators.CountMin.Width)
    } finally q.stop()
  }

  test("dsCensusCells streaming state equals a hand-rolled census after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.dsCensusCells(in.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("dscens")
      .outputMode("complete").start()

    // independent reference: JVM MD5 + the little-endian 8-nibble
    // compose, NOT the shipping kernel
    def bucketOf(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("ds:" + g).getBytes("UTF-8"))
      (0 until 8).map { n =>
        val b = d(n / 2) & 0xff
        val nib = if (n % 2 == 0) b >>> 4 else b & 0xf
        nib.toLong << (4 * n)
      }.sum % graft.queries.TrainData3.DsBuckets
    }
    def censusOf(rows: Seq[(String, String)]): Map[Long, (Long, Long)] =
      rows.flatMap { case (lang, text) =>
        val t = text.split(" ", -1)
        t.zip(t.drop(1)).map(p => (lang, bucketOf(p._1 + " " + p._2)))
      }.groupBy(_._2).map { case (b, xs) =>
        b -> (xs.count(_._1 == "en").toLong, xs.size.toLong)
      }
    def state(): Map[Long, (Long, Long)] = spark.table("dscens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    try {
      val b1 = Seq(("en", "the cat sat on the mat"), ("fr", "le chat le chat"))
      in.addData(b1.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }: _*)
      q.processAllAvailable()
      assert(state() == censusOf(b1)) // prefix 1: state == census

      // a second micro-batch ADDS counters (census merge), never rebuilds
      val b2 = Seq(("en", "the cat again"), ("zh", "one-token"))
      in.addData(b2.zipWithIndex.map { case ((l, t), i) => (10L + i, l, t) }: _*)
      q.processAllAvailable()
      assert(state() == censusOf(b1 ++ b2)) // prefix 2: still == census of all
      assert(state().size <= graft.queries.TrainData3.DsBuckets,
        "state must stay bounded at the bucket count")
    } finally q.stop()
  }

  test("nbCensusCells streaming state equals a hand-rolled census after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.nbCensusCells(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("nbcens")
      .outputMode("complete").start()

    // independent reference: JVM MD5 + the little-endian 8-nibble
    // compose + a set per doc, NOT the shipping kernel; the class
    // census is cell -1, NULL-text docs count nowhere
    def bucketOf(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("nb:" + g).getBytes("UTF-8"))
      (0 until 8).map { n =>
        val b = d(n / 2) & 0xff
        val nib = if (n % 2 == 0) b >>> 4 else b & 0xf
        nib.toLong << (4 * n)
      }.sum % 64L
    }
    def censusOf(rows: Seq[String]): Map[Long, (Long, Long)] = {
      val labeled = rows.filter(_ != null).map { text =>
        val t = text.split(" ", -1)
        (t.length >= 30, t.zip(t.drop(1)).map(p => bucketOf(p._1 + " " + p._2)).toSet)
      }
      val cells = labeled.flatMap { case (keep, bs) => bs.map(keep -> _) }
        .groupBy(_._2).map { case (b, xs) =>
          b -> (xs.count(_._1).toLong, xs.count(!_._1).toLong)
        }
      cells + (-1L -> (labeled.count(_._1).toLong, labeled.count(!_._1).toLong))
    }
    def state(): Map[Long, (Long, Long)] = spark.table("nbcens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    try {
      val long1 = (0 until 35).map(i => s"w$i").mkString(" ")
      val b1 = Seq(long1, "short doc only", null)
      in.addData(b1.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      q.processAllAvailable()
      assert(state() == censusOf(b1)) // prefix 1: state == census
      assert(state()(-1L) == ((1L, 1L)), "class cell: 1 keep, 1 drop, null nowhere")

      // a second micro-batch ADDS counters (census merge), never rebuilds
      val b2 = Seq((0 until 32).map(i => s"w$i").mkString(" "), "tiny")
      in.addData(b2.zipWithIndex.map { case (t, i) => (10L + i, t) }: _*)
      q.processAllAvailable()
      assert(state() == censusOf(b1 ++ b2)) // prefix 2: still == census of all
      assert(state().size <= 65, "state bounded at NbBuckets + the class cell")
      // and the refresh story: the model from the streamed state equals
      // the batch-trained model of the same rows
      import spark.implicits._
      val docsDf = (b1 ++ b2).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      assert(graft.queries.TrainData3.nbModelFromCensus(
          graft.queries.TrainData3.nbStateFromCells(state())) ==
        graft.queries.TrainData3.nbModel(docsDf),
        "model refreshed from streamed census must equal batch retrain")
    } finally q.stop()
  }

  test("histCells streaming state equals the batch histogram after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = Streams.histCells(in.toDF().toDF("n_chars"))
      .writeStream.format("memory").queryName("hist").outputMode("complete").start()

    def histOf(lens: Seq[Long]): Map[Long, Long] =
      lens.map(n => math.min(n / 16, 255L)).groupBy(identity)
        .map { case (b, xs) => b -> xs.size.toLong }

    def state(): Map[Long, Long] = spark.table("hist")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    try {
      val b1 = Seq(5L, 17L, 31L, 4100L) // bins 0, 1, 1, overflow 255
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(state() == histOf(b1))

      // a second micro-batch ADDS counts (histogram merge), never rebuilds
      val b2 = Seq(18L, 9000L, 7L)
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(state() == histOf(b1 ++ b2))
      assert(state().size <= 256, "state must stay bounded at the bin count")
      assert(state()(255L) == 2L, "overflow bin accumulates across batches")
    } finally q.stop()
  }

  test("spikeVerdicts streaming output equals batch q90 on the same hourly counts") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the batch side: q90's spike rows, hours converted to epoch-hour idx
    val batch = SparkEntry.queries("q90_rate_spike")(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(hour) div 3600000000").as("h"),
        col("cnt"), col("s_win"), col("q_win"), col("num"), col("den2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(batch.nonEmpty)
    // the stream input: the same observed (type, hour, cnt) rows — gaps
    // stay gaps; the operator's implied-zero baseline must reconstruct
    // the batch spine semantics
    val hourly = graft.engine.Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
      .as[Streams.HourCount].collect().sortBy(r => (r.hour_idx, r.event_type))
    val in = MemoryStream[Streams.HourCount]
    val q = Streams.spikeVerdicts(in.toDS())
      .writeStream.format("memory").queryName("spikes").outputMode("append").start()
    try {
      // feed in three in-order chunks (the append-mode finalization
      // order the operator's contract names)
      val cut1 = hourly.length / 3; val cut2 = 2 * hourly.length / 3
      Seq(hourly.take(cut1), hourly.slice(cut1, cut2), hourly.drop(cut2))
        .foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("spikes")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      assert(streamed == batch,
        s"streaming/batch spike sets differ: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("clusterLabelSink: state equals batch clustering of all pairs after every batch; replay converges") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-clust").toString
    val labelPath = s"$dir/labels"
    val in = MemoryStream[(Long, Long)]
    val q = Streams.clusterLabelSink(in.toDF().toDF("doc_a", "doc_b"),
      labelPath, s"$dir/ckpt")
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def labels(): Set[(Long, Long)] =
      spark.read.parquet(labelPath).collect()
        .map(r => (r.getAs[Long]("node"), r.getAs[Long]("comp"))).toSet
    def check(): Unit = {
      val want = graft.operators.ConnectedComponents(
          seen.toSeq.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(labels() == want, s"stream state diverged after ${seen.size} pairs")
    }
    try {
      in.addData((1L, 2L), (3L, 4L)); seen ++= Seq((1L, 2L), (3L, 4L))
      q.processAllAvailable(); check()
      // the incremental-merge case that matters: a bridge pair collapses
      // two previously-independent stored clusters into one component
      in.addData((2L, 3L)); seen += ((2L, 3L))
      q.processAllAvailable(); check()
      assert(labels() == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
      in.addData((10L, 11L)); seen += ((10L, 11L))
      q.processAllAvailable(); check()
      // replay convergence: re-merging an already-applied batch through
      // the same label-union is an identity on the component labels
      val replayed = graft.operators.ConnectedComponents(
          Seq((10L, 11L)).toDF("doc_a", "doc_b").unionByName(
            spark.read.parquet(labelPath)
              .select(col("node").as("doc_a"), col("comp").as("doc_b"))),
          "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(replayed == labels(), "replaying a committed batch must not move labels")
    } finally q.stop()
  }
  test("curationFunnel: the composed stream reproduces q75's staged attribution on the gated corpus") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: the exact per-doc first-firing stage q75/q107 gate
    val batch = graft.queries.TrainData.funnelStages(spark, dir)
      .select("doc_id", "stage").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // guard the two documented prefix-vs-closure corners: on this
    // corpus no band bucket may exceed the cap (the batch retro-cap
    // and the stream's online close would diverge there)
    val d = graft.engine.Tables.documents(spark, dir)
    val train = d.filter(col("doc_id") % 10 =!= 7)
    val maxBucketSize = graft.operators.MinHashLsh
      .signatures(train.select("doc_id", "text"))
      .select(explode(array(
        concat(lit("1:"), col("mh1"), col("mh2")),
        concat(lit("2:"), col("mh3"), col("mh4")))).as("bk"))
      .groupBy("bk").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxBucketSize <= 64, s"spec corpus has a capped bucket ($maxBucketSize)")
    val evalGrams = d.filter(col("doc_id") % 10 === 7)
      .select(explode(array_distinct(
        graft.functions.WordNgrams(col("text"), graft.queries.TrainData.SpanN))).as("g"))
      .distinct()
    // stream the train slice in doc_id order (batch keeper = min id, so
    // arrival order must equal id order for the keeper sets to agree);
    // constant ts keeps every bucket live (no event-time eviction);
    // source rides along for the q107-shaped report below
    val rows = train.select("doc_id", "text", "source").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), ts("2024-01-01 10:00:00"),
        if (r.isNullAt(1)) null else r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, Timestamp, String, String)]
    val q = Streams.curationFunnel(
        in.toDF().toDF("doc_id", "ts", "text", "source"), evalGrams)
      .writeStream.format("memory").queryName("cfun").outputMode("append").start()
    try {
      // multiple micro-batches so state genuinely carries across them
      rows.grouped(100).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = Streams.funnelAttribution(spark.table("cfun"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed.keySet == batch.keySet,
        s"row sets differ: ${(streamed.keySet diff batch.keySet).take(5)} / ${(batch.keySet diff streamed.keySet).take(5)}")
      val diffs = batch.keys.toSeq.sorted
        .filter(k => streamed(k) != batch(k))
        .map(k => s"$k: stream=${streamed(k)} batch=${batch(k)}")
      assert(diffs.isEmpty, s"${diffs.size} attribution diffs, first: ${diffs.take(5)}")
      // and the funnel invariant: stage counts sum to the train slice
      assert(streamed.size == rows.length)
      // the (source, stage) sourcing report off the verdict log alone
      // must equal batch q107 cell-for-cell (doc AND token mass) — the
      // report production actually reads, produced without a second
      // look at the corpus
      val srcReport = Streams.funnelSourceAttribution(spark.table("cfun"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val q107 = SparkEntry.queries("q107_funnel_by_source")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(srcReport == q107,
        s"(source, stage) report diverged: ${(srcReport.toSet diff q107.toSet).take(3)} / ${(q107.toSet diff srcReport.toSet).take(3)}")
    } finally q.stop()
  }
}
