package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.util.control.NonFatal

/** Dev profiling tool (round 16): per-query job/stage/task/shuffle census.
  *
  * The bench total at test scale is dominated by per-query FIXED costs —
  * job submissions, stage boundaries (= shuffles + checkpoints), task
  * dispatch — not by data volume, and exactly those costs are the 100 TB
  * scale levers (guide §1.2: the distributed algorithm first). This main
  * runs every query once under the SAME session config as [[Bench]]
  * (shared via [[Bench.benchSession]], so the two cannot drift — r16
  * ADVICE) and prints, per query: wall seconds, Spark job count, stage
  * count, task count, shuffle-read/write bytes and records. Sorted by
  * wall seconds.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.JobProfile [namePrefix ...]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.benchSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shufR.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = args.toSeq
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
    // warmup (same as Bench): codegen/JIT/footers at sf0.001. NonFatal
    // only — a fatal error (OOM, linkage) must crash the tool, not be
    // profiled away (r16 ADVICE: a swallowed Throwable recorded a broken
    // query as ~0 s with an empty census and nothing marked it failed).
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case NonFatal(_) => } }
    spark.catalog.clearCache()

    case class Prof(name: String, sec: Double, jobs: Int, stages: Int,
                    tasks: Int, shufR: Long, shufW: Long, err: Boolean)
    def drain(): Unit = {
      // listenerBus is private[spark]; a short sleep lets queued events
      // flush so counters attribute to the right query (profiling-grade)
      Thread.sleep(150)
    }
    val rows = selected.map { case (name, fn) =>
      // rep 1 untimed: pays FrozenModels training for the sf dir + JIT;
      // the census below is the STEADY-STATE execution (what the bench's
      // min-of-reps actually measures)
      var err = false
      try fn(spark, sfDir).count() catch { case NonFatal(_) => err = true }
      spark.catalog.clearCache()
      drain()
      jobs.set(0); stages.set(0); tasks.set(0); shufR.set(0L); shufW.set(0L)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case NonFatal(_) => err = true }
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      spark.catalog.clearCache()
      // a failed query's wall is an exception latency, not a runtime —
      // report NaN so it can never be mistaken for "fast"
      Prof(name, if (err) Double.NaN else sec,
        jobs.get, stages.get, tasks.get, shufR.get, shufW.get, err)
    }
    println(f"${"query"}%-32s ${"sec"}%7s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"shR_kb"}%8s ${"shW_kb"}%8s")
    rows.sortBy(p => if (p.err) Double.MinValue else -p.sec).foreach { p =>
      val flag = if (p.err) " FAILED" else ""
      println(f"${p.name}%-32s ${p.sec}%7.2f ${p.jobs}%5d ${p.stages}%5d ${p.tasks}%6d ${p.shufR / 1024}%8d ${p.shufW / 1024}%8d$flag")
    }
    val failedNames = rows.filter(_.err).map(_.name)
    println(f"TOTAL sec=${rows.filterNot(_.err).map(_.sec).sum}%.2f jobs=${rows.map(_.jobs).sum} stages=${rows.map(_.stages).sum} tasks=${rows.map(_.tasks).sum} failed=${failedNames.size}")
    if (failedNames.nonEmpty)
      println(s"FAILED queries: ${failedNames.mkString(", ")}")
    spark.stop()
    if (failedNames.nonEmpty) sys.exit(1)
  }
}
