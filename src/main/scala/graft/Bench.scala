package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

object Bench {
  /** Sum of collection count/time over all GC beans (young + old). */
  private def gcTotals(): (Long, Long) = {
    val beans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  /** Cumulative CPU seconds consumed by THIS JVM (all threads). On a
    * contended host wall-clock inflates while process CPU stays flat, so
    * cpu/wall is the one number that separates "the query got slower"
    * from "the machine was busy" — the round-4 artifact couldn't tell. */
  private def processCpuSec(): Double =
    ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  private def fmt(v: Double, dp: Int): String = {
    val s = s"%.${dp}f".format(v)
    s
  }

  /** Host-wide (user+nice, system, idle, steal) jiffies from
    * /proc/stat — the emitted key is `user_nice` because nice is folded
    * into it, and `idle` is pure idle (iowait is NOT added, it counts
    * as busy-ish here) — anyone diffing against raw /proc/stat columns
    * should expect exactly that aggregation. proc_cpu_sec alone can't
    * distinguish "the query did more work" from "each cycle did less
    * work": this VM class shows runs where KERNEL time is 2× user time
    * under full 32-thread saturation (scheduler/futex overhead),
    * inflating saturating stages ~1.5× while sub-second queries are
    * untouched. system ≫ user_nice in the artifact = host-kernel
    * overhead, not a plan regression; steal > 0 = hypervisor
    * contention. */
  private def hostCpuTicks(): Option[(Long, Long, Long, Long, Long)] =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
      Some((l(0) + l(1), l(2), l(3), if (l.length > 4) l(4) else 0L,
        if (l.length > 7) l(7) else 0L))
    } catch { case _: Throwable => None }

  /** Per-rep host-tick bracket: (user_nice, system, iowait, steal) —
    * one /proc/stat line read per side, ~50 µs, cheap enough for EVERY
    * rep. Three consecutive rounds needed prose steal-adjudication
    * because the artifact carried only one whole-run steal number — a
    * clean total could hide one contended rep, and a dirty total could
    * smear one contended query over the whole suite; per-rep steal
    * closed that. The round-12 driver run then showed the NEXT gap:
    * q159 at [5.4, 15.4, 9.9] s vs 0.9 s clean with LOW per-rep steal —
    * host SYSTEM ticks exceeded user ticks, i.e. kernel/I-O contention
    * steal-only sampling cannot see. Sampling user+system+iowait per
    * rep alongside steal makes the min rep self-adjudicating for that
    * failure mode too (tools/bench_report.py derives the sentence).
    * None = /proc/stat unreadable. */
  private def repTicks(): Option[(Long, Long, Long, Long)] =
    hostCpuTicks().map { case (u, s, _, w, st) => (u, s, w, st) }

  /** The bench's Spark session, factored so [[JobProfile]] provably runs
    * the SAME engine configuration it claims to profile (r16 ADVICE: the
    * config block was copy-pasted and could drift silently). All the
    * perf-relevant knobs — shuffle partitions, split sizing, the AQE
    * coalesce policy — live HERE and only here. */
  private[graft] def benchSession(cpus: String): SparkSession = {
    val maxPartitionBytes = "8m"
    // Overridable for A/B profiling of the AQE coalesce policy (see the
    // comment below); the committed defaults are the measured winners.
    val sizeFirstCoalesce =
      sys.env.getOrElse("SPARK_GRAFT_AQE_SIZE_FIRST", "true").toBoolean
    val advisoryBytes = sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "8m")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The test tables are single small parquet files; with the default
      // 128 MB split size every scan is one task and the whole query runs
      // single-threaded. Smaller splits restore scan parallelism — the same
      // knob that sizes partitions to executor memory at 100 TB.
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.files.openCostInBytes", "1m")
      // AQE coalescing defaults to parallelism-first, which refuses to
      // coalesce below the core count — so every vocab-sized shuffle
      // (band buckets, CC labels, sketch read-outs) runs 32 near-empty
      // tasks and pays 32× task-dispatch/kernel overhead. Size-first
      // with an 8 MB advisory target folds those to a handful of tasks
      // while big shuffles (≥ cpus × 8 MB) keep full parallelism.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        (!sizeFirstCoalesce).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisoryBytes)
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // reps (default 3), min taken: rep 1 pays JIT compilation of the hot
    // codegen loops (the sf0.001 warmup is too small to trigger C2), the
    // later reps are the steady state a long-running cluster job sees.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Comma-separated query-name prefixes; empty = whole suite. Profiling
    // aid only — the driver never sets it, so official artifacts always
    // cover every query.
    val only = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    // artifact self-description (must match benchSession's values)
    val maxPartitionBytes = "8m"
    val sizeFirstCoalesce =
      sys.env.getOrElse("SPARK_GRAFT_AQE_SIZE_FIRST", "true").toBoolean
    val advisoryBytes = sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "8m")
    val spark = benchSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest scale factor: compiles every query's
    // codegen and primes JIT/parquet-footer caches, so timed runs measure
    // the query, not first-touch compilation.
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
    selected.map(_._2)
      .foreach(fn => try fn(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => })
    spark.catalog.clearCache()

    val host0 = hostCpuTicks()
    val (gc0Count, gc0Ms) = gcTotals()
    val cpu0 = processCpuSec()
    val wall0 = System.nanoTime()

    // A query that throws must be LOUD: r6's silent `-1L` catch recorded
    // broken queries at their exception latency (0.06 s) — a bench that
    // reports a broken query as *fast* is worse than one that crashes.
    // Failed names land in an "errors" key inside the tail window and the
    // process exits nonzero.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // Per rep: wall seconds, (user, system, iowait, steal) host-tick
    // deltas (see repTicks for why all four), and the JVM's own
    // process-CPU seconds over the same bracket — the host-independent
    // signal round 14 lacked (its predicate certified under persistent
    // moderate contention: two same-policy artifacts on one tree
    // differed 1.4× because /proc/stat alone cannot see "each wall
    // second delivered fewer JVM cycles" when the host sits just under
    // every threshold).
    val noTicks = (-1L, -1L, -1L, -1L)
    // ok=false marks a rep whose query THREW: its sec is an exception
    // latency, never a runtime. The rep itself carries the flag (r15
    // ADVICE: oneRep used to write straight into `failed`, so a
    // transient exception during an end-of-suite RETRY rep
    // retroactively discarded the query's clean main-pass reps and
    // failed the whole run — an extra diagnostic rep could poison an
    // otherwise-passing suite); the caller decides what a failure
    // means: main-pass → errors + exit 1, retry → retry_errors only.
    case class Rep(sec: Double, ticks: (Long, Long, Long, Long),
                   cpu: Double, ok: Boolean)
    def oneRep(name: String, fn: (SparkSession, String) => DataFrame): Rep = {
      val h0 = repTicks()
      val c0 = processCpuSec()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      val c1 = processCpuSec()
      val h1 = repTicks()
      val d = (h0, h1) match {
        case (Some((u0, s0, w0, st0)), Some((u1, s1, w1, st1))) =>
          (u1 - u0, s1 - s0, w1 - w0, st1 - st0)
        case _ => noTicks
      }
      Rep(sec, d, if (c0 < 0 || c1 < 0) -1.0 else c1 - c0, ok)
    }
    // A rep is CLEAN when BOTH channels certify it:
    //
    // (1) Host-tick bracket: readable ticks, hypervisor steal ≤5% of
    //     the host's BUSY ticks (steal/busy is the fraction of runnable
    //     time the hypervisor took, i.e. a direct bound on wall
    //     inflation — a per-core or per-second threshold misfires on
    //     short reps where one tick is a huge rate), iowait ≤25% of
    //     busy, and host system time within this VM class's normal
    //     saturation profile (system can reach ~2× user at full
    //     32-thread load — see hostCpuTicks — so 3× user is the
    //     foreign-contention line) UNLESS the JVM's own CPU accounts
    //     for ≥80% of the host's (user+system) ticks in the bracket:
    //     a checkpoint- or shuffle-heavy query (q92's per-round
    //     localCheckpoints, q06's mode shuffle) legitimately runs
    //     system-heavy ON ITS OWN — when the busy host IS this process
    //     there is no foreign contender to adjudicate, and r14 left
    //     exactly those two queries permanently uncertifiable. The
    //     +1/+2 tick tolerances absorb USER_HZ=100 granularity on
    //     sub-second reps.
    // (2) JVM cpu/wall vs the query's own cross-rep MEDIAN: same
    //     query, same data, same plan ⇒ cpu/wall is a throughput gauge
    //     calibrated by the query itself. A rep whose cpu/wall falls
    //     below 70% of the query's median is wall-inflated REGARDLESS
    //     of what /proc/stat says — this is the channel that closes
    //     round 14's leak (persistent moderate contention passing
    //     every host threshold). The reference is the MEDIAN, not the
    //     max, because reps are legitimately heterogeneous in one
    //     case: the first consumer of a FrozenModels family pays
    //     training in rep 1 at full Lloyd parallelism (cpu/wall can
    //     run ~2× the serve reps' ratio) — a max reference would
    //     reject every steady-state rep and certify only the slow
    //     training rep. Reps under 0.2 s are exempt from this leg only
    //     (JIT/GC variance dominates the ratio there, and a sub-0.2 s
    //     rep cannot meaningfully inflate a total).
    //     Residual disclosed limit: if EVERY rep of a query is equally
    //     inflated, its median ratio is depressed and leg (2) cannot
    //     see it — which is why the artifact now carries per-query
    //     cpuw_med: two artifacts on the same tree expose uniform
    //     inflation by direct ratio comparison, no prose needed.
    def hostDirty(t: (Long, Long, Long, Long), cpu: Double): Boolean = {
      val (u, s, w, st) = t
      val busy = u + s + w + st
      // USER_HZ = 100 ticks/s: the JVM's own CPU seconds expressed in
      // the same currency as the host bracket
      val ownHost = cpu >= 0 && u + s > 0 && cpu * 100.0 >= 0.8 * (u + s)
      u < 0 || // unreadable ticks cannot certify cleanliness
        st > 1 + 0.05 * busy ||
        w > 1 + 0.25 * busy ||
        (s > 3 * u + 2 && !ownHost)
    }
    // lower median (sorted((n-1)/2)) — slightly lenient on even counts,
    // and always an OBSERVED ratio, never an interpolated one
    def medCpuWall(ts: Vector[Rep]): Double = {
      val rs = ts.filter(r => r.ok && r.cpu >= 0 && r.sec > 0)
        .map(r => r.cpu / r.sec).sorted
      if (rs.isEmpty) -1.0 else rs((rs.size - 1) / 2)
    }
    // a thrown rep can never certify — its wall is an exception latency
    def dirtyRep(r: Rep, med: Double): Boolean =
      !r.ok || hostDirty(r.ticks, r.cpu) ||
        (med > 0 && r.cpu >= 0 && r.sec >= 0.2 && r.cpu / r.sec < 0.7 * med)
    // Clean-rep policy (round-13 lesson): the driver's official r13
    // artifact was contention-polluted — its adjudication columns could
    // DIAGNOSE that (minrep steal 6.9/s, q09 at 46 s vs 1.35 s clean)
    // but not FIX the headline number, so the 2× contract had to be
    // argued from a separate builder-side run. Now any query with no
    // clean rep after the fixed reps earns up to `cleanRetries` extra
    // reps (stop at the first clean one), and the artifact carries
    // clean_total / clean_coverage — a total whose every contributing
    // rep ran with certified-clean host ticks — next to the raw value,
    // so one driver artifact self-certifies.
    val cleanRetries =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CLEAN_RETRIES", "3").toInt
    // Global extra-rep budget: on a PERSISTENTLY stolen host every rep
    // is dirty and per-query retries alone would double the run (174
    // queries × 3 extras). The budget bounds total retry wall-cost; when
    // it runs out remaining dirty queries simply stay uncertified and
    // clean_coverage says so.
    val cleanBudget0 =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CLEAN_BUDGET", "60").toInt
    // a query has at least one certified rep under the current policy
    def hasClean(name: String, ts: Vector[Rep]): Boolean =
      !failed.contains(name) &&
        ts.exists(r => !dirtyRep(r, medCpuWall(ts)))
    val results = scala.collection.mutable.ArrayBuffer.empty[
      (String, Vector[Rep], Int)]
    selected.foreach { case (name, fn) =>
      val times = (1 to reps).map(_ => oneRep(name, fn)).toVector
      if (times.exists(!_.ok)) failed += name
      // Isolation: no query may ride on (or pay for) another query's
      // cached DATA. Queries themselves use GC-scoped localCheckpoint,
      // not persist, so this is insurance against future persist use.
      // Deliberate exemption: FrozenModels' TRAINED-MODEL cache
      // (centroids/codebooks/unigram/NB/DSIR state) is shared across
      // queries AND reps by design — train-once/serve-many is the
      // production lifecycle being measured, so whichever consumer runs
      // first pays training for the family. clearCache() does not (and
      // must not) reset it; cache_policy in the artifact records this.
      spark.catalog.clearCache()
      results += ((name, times, 0))
    }
    // DECORRELATED RETRY SWEEPS (r15 measurement: contention on this VM
    // class arrives in ~60 s steal WAVES — same-tree runs certified
    // 156–175 of 179 with a DIFFERENT contiguous victim block each
    // time). A retry fired immediately after a dirty rep lands inside
    // the very wave that dirtied it and mostly burns budget, so ALL
    // retries run as end-of-suite sweeps: each sweep revisits every
    // still-uncertified query once (full-suite spacing between a
    // query's retries), up to `cleanRetries` sweeps, bounded by the
    // global budget. Per-query extras ≤ cleanRetries TOTAL — the sweep
    // is when retries run, not extra allowance. Failed queries are
    // never re-run: their reps are exception latencies and no retry
    // can certify them (they stay loud in "errors").
    val fnByName = selected.toMap
    // Budget scales with how much of the suite the main pass failed to
    // certify (r15: the driver host's steal waves left 75 queries
    // uncertified and the fixed budget of 60 ran out mid-recovery) —
    // the per-query cap of `cleanRetries` extras still bounds the
    // worst case, the budget only stops a fully-stolen host from
    // paying it for the whole suite.
    val uncert0 = results.count { case (n, ts, _) => !hasClean(n, ts) }
    var cleanBudget = math.max(cleanBudget0, 2 * uncert0)
    // Steal-gated sweep start (r15: contention arrives in ~60 s WAVES;
    // the sweeps fired immediately into the very wave that dirtied the
    // reps and burned their budget certifying nothing). Before each
    // sweep, sample the host steal rate over 1 s and hold until it
    // drops under ~2 ticks/s (2% of one core — safely below every
    // certify threshold) or the bounded pause budget runs out, so
    // retry reps spend their budget inside quiet windows. On a
    // PERSISTENTLY stolen host the gate never opens: the pause budget
    // exhausts and the sweeps proceed exactly as before (the ownHost
    // waiver can still certify self-saturating queries there).
    var pauseLeft =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PAUSE_SEC", "120").toInt
    var pausedSec = 0
    def stealPerSec(): Double = {
      val s0 = hostCpuTicks(); Thread.sleep(1000); val s1 = hostCpuTicks()
      (s0, s1) match {
        case (Some((_, _, _, _, a)), Some((_, _, _, _, b))) => (b - a).toDouble
        case _ => -1.0 // unreadable: nothing to gate on
      }
    }
    def holdForQuietWindow(): Unit = {
      var r = stealPerSec()
      while (pauseLeft > 0 && r > 2.0) {
        val nap = math.min(3, pauseLeft)
        Thread.sleep(nap * 1000L)
        pauseLeft -= (nap + 1); pausedSec += (nap + 1)
        r = stealPerSec()
      }
    }
    val retryFailed = scala.collection.mutable.LinkedHashSet.empty[String]
    var sweep = 0
    var sweepProgress = true
    while (sweep < cleanRetries && cleanBudget > 0 && sweepProgress) {
      sweepProgress = false
      // hold only when this sweep has actual work — a fully-certified
      // suite must not pay the quiet-window probe
      val needy = results.indices.filter { i =>
        val (name, ts, extra) = results(i)
        extra < cleanRetries && !failed.contains(name) &&
          ts.exists(_.ticks._1 >= 0) && !hasClean(name, ts)
      }
      if (needy.nonEmpty) holdForQuietWindow()
      needy.foreach { i =>
        val (name, ts, extra) = results(i)
        if (cleanBudget > 0 && extra < cleanRetries &&
            !failed.contains(name) && ts.exists(_.ticks._1 >= 0) &&
            !hasClean(name, ts)) {
          val rep = oneRep(name, fnByName(name))
          // a retry failure stays a RETRY failure: the rep is recorded
          // (ok=false keeps it uncertifiable) and surfaced in
          // retry_errors, but the query's clean main-pass reps — and
          // the run's exit code — are untouched (r15 ADVICE)
          if (!rep.ok) retryFailed += name
          results(i) = (name, ts :+ rep, extra + 1)
          cleanBudget -= 1
          sweepProgress = true
          spark.catalog.clearCache()
        }
      }
      sweep += 1
    }
    // Per-query min over CLEAN reps only; a query with no clean rep
    // (even after retries) is excluded from clean_total and named in
    // "uncertified" — clean_coverage says how much of the suite the
    // certified number covers.
    val cleanMins = results.map { case (k, ts, _) =>
      // a FAILED query's reps are exception latencies, not runtimes —
      // certifying them would let a crash understate the certified
      // total, so failures are always uncertified (and loud via errors)
      val clean =
        if (failed.contains(k)) Nil
        else { val m = medCpuWall(ts); ts.filter(r => !dirtyRep(r, m)).map(_.sec) }
      (k, if (clean.isEmpty) None else Some(clean.min))
    }
    val cleanCovered = cleanMins.count(_._2.isDefined)
    val cleanTotal = cleanMins.flatMap(_._2).sum
    val cleanExtraReps = results.map(_._3).sum
    // full count first, then a bounded name list: on a persistently
    // stolen host most of the suite can be uncertified, and a silently
    // clipped list would under-report exactly then
    val uncertifiedAll = cleanMins.filter(_._2.isEmpty).map(_._1)
    val uncertifiedN = uncertifiedAll.size
    val uncertifiedJson = uncertifiedAll.take(10)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // the COMPLETE uncertified set inside the tail window (r15: with
    // 75 uncertified the 10-name prefix could not list it): positions
    // in the sorted "queries" order, run-length encoded ("12-19,44") —
    // steal waves dirty CONTIGUOUS blocks, so the encoding stays short
    // exactly when the list is long
    val uncertifiedIdx = {
      val a = cleanMins.zipWithIndex
        .collect { case ((_, None), i) => i }.toArray
      val parts = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < a.length) {
        var j = i
        while (j + 1 < a.length && a(j + 1) == a(j) + 1) j += 1
        parts += (if (i == j) a(i).toString else s"${a(i)}-${a(j)}")
        i = j + 1
      }
      parts.mkString(",")
    }
    val retryErrJson =
      retryFailed.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")

    val host1 = hostCpuTicks()
    val (gc1Count, gc1Ms) = gcTotals()
    val cpu1 = processCpuSec()
    val wallSec = (System.nanoTime() - wall0) / 1e9

    // Per-rep detail (2 dp): a contended run shows all reps inflated;
    // a JIT/first-touch effect shows rep 1 >> rep 2..n. min-of-reps alone
    // (round ≤4) couldn't distinguish the two — that ambiguity is what
    // this block removes.
    val resultTimes = results.map { case (k, ts, _) => (k, ts) }
    // RAW-headline window: the first `reps` reps ONLY. Clean-rep
    // retries exist to feed clean_total; letting them also lower the
    // raw min gave contended queries up to 3 extra chances while clean
    // queries kept the fixed count, so raw totals stopped being
    // rep-count-comparable with r13-and-earlier artifacts (r14 ADVICE).
    // reps_sec / rep_* keep ALL reps (the retry tail is the diagnostic).
    val rawTimes = results.map { case (k, ts, _) => (k, ts.take(reps)) }
    val repsJson = resultTimes.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(t => fmt(t.sec, 2)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Host ticks per rep (user/system/iowait/steal), parallel to
    // reps_sec (sacrificial zone — the committed bench_local file keeps
    // them; the tail window keeps the minrep summaries below).
    def repTickJson(pick: ((Long, Long, Long, Long)) => Long) =
      resultTimes.map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(t => pick(t.ticks)).mkString(",") + "]"
      }.mkString("{", ",", "}")
    val repUserJson = repTickJson(_._1)
    val repSysJson = repTickJson(_._2)
    val repIowaitJson = repTickJson(_._3)
    val repStealJson = repTickJson(_._4)
    // Per-rep JVM cpu/wall, parallel to reps_sec — the certification
    // channel itself, kept at full grain so any single rep's
    // certification can be re-derived from the committed file.
    val repCpuwJson = resultTimes.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(t =>
        fmt(if (t.cpu >= 0 && t.sec > 0) t.cpu / t.sec else -1.0, 2))
        .mkString(",") + "]"
    }.mkString("{", ",", "}")
    // 2 dp: the artifact is captured as the LAST 2000 chars of stdout
    // (sbt's [success] epilogue included). At 87+ queries the full map
    // (~2.2 KB) no longer fits whole — it sits BEFORE the diag/contract
    // keys so its HEAD is what truncates; whatever survives is still
    // per-query data, and the committed bench_local file has all of it.
    val qs = rawTimes.map { case (k, ts) => "\"" + k + "\":" + fmt(ts.map(_.sec).min, 2) }
      .mkString("{", ",", "}")
    val total = rawTimes.map(_._2.map(_.sec).min).sum
    // The adjudication summary that SURVIVES the tail window: total steal
    // ticks observed during exactly the reps the "queries" map reports
    // (each query's fastest), plus that total normalized per wall second
    // (USER_HZ=100: 100 ticks/s ≈ one continuously stolen core). A prior
    // round's whole-run steal of 14,585 could not say whether the MIN
    // reps were the contended ones — this can.
    val minReps = rawTimes.map { case (k, ts) => (k, ts.minBy(_.sec)) }
    def minTickStats(pick: ((Long, Long, Long, Long)) => Long): (Long, Double) = {
      val tot = if (minReps.exists(t => pick(t._2.ticks) < 0)) -1L
                else minReps.map(t => pick(t._2.ticks)).sum
      (tot, if (tot < 0 || total <= 0) -1.0 else tot / total)
    }
    val (minStealTotal, minStealRate) = minTickStats(_._4)
    // system/iowait/user over the same min reps: system ≫ user with
    // elevated iowait = kernel/I-O contention (the r12 q159 anomaly
    // steal sampling could not see); system ≈ 2× user under full
    // saturation is NORMAL on this VM class (see hostCpuTicks)
    val (minUserTotal, minUserRate) = minTickStats(_._1)
    val (minSysTotal, minSysRate) = minTickStats(_._2)
    val (minIowaitTotal, minIowaitRate) = minTickStats(_._3)
    // Whole-suite JVM cpu/wall over exactly the min reps: the
    // host-independent one-number gauge. Two same-policy artifacts on
    // one tree MUST agree on per-query cpu (same work); if artifact A's
    // minrep_cpuw is far below artifact B's, A's walls are inflated —
    // the 1.4× r14 driver-vs-local gap becomes arithmetic, not prose.
    val minCpuSec = if (minReps.exists(_._2.cpu < 0)) -1.0
                    else minReps.map(_._2.cpu).sum
    val minCpuw = if (minCpuSec < 0 || total <= 0) -1.0 else minCpuSec / total
    // the five dirtiest min-reps by steal rate (ticks/s), for pinpointing
    val dirtyJson = minReps
      .filter { case (_, r) => r.ticks._4 > 0 && r.sec > 0.2 }
      .sortBy { case (_, r) => -(r.ticks._4 / r.sec) }.take(5)
      .map { case (k, r) => "\"" + k + "\":" + fmt(r.ticks._4 / r.sec, 0) }
      .mkString("{", ",", "}")
    // Per-query BEST cpu/wall for the top-20 slowest (the only ones
    // whose inflation can move a total), inside the survival window:
    // cross-artifact uniform-inflation adjudication needs exactly
    // these twenty ratios (see dirtyRep's residual-limit note).
    // ranked by the SAME raw window as top20 so the two lists cover the
    // same query set; the VALUE is the all-reps median (the reference
    // the certification actually used)
    val cpuwByName = resultTimes.toMap
    val cpuwTopJson = rawTimes
      .sortBy { case (_, ts) => -ts.map(_.sec).min }.take(20)
      .map { case (k, _) => "\"" + k + "\":" + fmt(medCpuWall(cpuwByName(k)), 2) }
      .mkString("{", ",", "}")
    // cpu/wall near the live core count ⇒ the JVM really ran; cpu/wall
    // far below it with inflated walls ⇒ the host was contended.
    // null, not zeros, when either /proc/stat read failed: a fabricated
    // all-zero delta would read as "idle host" and a mixed success would
    // emit garbage negatives — corrupting the very diagnosis this exists for
    val hostJson = (host0, host1) match {
      case (Some((u0, s0, i0, w0, st0)), Some((u1, s1, i1, w1, st1))) =>
        s"""{"user_nice":${u1 - u0},"system":${s1 - s0},"idle":${i1 - i0},""" +
          s""""iowait":${w1 - w0},"steal":${st1 - st0}}"""
      case _ => "null"
    }
    val diag = s""""wall_sec":${fmt(wallSec, 1)},"proc_cpu_sec":${fmt(cpu1 - cpu0, 1)},""" +
      s""""gc_count":${gc1Count - gc0Count},"gc_sec":${fmt((gc1Ms - gc0Ms) / 1e3, 1)},""" +
      s""""host_ticks":$hostJson"""
    // Self-describing artifact: reps + the perf-relevant session config,
    // so round-over-round BENCH_r{N}.json comparisons carry their own
    // measurement conditions.
    val env = s""""reps":$reps,"agg":"min","cpus":$cpus,"warmup_sf":"sf0.001",""" +
      s""""shuffle_partitions":$cpus,"max_partition_bytes":"$maxPartitionBytes",""" +
      s""""cache_policy":"localCheckpoint per query, clearCache between queries; """ +
      s"""FrozenModels trained-model cache shared across queries+reps",""" +
      s""""clean_retries":$cleanRetries,"clean_budget":$cleanBudget0,""" +
      s""""clean_budget_scaled":${math.max(cleanBudget0, 2 * uncert0)},""" +
      s""""raw_policy":"min over first $reps reps; """ +
      s"""retry reps feed clean_total only",""" +
      s""""aqe":${spark.conf.get("spark.sql.adaptive.enabled")},""" +
      s""""aqe_size_first":$sizeFirstCoalesce,"aqe_advisory":"$advisoryBytes""""
    // Outlier forensics that SURVIVES the tail capture: a query whose
    // rep spread says "one-off contention" (max > 2× min at min > 0.3 s
    // — the r5 q46 shape) carries its full rep array RIGHT NEXT to the
    // contract keys, so the driver artifact can adjudicate the outlier
    // without the local file. A clean run emits {} (~20 chars of
    // window); this is the only per-rep detail inside the window — the
    // full reps_sec up front can never fit (the 87-entry queries map
    // alone is ~2 KB).
    val outJson = rawTimes
      .map { case (k, ts) => (k, ts.map(_.sec)) }
      .filter { case (_, ss) => ss.min > 0.3 && ss.max > 2 * ss.min }
      .sortBy { case (_, ss) => -ss.min }.take(5) // bound the window cost
      .map { case (k, ss) => "\"" + k + "\":[" + ss.map(fmt(_, 2)).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val errJson = failed.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Top-20 slowest (by min), ~500 chars: at 150 queries the
    // alphabetical "queries" map truncates somewhere in the q1xx range,
    // so the SLOWEST queries' timings — the only ones a perf review
    // needs — used to survive only when the alphabet cooperated. This
    // block puts them inside the window BY CONSTRUCTION; together with
    // rep_outliers (which carries its own rep arrays) every number a
    // drift adjudication needs is in the captured artifact, no local
    // file required.
    val topJson = rawTimes.sortBy { case (_, ts) => -ts.map(_.sec).min }.take(20)
      .map { case (k, ts) => "\"" + k + "\":" + fmt(ts.map(_.sec).min, 2) }
      .mkString("{", ",", "}")
    // Key order is survival priority under a `tail` capture (the HEAD of
    // an over-long line is what gets cut): sacrificial per-rep detail
    // first (at 87+ queries it can NEVER fit the 2000-char window — it
    // lives for the committed bench_local file only), then "queries"
    // (partially truncatable), then the top-20-slowest block, then the
    // rep-spread outliers, then the diagnosis block (~130 chars:
    // cpu/wall/gc/host_ticks — r6 buried these before "queries" and they
    // were truncated out exactly when they were needed to prove host
    // contention), then "errors", then the contract keys
    // ("metric":"total","value") at the very END so they survive ANY
    // window.
    println(s"""{"sf":"$sfDir",$env,"reps_sec":$repsJson,"rep_user":$repUserJson,"rep_sys":$repSysJson,"rep_iowait":$repIowaitJson,"rep_steal":$repStealJson,"rep_cpuw":$repCpuwJson,"queries":$qs,"top20":$topJson,"cpuw_med_top20":$cpuwTopJson,"rep_outliers":$outJson,"minrep_steal_ticks":$minStealTotal,"minrep_steal_per_sec":${fmt(minStealRate, 1)},"minrep_user_ticks":$minUserTotal,"minrep_user_per_sec":${fmt(minUserRate, 1)},"minrep_sys_ticks":$minSysTotal,"minrep_sys_per_sec":${fmt(minSysRate, 1)},"minrep_iowait_ticks":$minIowaitTotal,"minrep_iowait_per_sec":${fmt(minIowaitRate, 1)},"minrep_cpu_sec":${fmt(minCpuSec, 1)},"minrep_cpuw":${fmt(minCpuw, 2)},"dirty_minreps":$dirtyJson,$diag,"errors":$errJson,"clean_total":${fmt(cleanTotal, 2)},"clean_coverage":"$cleanCovered/${results.size}","clean_extra_reps":$cleanExtraReps,"retry_errors":$retryErrJson,"retry_pause_sec":$pausedSec,"uncertified_n":$uncertifiedN,"uncertified_idx":"$uncertifiedIdx","uncertified_first10":$uncertifiedJson,"metric":"total","value":${fmt(total, 2)},"unit":"sec"}""")
    spark.stop()
    // Broken queries must fail the run visibly, not just textually.
    if (failed.nonEmpty) sys.exit(1)
  }
}
