package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.FrozenModels

/** The trained-model cache's two contracts: memoization (train at most
  * once per key) and staleness detection (a rewrite at the same path
  * changes the fingerprint, so the next lookup retrains instead of
  * serving the model of data that no longer exists). */
class FrozenModelsSpec extends AnyFunSuite {

  test("memo runs the body once per key; clear() resets") {
    FrozenModels.clear()
    var runs = 0
    def v(): java.lang.Integer = FrozenModels.memo("fm-spec-key") {
      runs += 1; Integer.valueOf(runs)
    }
    assert(v() == 1 && v() == 1 && runs == 1, "body must run once")
    FrozenModels.clear()
    assert(v() == 2 && runs == 2, "clear() must force a retrain")
    FrozenModels.clear()
  }

  test("fingerprint changes when a file at the same path is rewritten") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp_")
    try {
      val f = dir.resolve("part-0.parquet")
      java.nio.file.Files.write(f, "generation-1".getBytes)
      val fp1 = FrozenModels.fingerprint(dir.toString)
      // rewrite with different LENGTH (mtime granularity can be 1 s,
      // too coarse for a same-second spec rewrite — length isn't)
      java.nio.file.Files.write(f, "generation-2-longer".getBytes)
      val fp2 = FrozenModels.fingerprint(dir.toString)
      assert(fp1 != fp2, s"rewrite not detected: $fp1 == $fp2")
      // a NEW part file (the overwrite-layout case) also changes it
      java.nio.file.Files.write(dir.resolve("part-1.parquet"), "x".getBytes)
      assert(FrozenModels.fingerprint(dir.toString) != fp2)
      // and stability: no change -> same fingerprint
      assert(FrozenModels.fingerprint(dir.toString) ==
        FrozenModels.fingerprint(dir.toString))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("fingerprint catches a same-length same-mtime in-place rewrite (content sample)") {
    graft.queries.Writers.withTempDir("graft_fp2_") { d =>
      val dir = java.nio.file.Paths.get(d)
      val f = dir.resolve("part-0.parquet")
      java.nio.file.Files.write(f, "generation-A".getBytes)
      val t0 = java.nio.file.Files.getLastModifiedTime(f)
      val fp1 = FrozenModels.fingerprint(dir.toString)
      // rewrite with the SAME length and force the SAME mtime — only the
      // tail content sample can tell the generations apart
      java.nio.file.Files.write(f, "generation-B".getBytes)
      java.nio.file.Files.setLastModifiedTime(f, t0)
      assert(FrozenModels.fingerprint(dir.toString) != fp1,
        "metadata-identical rewrite not detected")
    }
  }

  test("fingerprint catches a file moved between sibling subdirectories") {
    graft.queries.Writers.withTempDir("graft_fp3_") { d =>
      val dir = java.nio.file.Paths.get(d)
      val a = java.nio.file.Files.createDirectory(dir.resolve("a"))
      val b = java.nio.file.Files.createDirectory(dir.resolve("b"))
      val f = a.resolve("part-0.parquet")
      java.nio.file.Files.write(f, "payload".getBytes)
      val t0 = java.nio.file.Files.getLastModifiedTime(f)
      val fp1 = FrozenModels.fingerprint(dir.toString)
      // move a/part-0 -> b/part-0 preserving name, length, mtime: only
      // the RELATIVE path in each entry distinguishes the trees
      java.nio.file.Files.move(f, b.resolve("part-0.parquet"))
      java.nio.file.Files.setLastModifiedTime(b.resolve("part-0.parquet"), t0)
      assert(FrozenModels.fingerprint(dir.toString) != fp1,
        "sibling-subdirectory move not detected")
      assert(b.toFile.exists) // keep `b` referenced for clarity
    }
  }

  test("memoGen: concurrent same-prefix lookups train once per live generation") {
    FrozenModels.clear()
    val trains = new java.util.concurrent.atomic.AtomicInteger(0)
    // 8 threads race the SAME (prefix, fp): the per-prefix lock must
    // collapse them to one training (evict-then-computeIfAbsent without
    // the lock could let racers evict each other's fresh insert)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Integer] {
          def call(): Integer =
            FrozenModels.memoGen("fm-spec-conc|/d", "fp1") {
              Integer.valueOf(trains.incrementAndGet())
            }
        })
      }
      val vals = tasks.map(_.get()).toSet
      assert(vals == Set(Integer.valueOf(1)), s"racers saw $vals")
      assert(trains.get() == 1, s"trained ${trains.get()} times for one generation")
    } finally pool.shutdown()
    FrozenModels.clear()
  }

  test("fingerprint of a missing path is the sentinel, not an error") {
    assert(FrozenModels.fingerprint("/nonexistent/graft/path") == "absent")
  }

  test("memoGen evicts the PREVIOUS generation of a prefix, not other prefixes") {
    FrozenModels.clear()
    var trains = 0
    def model(fp: String): java.lang.Integer =
      FrozenModels.memoGen("fm-spec-model|/d", fp) { trains += 1; Integer.valueOf(trains) }
    val other = FrozenModels.memoGen("fm-spec-other|/d", "fpX") { Integer.valueOf(99) }
    assert(model("fp1") == 1 && model("fp1") == 1 && trains == 1)
    // data rewritten at the same path: new fingerprint retrains AND the
    // stale generation is evicted (no leak per refresh)
    assert(model("fp2") == 2 && trains == 2)
    // the old generation is gone: flipping back retrains rather than
    // serving the evicted value
    assert(model("fp1") == 3 && trains == 3)
    // unrelated prefixes are untouched by the eviction sweep
    assert(FrozenModels.memoGen("fm-spec-other|/d", "fpX") { Integer.valueOf(-1) } == other)
    FrozenModels.clear()
  }
}
