package graft

import org.apache.spark.sql.functions._

import graft.sources.ModelRegistry

/** The persisted-model registry's contracts: publish/load round-trip,
  * generation immutability (the append contract), the merged-leg view,
  * and loud failure on every misuse path. The four model families'
  * END-TO-END correctness through this path is oracle-gated by
  * q168/q172/q173/q174 (serve-from-reload ≡ train-from-scratch). */
class ModelRegistrySpec extends SparkSpec {

  private def withDir[T](body: String => T): T =
    graft.queries.Writers.withTempDir("graft_reg_")(body)

  private def df(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("publish/load round-trips every table; manifest carries the fingerprint") {
    withDir { root =>
      val reg = new ModelRegistry(spark, root)
      reg.publish("fam", 1, "fp-abc",
        Map("a" -> df(1 -> "x", 2 -> "y"), "b" -> df(3 -> "z")))
      assert(reg.load("fam", 1, "a").orderBy("k").collect().map(_.getString(1)).toSeq
        == Seq("x", "y"))
      assert(reg.load("fam", 1, "b").collect().map(_.getString(1)).toSeq == Seq("z"))
      assert(reg.fingerprintOf("fam", 1) == "fp-abc")
      assert(reg.generations("fam") == Seq(1) && reg.latest("fam") == 1)
      // manifest shape: one row per (family, generation, table)
      assert(reg.manifest.count() == 2)
    }
  }

  test("generations are immutable: republish fails, gen-2 never touches gen-1 files") {
    withDir { root =>
      val reg = new ModelRegistry(spark, root)
      reg.publish("fam", 1, "fp1", Map("codes" -> df(1 -> "a")))
      // capture gen-1's exact file set + sizes + mtimes
      def snapshot(): Seq[(String, Long, Long)] = {
        import scala.jdk.CollectionConverters._
        val base = java.nio.file.Paths.get(s"$root/fam/gen=1")
        val walk = java.nio.file.Files.walk(base)
        try walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => (base.relativize(p).toString, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toSeq.sortBy(_._1)
        finally walk.close()
      }
      val before = snapshot()
      intercept[IllegalArgumentException] {
        reg.publish("fam", 1, "fp1", Map("codes" -> df(9 -> "z")))
      }
      reg.publish("fam", 2, "fp1", Map("codes" -> df(2 -> "b")))
      assert(snapshot() == before, "gen-2 publish disturbed gen-1 files")
      assert(reg.generations("fam") == Seq(1, 2) && reg.latest("fam") == 2)
    }
  }

  test("loadAll merges the append-log legs across generations") {
    withDir { root =>
      val reg = new ModelRegistry(spark, root)
      reg.publish("fam", 1, "fp1",
        Map("codes" -> df(1 -> "a"), "centroids" -> df(0 -> "c")))
      reg.publish("fam", 2, "fp1", Map("codes" -> df(2 -> "b")))
      val merged = reg.loadAll("fam", "codes").orderBy("k")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(merged == Seq(1 -> "a", 2 -> "b"))
      // tables absent from a generation are simply not part of its leg
      assert(reg.loadAll("fam", "centroids").count() == 1)
    }
  }

  test("crashed publish: orphan census finds the half-published generation; repair unblocks the retry") {
    withDir { root =>
      val reg = new ModelRegistry(spark, root)
      reg.publish("fam", 1, "fp1", Map("codes" -> df(1 -> "a")))
      // simulate the documented crash window: gen-2's table parquet
      // lands, the process dies before the manifest append
      df(2 -> "b").write.parquet(s"$root/fam/gen=2/codes")
      // invisible to readers (loads go through the manifest)...
      assert(reg.generations("fam") == Seq(1))
      assert(reg.loadAll("fam", "codes").count() == 1)
      // ...but a naive retry of the same generation number fails on the
      // already-existing table directory
      intercept[Exception] {
        reg.publish("fam", 2, "fp2", Map("codes" -> df(2 -> "b")))
      }
      // fsck: exactly the orphan, never a manifest-known generation
      assert(reg.orphans() == Seq(("fam", 2)))
      assert(reg.repair() == Seq(("fam", 2)))
      assert(reg.orphans().isEmpty)
      // gen-1 untouched, and the retried publish now lands cleanly
      assert(reg.load("fam", 1, "codes").collect()(0).getString(1) == "a")
      reg.publish("fam", 2, "fp2", Map("codes" -> df(2 -> "b")))
      assert(reg.generations("fam") == Seq(1, 2))
      assert(reg.loadAll("fam", "codes").count() == 2)
    }
  }

  test("staged publish: a mid-write crash leaves only staging residue — self-healing, invisible to fsck") {
    withDir { root =>
      def stagedFiles(): Long = {
        val st = java.nio.file.Paths.get(s"$root/_staging")
        if (!java.nio.file.Files.exists(st)) 0L
        else {
          val walk = java.nio.file.Files.walk(st)
          try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
          finally walk.close()
        }
      }
      val reg = new ModelRegistry(spark, root)
      reg.publish("fam", 1, "fp1", Map("codes" -> df(1 -> "a")))
      // a completed publish renames its staged generation away whole —
      // no file is ever left behind in staging
      assert(stagedFiles() == 0L, "completed publish left staging files")
      // simulate a crash DURING the table writes: parquet lands under
      // _staging, the process dies before the rename
      df(9 -> "x").write.parquet(s"$root/_staging/fam/gen=2/codes")
      // invisible everywhere: readers, generations, and the fsck
      // census (staging is not a published location)
      assert(reg.generations("fam") == Seq(1))
      assert(reg.orphans().isEmpty)
      // the retry needs NO manual step: a fresh publish of the same
      // generation clears its own residue first
      reg.publish("fam", 2, "fp2", Map("codes" -> df(2 -> "b")))
      assert(reg.loadAll("fam", "codes").count() == 2)
      assert(stagedFiles() == 0L)
      // residue from some OTHER long-dead publish is purged by repair
      df(7 -> "y").write.parquet(s"$root/_staging/oldfam/gen=1/codes")
      assert(reg.repair().isEmpty, "staging residue is not a final-dir orphan")
      assert(stagedFiles() == 0L, "repair left staging files behind")
    }
  }

  test("census family: the manifest fingerprint is the staleness signal the refresh loop reads") {
    // q175/q176 publish their DSIR/NB training censuses as registry
    // generations; the serve-side staleness probe is exactly this:
    // compare the manifest fingerprint of the latest generation against
    // the CURRENT source-data fingerprint, republish on mismatch.
    withDir { root =>
      graft.queries.Writers.withTempDir("graft_reg_src_") { src =>
        import spark.implicits._
        val reg = new ModelRegistry(spark, root)
        Seq((1L, 5L, 7L)).toDF("b", "tb", "sb").write.mode("overwrite")
          .parquet(s"$src/docs")
        val fp1 = graft.queries.FrozenModels.fingerprint(s"$src/docs")
        reg.publish("dsir-census", 1, fp1,
          Map("census" -> Seq((1L, 5L, 7L)).toDF("b", "tb", "sb")))
        assert(reg.fingerprintOf("dsir-census", reg.latest("dsir-census")) == fp1,
          "fresh model must read as non-stale")
        // the source corpus is rewritten in place → fingerprint moves →
        // the stored census is detectably stale without any data read
        Seq((1L, 6L, 7L), (2L, 1L, 1L)).toDF("b", "tb", "sb")
          .write.mode("overwrite").parquet(s"$src/docs")
        val fp2 = graft.queries.FrozenModels.fingerprint(s"$src/docs")
        assert(fp2 != fp1, "source rewrite must move the fingerprint")
        assert(reg.fingerprintOf("dsir-census", reg.latest("dsir-census")) != fp2)
        // the refresh publishes the NEXT generation; gen-1 stays served
        // to in-flight readers and the new latest carries the new print
        reg.publish("dsir-census", 2, fp2,
          Map("census" -> Seq((1L, 6L, 7L), (2L, 1L, 1L)).toDF("b", "tb", "sb")))
        assert(reg.latest("dsir-census") == 2)
        assert(reg.fingerprintOf("dsir-census", 2) == fp2)
        assert(reg.load("dsir-census", 1, "census").count() == 1)
        assert(reg.load("dsir-census", 2, "census").count() == 2)
      }
    }
  }

  test("misuse fails loudly: unknown family/generation/table, empty publish") {
    withDir { root =>
      val reg = new ModelRegistry(spark, root)
      intercept[IllegalArgumentException] { reg.latest("nope") }
      intercept[IllegalArgumentException] { reg.loadAll("nope", "codes") }
      intercept[IllegalArgumentException] { reg.publish("fam", 1, "fp", Map.empty) }
      reg.publish("fam", 1, "fp", Map("a" -> df(1 -> "x")))
      intercept[IllegalArgumentException] { reg.load("fam", 1, "missing") }
      intercept[IllegalArgumentException] { reg.load("fam", 2, "a") }
      // distinct families never collide
      reg.publish("other", 1, "fp2", Map("a" -> df(5 -> "q")))
      assert(reg.load("fam", 1, "a").collect()(0).getString(1) == "x")
      assert(reg.load("other", 1, "a").collect()(0).getString(1) == "q")
    }
  }
}
