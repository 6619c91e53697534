package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.ZOrder

/** The z-ordered WRITE path (q122 audits the layout math; this drives the
  * real writer end-to-end on disk and proves the pruning claim on actual
  * per-file parquet statistics). */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("z-ordered write: trailing-column probes prune where linear cannot; no row lost") {
    val tmp = Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey", "l_orderkey")
    val n = li.count()
    val Array(maxP, maxS) = li.agg(max("l_partkey"), max("l_suppkey"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray

    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", s"$tmp/z", nFiles = 16)
    // linear comparison layout: range-partitioned by the leading column
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lin")

    // nothing lost or duplicated by the rewrite
    assert(spark.read.parquet(s"$tmp/z").count() == n)
    assert(spark.read.parquet(s"$tmp/lin").count() == n)

    val cols = Seq("l_partkey", "l_suppkey")
    val zStats = ZOrder.fileStats(spark, s"$tmp/z", cols).collect()
    val linStats = ZOrder.fileStats(spark, s"$tmp/lin", cols).collect()
    assert(zStats.length > 1 && linStats.length > 1, "need a multi-file layout")

    // THE z-order claim: a probe on the TRAILING column alone. The linear
    // layout's files each span (nearly) the full suppkey domain — its
    // stats cannot prune this probe at all; z-ordered files are
    // rectangles in (partkey, suppkey) space, so roughly the suppkey
    // selectivity's worth of files survives.
    val trailing = Seq(("l_suppkey", 3 * maxS / 10, 2 * maxS / 5))
    val zTrail = ZOrder.probeFiles(
      ZOrder.fileStats(spark, s"$tmp/z", cols), trailing).collect()
    val linTrail = ZOrder.probeFiles(
      ZOrder.fileStats(spark, s"$tmp/lin", cols), trailing).collect()
    assert(zTrail.nonEmpty, "probe must intersect the data")
    assert(zTrail.length < linTrail.length,
      s"z-order hit ${zTrail.length} files, linear ${linTrail.length}")

    // q122's 2-D probe rectangle: partkey in [10%, 20%], suppkey in
    // [30%, 40%] (equi-COUNT range files make exact file counts data-
    // dependent at this scale — q122 pins the equi-WIDTH comparison;
    // here both layouts must at least prune something vs all files)
    val probe = Seq(
      ("l_partkey", maxP / 10, maxP / 5),
      ("l_suppkey", 3 * maxS / 10, 2 * maxS / 5))
    val zHit = ZOrder.probeFiles(
      ZOrder.fileStats(spark, s"$tmp/z", cols), probe).collect()
    assert(zHit.nonEmpty && zHit.length < zStats.length,
      s"2-D probe should prune some z files: ${zHit.length}/${zStats.length}")

    // pruning is CORRECT: every true match lives in a hit file
    val hitSet = zHit.map(_.getAs[String]("file")).toSet
    val matches = spark.read.parquet(s"$tmp/z")
      .filter(col("l_partkey").between(probe(0)._2, probe(0)._3) &&
        col("l_suppkey").between(probe(1)._2, probe(1)._3))
      .select(input_file_name().as("file"))
      .collect().map(_.getString(0))
    assert(matches.nonEmpty && matches.forall(hitSet.contains),
      "a matching row fell in a file the stats said to skip")
  }
}
