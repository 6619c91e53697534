package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Silver

/** Scale-pattern checks: salted aggregation equivalence, and bucketed
  * tables joining without a shuffle (the co-location path for big joins). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals direct aggregation on skewed keys") {
    // 90% of rows share one hot key
    val rows = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Silver.saltedAgg(df, Seq("k"),
      partial = Seq("s" -> sum(col("v")), "n" -> count(lit(1)), "m" -> max(col("v"))),
      combine = Seq("s" -> (c => sum(c)), "n" -> (c => sum(c)), "m" -> (c => max(c))),
      buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == direct)
  }

  // the oracle-gated twin is q179_bucketed_join (Writers.scala), which
  // additionally SELF-enforces the SortMergeJoin/no-Exchange contract
  // inside the gated query over the driver tables
  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    try {
      val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
      val right = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rv")
      left.write.format("parquet").bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable(s"$db.lhs")
      right.write.format("parquet").bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable(s"$db.rhs")
      val joined = spark.conf.get("spark.sql.autoBroadcastJoinThreshold") match {
        case _ =>
          spark.sql(s"SET spark.sql.autoBroadcastJoinThreshold=-1")
          spark.table(s"$db.lhs").join(spark.table(s"$db.rhs"), "k")
      }
      val plan = joined.queryExecution.executedPlan.toString
      // SortMergeJoin reading bucketed scans directly — no shuffle exchange
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        plan.take(800))
      assert(joined.count() == 1000)
      spark.sql(s"SET spark.sql.autoBroadcastJoinThreshold=10485760")
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("date-partitioned lake: a date predicate prunes to one partition at the scan") {
    // The 100 TB layout contract: facts land partitioned by date, and a
    // date predicate must prune DIRECTORIES at planning time (read 1/3
    // of the files), not filter rows after a full scan.
    val dir = Files.createTempDirectory("graft-part").toString
    val df = (0 until 300).map(i =>
      (i.toLong, "2024-01-%02d".format(i % 3 + 1), i * 2L))
      .toDF("id", "event_date", "v")
    df.write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-02").agg(sum("v"))
    // sparkPlan, not executedPlan: AQE wraps the adaptive root and hides
    // the scan leaves until execution
    val scan = q.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "the date predicate must plan as a partition filter, not a data filter")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"scanned ${scan.selectedPartitions.partitionCount} partitions, want exactly 1")
    assert(q.collect()(0).getLong(0) ==
      (0 until 300).filter(_ % 3 == 1).map(_ * 2L).sum)
  }

  test("ORC round-trips with schema and values intact (columnar sink breadth)") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val df = (1 to 500).map(i => (i.toLong, s"v$i", i / 7.0)).toDF("id", "s", "x")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC keeps the writer's non-null flags; compare names and types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 500)
    assert(back.filter(col("id") === 123).collect()(0).getString(1) == "v123")
  }

  test("connected components converge in O(log n) rounds on a worst-case chain") {
    // a 64-node path graph is the adversarial case for min-label
    // propagation (diameter 63 -> 63 rounds); alternating stars must
    // finish inside ~2*log2(64)+slack rounds or throw.
    // localSolveMaxEdges = 0: this test is about the DISTRIBUTED round
    // budget, so the hybrid local finish must not short-circuit it.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = graft.operators.ConnectedComponents(chain, "a", "b", maxIter = 14,
      localSolveMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == 64 && comps.forall(_._2 == 0L))
  }

  test("avgMoney matches a BigDecimal reference over randomized inputs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val cents = List.fill(200)(rnd.nextInt(2000000))
      val df = cents.map(_ / 100.0).toDF("v")
      val got = df.agg(graft.engine.Functions.avgMoney($"v", count(lit(1))))
        .collect()(0).getDouble(0)
      val want = (cents.map(BigDecimal(_)).sum / 100 / cents.length)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == want, s"got $got want $want")
    }
  }
}
