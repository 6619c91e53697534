package graft

import java.nio.file.Files
import graft.sources.Landing

class LandingSpec extends SparkSpec {
  import spark.implicits._

  test("readRawJson pins the explicit schema and isolates corrupt records") {
    val dir = Files.createTempDirectory("graft-raw").toString
    val good = """{"id":"t1","content":"<p>hi</p>","replies_count":3,"sensitive":false,"created_at":"2024-01-01T10:00:00.000Z","language":"en"}"""
    val bad = """{"id":"t2", BROKEN"""
    Files.write(java.nio.file.Paths.get(dir, "page1.json"),
      (good + "\n" + bad).getBytes("UTF-8"))
    val df = Landing.readRawJson(spark, dir)
    assert(df.schema.fieldNames.contains("_corrupt_record"))
    assert(df.schema("replies_count").dataType.typeName == "long")
    val rows = df.collect()
    assert(rows.length == 2)
    val ok = rows.find(_.getAs[String]("id") == "t1").get
    assert(ok.getAs[Long]("replies_count") == 3L && ok.getAs[String]("language") == "en")
    val corrupt = rows.find(r => r.getAs[String]("_corrupt_record") != null).get
    assert(corrupt.getAs[String]("id") == null)
  }

  test("writeCsv round-trips with header") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    Landing.writeCsv(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq == Seq("k", "v") && back.count() == 2)
  }

  test("ORC round-trips schema-pinned; pushdown predicates survive the format") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/out"
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.5), (3L, "c", 30.5))
      .toDF("k", "v", "x")
    Landing.writeOrc(df, dir)
    val back = Landing.readOrc(spark, dir, df.schema)
    // file scans surface every column nullable; names + types must pin
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 3)
    // the same pushdown contract as parquet: the filter reaches the scan
    val plan = back.filter($"k" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(k,1"), plan)
  }

  test("JSONL sink writes what readRawJson-style schema-pinned reads consume") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/out"
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("k", "v")
    Landing.writeJsonl(df, dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.count() == 2)
    assert(back.filter($"v".isNull).select("k").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("applyModels runs .sql files in filename order") {
    val dir = Files.createTempDirectory("graft-ddl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "02_second.sql"),
      "-- derives from the first model\nCREATE OR REPLACE TEMP VIEW m2 AS SELECT x * 2 AS y FROM m1;".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "01_first.sql"),
      "CREATE OR REPLACE TEMP VIEW m1 AS SELECT 21 AS x;".getBytes)
    val results = Landing.applyModels(spark, dir)
    assert(results == Seq("01_first.sql: OK", "02_second.sql: OK"))
    assert(spark.table("m2").collect()(0).getInt(0) == 42)
  }

  test("layerStats reports count, high-water mark, run count") {
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "r1"),
      ("b", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "r2"),
      ("c", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "r1")
    ).toDF("id", "ingestion_timestamp", "pipeline_run_id")
    val (n, hwm, runs) = Landing.layerStats(df)
    assert(n == 3 && hwm == java.sql.Timestamp.valueOf("2024-01-02 00:00:00") && runs == 2)
  }

  test("catalogStats verifies schema/table existence and row counts") {
    val wh = Files.createTempDirectory("graft-cat").toString
    val db = "graft_cat_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    try {
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
        .write.mode("overwrite").saveAsTable(s"$db.present")
      val got = Landing.catalogStats(spark, db, Seq("present", "absent"))
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getLong(3)))
        .toSet
      assert(got == Set(("present", true, true, 3L), ("absent", true, false, -1L)))
      val missing = Landing.catalogStats(spark, "graft_no_such_db", Seq("t"))
        .collect()(0)
      assert(!missing.getBoolean(1) && !missing.getBoolean(2) && missing.getLong(3) == -1L)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
