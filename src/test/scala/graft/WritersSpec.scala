package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Pipeline
import graft.sources.Landing

/** Edge-case pins for the writer/DDL operators the oracle round-trips
  * (q146/q147/q149/q150) can't see: upsert ties at EQUAL ingestion
  * timestamps, CSV quoting with embedded quotes/newlines/commas, and the
  * DDL splitter's handling of trailing semicolons, blank statements and
  * comment-only files. */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def batch(rows: (Long, String, String)*) = {
    val data = rows.map { case (id, payload, ts) =>
      Row(id, payload, java.sql.Timestamp.valueOf(ts))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 3),
      StructType(Seq(
        StructField("id", LongType),
        StructField("payload", StringType),
        StructField("ingestion_timestamp", TimestampType))))
  }

  test("upsert: equal-timestamp ties pick one deterministic survivor") {
    val ts = "2024-01-01 00:00:00"
    val a = batch((1L, "version-a", ts), (2L, "only", ts))
    val b = batch((1L, "version-b", ts))
    // same two candidate rows for id=1, both upsert orders: the survivor
    // must be the SAME payload both times (content-hash tie-break), not
    // whichever partition arrived last
    val lake1 = tmpDir("graft_ws_tie1_")
    Pipeline.upsertBronze(spark, a, lake1)
    val r1 = Pipeline.upsertBronze(spark, b, lake1)
      .filter(col("id") === 1L).select("payload").collect()(0).getString(0)
    val lake2 = tmpDir("graft_ws_tie2_")
    Pipeline.upsertBronze(spark, b, lake2)
    val r2 = Pipeline.upsertBronze(spark, a, lake2)
      .filter(col("id") === 1L).select("payload").collect()(0).getString(0)
    assert(r1 == r2, s"upsert order changed the equal-timestamp survivor: $r1 vs $r2")
    // …and a LATER timestamp still beats any content hash
    val lake3 = tmpDir("graft_ws_tie3_")
    Pipeline.upsertBronze(spark, a, lake3)
    val r3 = Pipeline.upsertBronze(spark,
        batch((1L, "version-late", "2024-01-02 00:00:00")), lake3)
      .filter(col("id") === 1L).select("payload").collect()(0).getString(0)
    assert(r3 == "version-late")
  }

  test("upsert: equal-timestamp survivor is partition-count independent") {
    val ts = "2024-01-01 00:00:00"
    val rows = (1 to 7).map(i => (1L, s"candidate-$i", ts))
    def runWith(parts: Int): String = {
      val lake = tmpDir(s"graft_ws_parts${parts}_")
      Pipeline.upsertBronze(spark, batch(rows: _*).repartition(parts), lake)
        .select("payload").collect()(0).getString(0)
    }
    val survivors = Seq(1, 3, 8).map(runWith).distinct
    assert(survivors.size == 1,
      s"survivor depends on partitioning: $survivors")
  }

  test("upsert: equal-timestamp survivor is schema-evolution order independent") {
    // batches with DIFFERENT extra columns: merged.columns order depends
    // on which batch was written first (allowMissingColumns appends),
    // so a positional tie-break hash would let upsert order pick the
    // survivor; the name-sorted hash must not
    val ts = "2024-01-01 00:00:00"
    def wide(extraName: String, tag: String) =
      batch((1L to 16L).map(i => (i, s"$tag-$i", ts)): _*)
        .withColumn(extraName, lit(tag))
    val a = wide("aa_col", "alpha")
    val b = wide("zz_col", "omega")
    def survivors(first: org.apache.spark.sql.DataFrame,
                  second: org.apache.spark.sql.DataFrame): Map[Long, String] = {
      val lake = tmpDir("graft_ws_se_")
      Pipeline.upsertBronze(spark, first, lake)
      Pipeline.upsertBronze(spark, second, lake)
        .select("id", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val ab = survivors(a, b)
    val ba = survivors(b, a)
    assert(ab == ba, s"upsert order changed equal-timestamp survivors: $ab vs $ba")
  }

  test("CSV sink round-trips embedded quotes, newlines and commas") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType)))
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line one\nline two"),
      (5L, "all: \"q\", comma,\nand newline"),
      (6L, ""))
    val df = nasty.toDF("id", "text")
    val dir = tmpDir("graft_ws_csv_") + "/out"
    Landing.writeCsv(df, dir)
    // embedded newlines require the multiLine reader — the read side of
    // the same contract the writer's quoting promises
    val back = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true")
      .csv(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    nasty.foreach { case (id, text) =>
      // CSV has no empty-vs-NULL distinction: empty strings land as NULL
      val expect = if (text.isEmpty) null else text
      assert(back(id) == expect, s"row $id: ${back(id)} != $expect")
    }
  }

  test("DDL executor: trailing semicolons, blank statements, comment-only files") {
    val dir = tmpDir("graft_ws_ddl_")
    def write(name: String, text: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), text)
    write("00_comments_only.sql",
      "-- nothing but comments in this file\n-- second comment line\n")
    write("01_view.sql",
      // trailing semicolon + stray semicolon-only line + interior comment
      """CREATE OR REPLACE TEMPORARY VIEW ws_ddl_v AS
        |-- interior comment must be stripped, statement must survive
        |SELECT 1 AS a, 'x;y' AS s;
        |;
        |""".stripMargin)
    write("02_second.sql",
      "CREATE OR REPLACE TEMPORARY VIEW ws_ddl_w AS SELECT a + 1 AS b FROM ws_ddl_v;;")
    write("ignored.txt", "not sql, must be skipped")
    val applied = Landing.applyModels(spark, dir)
    // exactly the two real statements ran — no empties, no comment-only
    assert(applied == Seq("01_view.sql: OK", "02_second.sql: OK"), applied.toString)
    assert(spark.table("ws_ddl_w").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("DDL splitter: trailing comments, one-line multi-statements, literal state") {
    import Landing.splitStatements
    // trailing same-line comment after a terminator must not glue the
    // statements together (the old line-end-only splitter did)
    assert(splitStatements("SELECT 1; -- note\nSELECT 2;") ==
      Seq("SELECT 1", "SELECT 2"))
    // two statements on one line both run
    assert(splitStatements("SELECT 1; SELECT 2") == Seq("SELECT 1", "SELECT 2"))
    // ';' inside a literal never splits; '--' inside a literal is data
    assert(splitStatements("SELECT 'x;y' AS a;\nSELECT 'a--b' AS c;") ==
      Seq("SELECT 'x;y' AS a", "SELECT 'a--b' AS c"))
    // a literal spanning lines with ';' at end-of-line stays one statement
    assert(splitStatements("SELECT 'one;\ntwo' AS s;") ==
      Seq("SELECT 'one;\ntwo' AS s"))
    // the doubled-quote escape stays inside the literal
    assert(splitStatements("SELECT 'it''s; fine' AS s;") ==
      Seq("SELECT 'it''s; fine' AS s"))
    // interior comment glues its line's remainder out, nothing else
    assert(splitStatements("SELECT -- pick\n  7 AS n;") ==
      Seq("SELECT \n  7 AS n"))
    // block comments drop — including one holding a ';' — and separate
    // tokens like whitespace; an unclosed block swallows to the end
    assert(splitStatements("SELECT /* a;b */ 1; SELECT/*x*/2;") ==
      Seq("SELECT   1", "SELECT 2"))
    assert(splitStatements("SELECT 1; /* dangling ... SELECT 2;") ==
      Seq("SELECT 1"))
    // '/*' inside a literal is data, not a comment opener
    assert(splitStatements("SELECT '/*no' AS s; SELECT 3;") ==
      Seq("SELECT '/*no' AS s", "SELECT 3"))
    // a quoted identifier protects ';' and '--' exactly like a literal,
    // with the doubled-quote escape staying inside
    assert(splitStatements("SELECT 1 AS \"a;b--c\";\nSELECT 2;") ==
      Seq("SELECT 1 AS \"a;b--c\"", "SELECT 2"))
    assert(splitStatements("SELECT 1 AS \"q\"\";x\"; SELECT 2;") ==
      Seq("SELECT 1 AS \"q\"\";x\"", "SELECT 2"))
    // end-to-end: the executor runs a file whose first statement carries
    // a trailing comment — both views must exist afterwards
    val dir = tmpDir("graft_ws_ddl2_")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/00_two.sql"),
      "CREATE OR REPLACE TEMPORARY VIEW ws_ddl2_a AS SELECT 5 AS a; -- five\n" +
        "CREATE OR REPLACE TEMPORARY VIEW ws_ddl2_b AS SELECT a * 2 AS b FROM ws_ddl2_a;")
    val applied = Landing.applyModels(spark, dir)
    assert(applied == Seq("00_two.sql: OK", "00_two.sql: OK"), applied.toString)
    assert(spark.table("ws_ddl2_b").collect().map(_.getInt(0)).toSeq == Seq(10))
  }

  test("q172: the two-generation persisted index serves exactly a one-shot in-memory build") {
    // the production loop is persist -> reload -> append delta -> persist
    // -> serve; its result must be indistinguishable from encoding
    // base + delta in one shot under the same frozen model — any float
    // round-trip loss, code corruption or generation-merge mistake
    // breaks this equality (and the q172 oracle gate)
    import graft.queries.{TrainData, TrainData2}
    import graft.operators.{IvfFlat, PqAdc}
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.engine.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = TrainData.trainedCentroids(spark, dir)
    val codebooks = TrainData2.frozenCodebooks(spark, dir)
    val offset = corpus.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    val delta = corpus.select(
      (col("vec_id") + lit(offset)).as("vec_id"),
      transform(col("embedding"), x => (x * lit(1.01)).cast("float"))
        .as("embedding"))
    val probes = corpus
      .filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val rebuilt = PqAdc.search(
        PqAdc.encode(IvfFlat.assign(corpus.unionByName(delta), cents),
          codebooks, TrainData2.PqSub),
        probes, cents, codebooks, TrainData2.PqSub,
        nprobe = TrainData.IvfNprobe, shortlist = TrainData2.AdcShortlist,
        k = TrainData.IvfTopK)
      .select("probe_id", "cand_id", "rk")
    val served = SparkEntry.queries("q172_index_lifecycle")(spark, dir)
    assert(served.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(served).isEmpty,
      "two-generation index diverges from the one-shot build")
    assert(served.count() == 5L * TrainData.IvfTopK)
  }
}
