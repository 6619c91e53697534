package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Pipeline, Tables}
import graft.sources.Landing

/** Writer/DDL round-trip queries — the oracle gate for the side-effecting
  * source/sink operators of SURVEY.md §2.1 (S4 CSV sink, S5 bulk append,
  * S6 upsert, S7 truncate/replace, S8 ordered DDL executor). Each query
  * performs the REAL write into a per-invocation temp directory, reads the
  * result back through the engine, and returns a result set DuckDB can
  * derive from the immutable parquet inputs alone — so the driver's
  * hash-compare gates the writer semantics end to end, not just a spec.
  *
  * Determinism: batches are keyed by residues of stable keys, money goes
  * through exact integer cents, and every output is explicitly ordered.
  * The read-back is localCheckpointed (eager) before the temp dir is
  * deleted, so the returned DataFrame owns its data and repeated
  * invocations (bench reps, plan sweeps) never collide: each gets a fresh
  * directory.
  *
  * Scale: the round-trip SHAPE is what is under test (swap-rewrite,
  * keep-latest dedup, append-vs-overwrite layout, filename-ordered DDL) —
  * on a cluster the same code paths run against a lake path; nothing here
  * collects rows to the driver beyond the gated result set itself.
  */
object Writers {

  /** Fresh scratch dir per invocation; deleted after `body` materializes
    * everything it returns (callers localCheckpoint before returning).
    * Generic so the specs share THIS cleanup (walk-reverse-delete) —
    * four inline copies had accumulated before round 14. */
  private[graft] def withTempDir[T](prefix: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      // materialize before closing, close before deleting: the stream
      // holds a directory handle per open level until closed
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private val cents = "CAST(round(o_totalprice * 100) AS BIGINT)"

  // ── q146: upsert round-trip (S6 + S5) — two overlapping batches flow
  // through the real bronze upsert (read ∪ new → keep-latest-per-id →
  // swap-rewrite, engine/Pipeline.scala; reference bronze_loader.py
  // ON CONFLICT semantics). The oracle derives the same survivor set with
  // a window dedup over the unioned batch definitions. Overlap: keys with
  // o_orderkey % 7 ∈ {2,3} appear in both batches; batch 2 must win. ──
  private def q146(spark: SparkSession, dir: String): DataFrame =
    withTempDir("graft_q146_") { lake =>
      val o = Tables.orders(spark, dir)
      def batch(run: Int, lo: Long, hi: Long, shift: Long) =
        o.filter(col("o_orderkey") % 7 >= lo && col("o_orderkey") % 7 <= hi)
          .select(
            col("o_orderkey").as("id"),
            (expr(cents) + lit(shift)).as("cents"),
            col("o_orderstatus").as("status"),
            lit(run).as("src_run"),
            to_timestamp(lit(f"2000-01-0$run%d 00:00:00")).as("ingestion_timestamp"))
      Pipeline.upsertBronze(spark, batch(1, 0, 3, 0L), lake)
      val after = Pipeline.upsertBronze(spark, batch(2, 2, 5, 100L), lake)
      after.select("id", "cents", "status", "src_run")
        .orderBy("id").localCheckpoint()
    }

  private val q146Sql =
    s"""WITH b1 AS (
      |  SELECT o_orderkey AS id, $cents AS cents,
      |         o_orderstatus AS status, 1 AS src_run
      |  FROM orders WHERE o_orderkey % 7 BETWEEN 0 AND 3),
      |b2 AS (
      |  SELECT o_orderkey AS id, $cents + 100 AS cents,
      |         o_orderstatus AS status, 2 AS src_run
      |  FROM orders WHERE o_orderkey % 7 BETWEEN 2 AND 5),
      |u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
      |d AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY src_run DESC) AS rn
      |      FROM u)
      |SELECT id, cents, status, src_run FROM d WHERE rn = 1 ORDER BY id""".stripMargin

  // ── q147: CSV round-trip (S4 + S1's explicit-schema read) — write the
  // customer slice through the CSV fallback sink (header, quoted), read
  // it back with a pinned StructType (never inference), return the rows.
  // The `labeled` column embeds a comma so the quoting path is actually
  // exercised; money rides as integer cents (CSV has no double dialect
  // drift to survive). Oracle = the same derivation off parquet. ──
  private def q147(spark: SparkSession, dir: String): DataFrame =
    withTempDir("graft_q147_") { tmp =>
      val src = Tables.customer(spark, dir).select(
        col("c_custkey"),
        col("c_name"),
        col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"),
        concat(col("c_name"), lit(", "), col("c_mktsegment")).as("labeled"))
      Landing.writeCsv(src, s"$tmp/csv")
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("cents", LongType),
        StructField("labeled", StringType)))
      spark.read.schema(schema).option("header", "true").csv(s"$tmp/csv")
        .orderBy("c_custkey").localCheckpoint()
    }

  private val q147Sql =
    """SELECT c_custkey, c_name, c_nationkey,
      |  CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
      |  c_name || ', ' || c_mktsegment AS labeled
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ── q149: bulk append + truncate/replace round-trip (S5 + S7) — two
  // mode("append") writes accumulate (COPY-append semantics), then a
  // mode("overwrite") replaces the table (TRUNCATE + load). The gated
  // result is the (phase, rowcount, cents) census after each step; the
  // append census is materialized EAGERLY before the overwrite destroys
  // its input files — exactly the read-your-writes hazard the
  // swap-rewrite in Pipeline exists to solve, pinned here from the
  // caller's side. ──
  private def q149(spark: SparkSession, dir: String): DataFrame =
    withTempDir("graft_q149_") { tmp =>
      val p = Tables.part(spark, dir)
      val pCents = "CAST(round(p_retailprice * 100) AS BIGINT)"
      def slice(r: Int) = p.filter(col("p_partkey") % 3 === r)
        .select(col("p_partkey"), expr(pCents).as("cents"))
      val t = s"$tmp/t"
      slice(0).write.mode("append").parquet(t)
      slice(1).write.mode("append").parquet(t)
      def census(phase: String) = spark.read.parquet(t)
        .agg(count(lit(1)).as("n_rows"), sum("cents").as("total_cents"))
        .select(lit(phase).as("phase"), col("n_rows"), col("total_cents"))
        .localCheckpoint() // eager: the next write may replace these files
      val afterAppend = census("after_append")
      slice(2).write.mode("overwrite").parquet(t)
      val afterReplace = census("after_replace")
      afterAppend.unionByName(afterReplace).orderBy("phase").localCheckpoint()
    }

  private val q149Sql =
    """SELECT 'after_append' AS phase, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM part WHERE p_partkey % 3 IN (0, 1)
      |UNION ALL
      |SELECT 'after_replace' AS phase, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM part WHERE p_partkey % 3 = 2
      |ORDER BY phase""".stripMargin

  // ── q150: ordered DDL executor round-trip (S8) — model files land in a
  // temp dir and run through Landing.applyModels (filename order,
  // comment-stripping, multi-statement split — model_executor.py:32-137
  // semantics). File 02 depends on the view file 01 creates, so a wrong
  // execution order fails loudly; the gated output reads the final view.
  private def q150(spark: SparkSession, dir: String): DataFrame =
    withTempDir("graft_q150_") { tmp =>
      def write(name: String, text: String): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$tmp/$name"), text)
      write("01_base.sql",
        s"""-- base projection over the landed parquet (comment must be dropped)
           |CREATE OR REPLACE TEMPORARY VIEW q150_base AS
           |SELECT o_orderstatus, o_orderpriority,
           |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |FROM parquet.`$dir/orders.parquet`;
           |""".stripMargin)
      write("02_agg.sql",
        """CREATE OR REPLACE TEMPORARY VIEW q150_agg AS
          |SELECT o_orderstatus, o_orderpriority,
          |       COUNT(*) AS n_orders, SUM(cents) AS total_cents
          |FROM q150_base
          |GROUP BY o_orderstatus, o_orderpriority;
          |-- second statement in the same file exercises the splitter
          |CREATE OR REPLACE TEMPORARY VIEW q150_top AS
          |SELECT * FROM q150_agg WHERE n_orders >= 1;
          |""".stripMargin)
      val applied = Landing.applyModels(spark, tmp)
      require(applied.size == 3, s"expected 3 DDL statements, ran: $applied")
      spark.table("q150_top")
        .orderBy("o_orderstatus", "o_orderpriority").localCheckpoint()
    }

  private val q150Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ── q179: BUCKETED co-located join round-trip — the 100 TB big-join
  // layout as a GATED query, not just a spec: fact (orders) and dim
  // (customer) are bucketBy-written on the join key with equal bucket
  // counts, read back through the catalog, and joined. Bucketing is how
  // a lake co-locates the two biggest relations so their recurring join
  // never shuffles either side — the exchange was paid ONCE at write
  // time. The query SELF-ENFORCES the plan contract: it raises unless
  // the executed join is a SortMergeJoin with ZERO shuffle exchanges
  // (both children read bucketed scans directly), so the CORRECTNESS
  // row certifies the plan shape and the result together; ScaleSpec
  // carries the standalone pin. The gated output is the per-segment
  // join rollup, which DuckDB derives from the immutable parquet alone
  // — any row loss/duplication in the bucketed write/read/join path
  // breaks the hash. ──
  private def q179(spark: SparkSession, dir: String): DataFrame =
    withTempDir("graft_q179_") { wh =>
      // db name from the (unique) temp dir so concurrent invocations
      // (parallel suites sharing one session) never collide
      val db = "graft_q179_" + wh.filter(_.isLetterOrDigit).toLowerCase.takeRight(12)
      spark.sql(s"CREATE DATABASE $db LOCATION '$wh/warehouse'")
      try {
        Tables.orders(spark, dir)
          .select(col("o_custkey").as("custkey"), expr(cents).as("cents"))
          .write.format("parquet").bucketBy(8, "custkey").sortBy("custkey")
          .saveAsTable(s"$db.fact_orders")
        Tables.customer(spark, dir)
          .select(col("c_custkey").as("custkey"),
            col("c_mktsegment").as("mktsegment"))
          .write.format("parquet").bucketBy(8, "custkey").sortBy("custkey")
          .saveAsTable(s"$db.dim_customer")
        // hint("merge") pins SortMergeJoin without touching the session's
        // broadcast threshold (a session-level SET would leak into
        // whatever query runs next)
        val joined = spark.table(s"$db.fact_orders")
          .join(spark.table(s"$db.dim_customer").hint("merge"), "custkey")
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("SortMergeJoin"),
          s"q179: bucketed join did not plan as SortMergeJoin:\n${plan.take(600)}")
        require(!plan.contains("Exchange"),
          s"q179: bucketed join shuffled — co-location contract broken:\n${plan.take(800)}")
        joined.groupBy("mktsegment")
          .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
          .orderBy("mktsegment").localCheckpoint()
      } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }

  private val q179Sql =
    s"""SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM($cents) AS BIGINT) AS total_cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q146_upsert_roundtrip", q146, Some(q146Sql)),
    QueryDef("q147_csv_roundtrip", q147, Some(q147Sql)),
    QueryDef("q149_append_replace", q149, Some(q149Sql)),
    QueryDef("q150_ddl_roundtrip", q150, Some(q150Sql)),
    QueryDef("q179_bucketed_join", q179, Some(q179Sql)))
}
