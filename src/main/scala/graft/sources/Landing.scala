package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Schemas

/** Source/sink surface (SURVEY.md §2.1). The REST crawl itself is an
  * ingest-job concern (S1); the engine's contract starts at landed files.
  */
object Landing {

  /** S1/S2 — read landed raw-toot JSON (one object per line) with the
    * pinned explicit schema; malformed records surface in
    * `_corrupt_record` instead of failing the batch (the reference's
    * safe_* coercions return NULL on bad fields the same way). */
  def readRawJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.rawToot.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** S4 — CSV fallback sink (main.py:127-129 writes the batch to CSV when
    * the bronze load fails). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Columnar interchange beyond parquet: ORC sink/source with the same
    * explicit-schema discipline (never inference on read). ORC is the
    * second first-class columnar format a lake consumer hands us; both
    * carry the identical predicate-pushdown / column-pruning contract at
    * scan time, so every query in this engine runs unchanged on either. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JSONL sink — the landed-file format [[readRawJson]] consumes; a
    * re-crawl simulator and the export format for row-oriented
    * downstream consumers. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S8 — ordered DDL executor: run every .sql file under `dir` in
    * filename order (model_executor.py:32-137; ordering by name at :80).
    * Statements are split by [[splitStatements]]: a ';' inside a string
    * literal never splits (even across lines), `--` line comments are
    * dropped wherever they start (whole-line, interior, or trailing
    * after a terminator), repeated/trailing semicolons collapse, blank
    * statements are skipped, and a final statement without a terminator
    * still runs (WritersSpec pins all of these). */
  def applyModels(spark: SparkSession, dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName)
    files.flatMap { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      splitStatements(text).map { s => spark.sql(s); s"${f.getName}: OK" }
    }.toSeq
  }

  /** Split a SQL script into statements with a single character scan
    * that tracks string-literal state: ';' splits only OUTSIDE literals
    * (`'x;y'` survives intact, even when the literal spans lines or the
    * ';' falls at end-of-line), `--` starts a to-end-of-line comment
    * only outside literals (so `'a--b'` survives and `SELECT 1; -- n`
    * terminates cleanly), `/* … */` block comments are dropped (never
    * nested-aware — ANSI block comments don't nest) with an unclosed
    * block swallowing to end-of-script like an unterminated literal,
    * a double-quoted identifier (`"weird;name"`) protects ';'/`--`
    * exactly like a literal, and a doubled quote `''`/`""` inside
    * its region is two toggles — net inside, the SQL escape. Empty
    * statements (from `;;` or comment-only regions) are dropped. */
  private[graft] def splitStatements(text: String): Seq[String] = {
    val statements = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = {
      val s = cur.toString.trim
      if (s.nonEmpty) statements += s
      cur.clear()
    }
    var i = 0
    var inLiteral = false  // '…' string literal
    var inQuotedId = false // "…" quoted identifier
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (inLiteral) {
        cur.append(c)
        if (c == '\'') inLiteral = false
        i += 1
      } else if (inQuotedId) {
        cur.append(c)
        if (c == '"') inQuotedId = false
        i += 1
      } else if (c == '\'') {
        cur.append(c); inLiteral = true; i += 1
      } else if (c == '"') {
        cur.append(c); inQuotedId = true; i += 1
      } else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        while (i < n && text.charAt(i) != '\n') i += 1 // comment; keep the newline
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        i += 2 // block comment: skip to the matching */ (or end-of-script)
        while (i + 1 < n && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
        i = if (i + 1 < n) i + 2 else n
        cur.append(' ') // a comment separates tokens, like whitespace
      } else if (c == ';') {
        flush(); i += 1
      } else {
        cur.append(c); i += 1
      }
    }
    flush() // unterminated final statement still runs
    statements.toSeq
  }

  /** S9 — stats probes over a loaded layer as a one-row DataFrame: row
    * count, high-water mark of `hwmCol`, distinct count of `runCol`
    * (bronze_loader.py:190-224). */
  def layerStatsDf(df: DataFrame, hwmCol: String = "ingestion_timestamp",
                   runCol: String = "pipeline_run_id"): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      max(col(hwmCol)).as("high_water"),
      countDistinct(col(runCol)).as("n_runs"))

  /** S9 — the same probes as driver-side scalars. */
  def layerStats(df: DataFrame): (Long, java.sql.Timestamp, Long) = {
    val r = layerStatsDf(df).collect()(0)
    (r.getLong(0), r.getTimestamp(1), r.getLong(2))
  }

  /** S9 — catalog verification probe: schema existence, per-table
    * existence and row counts, the `spark.catalog` analog of the
    * reference's information_schema + relation-size checks
    * (model_executor.py:139-194, gold_refresh.py:138-176). Missing
    * tables report row_count = -1 (the reference prints them as absent
    * rather than failing). `expectedTables` is config-sized, so the
    * driver-side loop is bounded. */
  def catalogStats(spark: SparkSession, database: String,
                   expectedTables: Seq[String]): DataFrame = {
    import spark.implicits._
    val schemaExists = spark.catalog.databaseExists(database)
    expectedTables.map { t =>
      val tableExists = schemaExists && spark.catalog.tableExists(s"$database.$t")
      val rows = if (tableExists) spark.table(s"$database.$t").count() else -1L
      (t, schemaExists, tableExists, rows)
    }.toDF("table_name", "schema_exists", "table_exists", "row_count")
  }
}
