package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is surfaced as a named query
  * over the driver test tables, with an equivalent DuckDB oracle statement
  * where ANSI SQL can express the semantics (the driver hash-compares both
  * at sf0.01).
  */
object SparkEntry {

  /** All registered query definitions, grouped by theme. */
  def all: Seq[QueryDef] =
    Core.defs ++ Etl.defs ++ TrainData.defs ++ TrainData2.defs ++
      TrainData3.defs ++ TrainData4.defs ++ Profile.defs ++ Hygiene.defs ++
      Relational.defs ++ Warehouse.defs ++ Writers.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_daily_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
