package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle statement run by the
  * driver against the same parquet tables (driver contract — see SparkEntry).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
