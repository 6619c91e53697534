package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (see TESTDATA.md / FIXTURES.md).
  *
  * All readers take the scale-factor directory so the same query code runs at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, unchanged, on a
  * real cluster against a 100 TB lake path: everything downstream is plain
  * DataFrame lineage, so Catalyst pushes filters/pruning into these scans.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations. NANOS is rejected by
    * Spark's vectorized reader ([PARQUET_TYPE_ILLEGAL]), so we always set
    * `legacy.parquet.nanosAsLong` (a runtime SQLConf, safe per-call on a
    * shared session): nanos data then loads as a raw LongType we rebuild
    * into a microsecond timestamp (truncation, matching any ns→us
    * conversion), while micros data loads as a native timestamp we pass
    * through untouched. Branching on the LOADED type — not an assumed
    * physical type — keeps both generations working.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div — ns epoch (~1.7e18) overflows double's 53-bit mantissa
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet micros with isAdjustedToUTC=false loads as TIMESTAMP_NTZ;
        // downstream uses unix_micros & co. which demand TIMESTAMP. Every
        // entry point pins the session zone to UTC, so this cast is a pure
        // type change (identity on the epoch value) — same instants the
        // nanos path produced.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already TIMESTAMP: use as-is
    }
  }
}
