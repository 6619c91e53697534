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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos
    * (`legacy.parquet.nanosAsLong`) and rebuild a microsecond timestamp —
    * truncation, matching what any ns→us conversion does. The conf is a
    * runtime SQLConf, safe to set per-call on a shared session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts_ns", col("ts"))
      // integer div — ns epoch (~1.7e18) overflows double's 53-bit mantissa
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
