package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.engine.Tables

/** Pins `Tables.events` against BOTH parquet generations the driver has
  * shipped for `events.ts` — TIMESTAMP(NANOS) (rejected by the vectorized
  * reader, loaded as raw Long via `nanosAsLong` and rebuilt) and
  * TIMESTAMP(MICROS) (loads natively as TIMESTAMP_NTZ, cast to TIMESTAMP).
  * Round 6 shipped with the reader hard-wired to the nanos generation and
  * every event-based query (14 of 87, two gold MVs among them) threw at
  * analysis time when the testdata regenerated as micros — this spec makes
  * that breakage a local `sbt test` failure instead of a driver-artifact
  * surprise.
  *
  * The nanos fixture (`src/test/resources/events_ts_nanos.parquet`) is the
  * real sf0.001 events table re-encoded with `ts` as parquet
  * TIMESTAMP(NANOS) — same rows, other generation's physical type.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val nanosDir: String = {
    val dir = Files.createTempDirectory("graft-events-nanos")
    dir.toFile.deleteOnExit()
    val res = getClass.getResourceAsStream("/events_ts_nanos.parquet")
    assert(res != null, "nanos fixture missing from test resources")
    try Files.copy(res, dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    finally res.close()
    dir.toString
  }

  test("micros generation: ts loads as TIMESTAMP (not NTZ, not Long)") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }

  test("nanos generation: ts rebuilds to TIMESTAMP from raw nanos") {
    val df = Tables.events(spark, nanosDir)
    assert(df.schema("ts").dataType == TimestampType)
    // the nanosAsLong conf must make the RAW read a Long — otherwise this
    // fixture isn't exercising the branch it exists for
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$nanosDir/events.parquet")
    assert(raw.schema("ts").dataType == LongType)
  }

  test("both generations read identical instants and rows") {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = Tables.events(spark, sfDir).select(cols.map(col): _*)
    val b = Tables.events(spark, nanosDir).select(cols.map(col): _*)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("unix_micros works on the loaded ts for both generations") {
    // the exact consumer shape that broke in round 6 (q41/q48/q87)
    Seq(sfDir, nanosDir).foreach { d =>
      val n = Tables.events(spark, d)
        .select(unix_micros(col("ts")).as("us")).filter(col("us") > 0).count()
      assert(n > 0)
    }
  }
}
