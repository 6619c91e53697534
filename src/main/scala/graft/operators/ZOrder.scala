package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Z-order (Morton-curve) data layout — the write-side operator behind the
  * q122 skipping audit (queries/Warehouse.scala).
  *
  * At 100 TB the scan is the dominant cost, and parquet/lakehouse
  * data-skipping prunes on per-file (or row-group) min/max statistics.
  * Sorting by a single leading column makes those stats tight in ONE
  * dimension only; interleaving the bits of two quantized key columns
  * makes every file a small RECTANGLE in (A, B) space, so probes
  * constrained on either or both columns prune. This is the same layout
  * `OPTIMIZE ... ZORDER BY` produces on Delta/Iceberg tables — here it is
  * expressed as plain Spark: a row-local z-value column +
  * `repartitionByRange` + `sortWithinPartitions`, no global sort barrier
  * (range boundaries come from Spark's reservoir sample of the z column).
  *
  * Model-state discipline: quantization needs the two column maxima — two
  * scalars collected driver-side (the bounded-collect rule that covers
  * IvfFlat's centroid seeds), then folded into the row-local expression.
  */
object ZOrder {

  /** Bit-interleave two already-quantized coordinates (each in
    * [0, 2^bits)): z bit 2i = a bit i, z bit 2i+1 = b bit i. Pure
    * shift/mask column algebra — codegen'd, row-local. */
  def interleave(a: Column, b: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1)).cast("long")
    }.reduce(_ + _)

  /** Quantize a non-negative long column onto [0, 2^bits) given an upper
    * bound (inclusive max) — explicit integer `div` (mirrors q122's
    * `//`-based audit math), so the result is exact LongType, never a
    * Double that could round `maxVal` up to 2^bits and overflow the
    * interleave. Key magnitude bound: `c * 2^bits` must fit a Long, i.e.
    * keys < 2^(63-bits) (≈ 2^55 at the default 8 bits). */
  def quantize(c: Column, maxVal: Long, bits: Int = 8): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c.cast("long") * lit(1L << bits)),
      ColumnBridge.expression(lit(maxVal + 1L))))

  /** Write `df` z-ordered on two non-negative integer key columns into
    * `nFiles` range-partitioned files at `path`. The z column is dropped
    * before the write (it is derivable layout metadata, not data). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, nFiles: Int, bits: Int = 8): Unit = {
    // 2 scalars of model state; Number-typed read so Integer/Long key
    // columns both work, and an explicit error on empty input (null max)
    // instead of an NPE deep in the write.
    val r = df.agg(max(colA), max(colB)).head
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"writeZOrdered: empty input or all-null keys ($colA, $colB)")
    val z = interleave(
      quantize(col(colA), r.getAs[Number](0).longValue, bits),
      quantize(col(colB), r.getAs[Number](1).longValue, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max statistics for `cols` over a written parquet dir —
    * exactly the stats a lakehouse keeps in its manifest and what the
    * scan planner prunes on. One aggregation over the table, grouped by
    * `input_file_name` (≤ nFiles groups). */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c"))): _*)

  /** The files a rectangle probe must scan, per the min/max stats:
    * a file is skippable iff its stats rectangle misses the probe's
    * [lo, hi] range on ANY constrained column. */
  def probeFiles(stats: DataFrame, ranges: Seq[(String, Long, Long)]): DataFrame =
    stats.filter(ranges.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _))
}
