package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for every left row, the most recent right row with
  * `right.time <= left.time` within the same key. Spark has no built-in;
  * the naive formulations don't scale (a range-condition join explodes to
  * a per-key cross product; a windowed subquery per left row double-scans).
  *
  * This is the union-and-carry-forward algorithm: tag both sides, union,
  * sort within each key by (time, side) so a right row at an equal
  * timestamp precedes the left row, then carry the latest right payload
  * forward with `last(_, ignoreNulls = true)`. ONE shuffle on the key,
  * linear in |L| + |R| — the plan you want at 100 TB.
  *
  * Ties among right rows at the same (key, time) must be resolved by the
  * caller (pre-dedup to one row per key+time) for a deterministic result —
  * as any engine's ASOF JOIN requires for reproducibility.
  */
object AsofJoin {

  /** @param left         probe side (each row emitted exactly once)
    * @param right        reference side (carried forward)
    * @param key          equi-join key column name (same name both sides)
    * @param leftTime     event-time column on `left`
    * @param rightTime    event-time column on `right`
    * @param rightPayload columns of `right` to attach (null when no right
    *                     row exists at or before the left row's time)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String,
            rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val payloadType = StructType(right.select(rightPayload.map(col): _*).schema.fields)
    val leftType = StructType(left.schema.fields)

    val lSide = left.select(
      col(key), col(leftTime).as("__t"), lit(1).as("__isLeft"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))
    val rSide = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__isLeft"),
      struct(rightPayload.map(col): _*).as("__payload"),
      lit(null).cast(leftType).as("__left"))

    // right rows sort before left rows at the same timestamp, so an exact
    // timestamp match is visible to the left row (ASOF `<=` semantics)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .select(leftCols.map(c => col(s"__left.$c").as(c))
        ++ rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** FORWARD as-of join — for every left row, the EARLIEST right row with
    * `right.time >= left.time` within the same key (next-event
    * attribution: click → next purchase, failure → next restart). The
    * mirror image of [[apply]]: same union, same single key shuffle, but
    * the sort puts a left row BEFORE right rows at an equal timestamp
    * (so `>=` ties are visible forward) and the first non-null payload
    * is carried BACKWARD over a current-row→following frame. Same
    * caller contract: pre-dedup right to one row per (key, time). */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val payloadType = StructType(right.select(rightPayload.map(col): _*).schema.fields)
    val leftType = StructType(left.schema.fields)

    val lSide = left.select(
      col(key), col(leftTime).as("__t"), lit(1).as("__isLeft"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))
    val rSide = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__isLeft"),
      struct(rightPayload.map(col): _*).as("__payload"),
      lit(null).cast(leftType).as("__left"))

    // __isLeft DESC: left rows sort before right rows at the same
    // timestamp, so an exact match lands inside the forward frame
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__isLeft").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lSide.unionByName(rSide)
      .withColumn("__asof", first(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .select(leftCols.map(c => col(s"__left.$c").as(c))
        ++ rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
