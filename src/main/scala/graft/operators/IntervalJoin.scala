package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — pair every left event with the right intervals
  * that contain it: `key match AND start <= t < end`. Catalyst plans a
  * bare inequality join as a broadcast-nested-loop / cross product, which
  * dies at scale; this implementation bins time into fixed buckets,
  * explodes each interval over the buckets it spans, and equi-joins on
  * (key, bucket) with the exact range predicate as a cheap post-filter.
  * Shuffle volume is |L| + |R| x avg-span/binSize — linear for bounded
  * intervals, and every stage is a plain hash join Catalyst/AQE can
  * optimize. Each (left, interval) pair appears exactly once because a
  * point lives in exactly one bucket.
  */
object IntervalJoin {

  /** @param left     events; must carry `key` and `leftTime`
    * @param right    intervals; must carry `key`, `startCol`, `endCol`
    *                 (half-open [start, end))
    * @param key      equi key column name (same on both sides)
    * @param leftTime event-time column on `left`
    * @param binSeconds bucket width — pick >= the typical interval span
    */
  def apply(left: DataFrame, right: DataFrame, key: String, leftTime: String,
            startCol: String, endCol: String,
            binSeconds: Long = 7L * 24 * 3600): DataFrame = {
    val lBin = left.withColumn("__bin",
      floor(unix_timestamp(col(leftTime)) / binSeconds))
    val rBins = right.withColumn("__bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds),
        // end is exclusive: a bucket is spanned only if start < end
        floor((unix_timestamp(col(endCol)) - 1) / binSeconds))))
    lBin.join(rBins, Seq(key, "__bin"))
      .filter(col(leftTime) >= col(startCol) && col(leftTime) < col(endCol))
      .drop("__bin")
  }
}
