package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer relational operators (SURVEY.md §2.3/§2.4): latest-per-key
  * dedup (A11), SCD Type 2 application (J1/J7/U2), and validation probes —
  * composed from joins/windows/unions, no MERGE primitive needed on Parquet.
  *
  * Scale notes: every op here shuffles at most once on the natural key; the
  * SCD2 apply joins batch→current on the key (both sides pre-deduped, so the
  * join input is one row per key — broadcastable when the changed-batch is
  * small, hash-shuffled otherwise, both fine under AQE).
  */
object Silver {

  /** A11 — DISTINCT ON (keys) ORDER BY order: keep exactly one latest row
    * per key, deterministic given a total order (callers must include a
    * tie-break column). Reference: silver_etl.py:349-367. */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD Type 2 state for one dimension: rows carry `valid_from`,
    * `valid_to` (null while current) and `is_current`. */
  final case class Scd2Cols(validFrom: String = "valid_from",
                            validTo: String = "valid_to",
                            isCurrent: String = "is_current")

  /** J1+J7+U2 composed — apply a batch of (key, attrs) against the current
    * dimension state, expiring changed rows at `effective` and inserting new
    * current versions. Change predicate is the reference's letter: a
    * null-rejecting `!=` per tracked attribute OR key-is-new
    * (silver_etl.py:186-196; NULL↔non-NULL transitions are NOT detected —
    * SURVEY.md §7.5.3, replicated deliberately).
    *
    * `current` must have: key, attrs, validFrom/validTo/isCurrent columns.
    * `batch` must have: key, attrs (one row per key — pre-dedup with
    * [[dedupLatest]]).
    */
  def scd2Apply(current: DataFrame, batch: DataFrame, key: String,
                attrs: Seq[String], effective: Column,
                cols: Scd2Cols = Scd2Cols()): DataFrame = {
    val cur  = current.filter(col(cols.isCurrent))
    val hist = current.filter(!col(cols.isCurrent))

    val curKeyed = cur.select(
      col(key).as("__k"), col(cols.validFrom).as("__vf"),
      struct(attrs.map(col): _*).as("__cur_attrs"))
    val batKeyed = batch.select(
      col(key).as("__bk"), struct(attrs.map(col): _*).as("__bat_attrs"))

    // J1: change detection — new key, or any tracked attribute differs
    // under null-rejecting != (attribute-wise, NOT struct equality).
    val joined = batKeyed.join(curKeyed, col("__bk") === col("__k"), "left")
    val changedPred = col("__k").isNull || attrs
      .map(a => col(s"__bat_attrs.$a") =!= col(s"__cur_attrs.$a"))
      .reduce(_ || _)
    val changed = joined.filter(changedPred)
    val changedKeys = changed.select(col("__bk").as("__ck"))

    // New current versions for every changed/new key.
    val newRows = changed.select(
      col("__bk").as(key),
      col("__bat_attrs.*"),
      effective.as(cols.validFrom),
      lit(null).cast(cur.schema(cols.validTo).dataType).as(cols.validTo),
      lit(true).as(cols.isCurrent))

    // J7: expire the old versions of changed keys (semi-join), keep the rest.
    val expired = cur.join(changedKeys, col(key) === col("__ck"), "left_semi")
      .withColumn(cols.validTo, effective.cast(cur.schema(cols.validTo).dataType))
      .withColumn(cols.isCurrent, lit(false))
    val unchanged = cur.join(changedKeys, col(key) === col("__ck"), "left_anti")

    val order = current.columns.toIndexedSeq
    hist.select(order.map(col): _*)
      .unionByName(expired.select(order.map(col): _*))
      .unionByName(unchanged.select(order.map(col): _*))
      .unionByName(newRows.select(order.map(col): _*))
  }

  /** Skew-safe aggregation: pre-aggregate on (key, salt) so one hot key
    * spreads over `buckets` reducers, then combine partials per key. Only
    * valid for decomposable aggregates (sum/count/min/max — pass the
    * partial-combine expressions for the second phase). At 100 TB a single
    * viral key would otherwise pin one reducer; AQE skew handling covers
    * joins, this covers aggregations.
    *
    * The salt is derived from row CONTENT (xxhash64 of every column), not
    * from partition/row position: positional salts change when a failed
    * shuffle-map task is recomputed, duplicating or dropping phase-1
    * partials (the SPARK-23207 failure class) — content hashing keeps the
    * salt stable across retries while still spreading a hot key whenever
    * its rows differ in any non-key column. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                partial: Seq[(String, Column)],
                combine: Seq[(String, Column => Column)],
                buckets: Int = 16): DataFrame = {
    require(partial.map(_._1) == combine.map(_._1), "phase column names must align")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets.toLong)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(combine.head._2(col(combine.head._1)).as(combine.head._1),
        combine.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** J8 — referential validation probe: count of fact rows whose FK is
    * non-null but missing from the dimension. Reference: silver_etl.py:452-459. */
  def missingFkCount(fact: DataFrame, factKey: String, dim: DataFrame,
                     dimKey: String): DataFrame = {
    val d = dim.select(col(dimKey).as("__dk")).distinct()
    fact.filter(col(factKey).isNotNull)
      .join(d, col(factKey) === col("__dk"), "left")
      .agg(count(lit(1)).as("n_fact"),
        sum(when(col("__dk").isNull, 1L).otherwise(0L)).as("n_missing_fk"))
  }
}
