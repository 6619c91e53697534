package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{lit, xxhash64}

/** Bloom-filter pre-filtering for incremental dedup against a stored
  * index — the standard 100 TB shuffle-avoidance trick: the stored
  * side's key set collapses to a KB–MB bit array (one aggregation),
  * the bit array BROADCASTS, and most of the incoming batch
  * short-circuits row-locally (`might_contain` = false ⇒ definitely
  * new, Bloom filters have no false negatives) without ever reaching
  * the exact join. Only the Bloom-positive sliver — true dups plus an
  * ε of false positives — pays the shuffle. Spark's own
  * InjectRuntimeFilter plays the same trick automatically inside one
  * query; here it is explicit because the stored side is an index
  * TABLE maintained across runs, not a subquery.
  *
  * Wraps Spark's internal `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (the engine's codegen'd,
  * partial-agg-mergeable implementation) — they are not in the public
  * SQL registry, so they surface here via the expression bridge.
  * Correctness is Bloom-independent: false positives only send extra
  * rows to the exact join, the RESULT is identical for any filter
  * contents — which is what lets the driver hash-gate a query whose
  * sketch bits are engine-specific (q84).
  */
object BloomPrune {
  import org.apache.spark.sql.graftbridge.ColumnBridge._

  /** Aggregate a key column into a Bloom filter (binary). Size the
    * bits ~10× expected items for ≈1% false positives. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(
      expression(xxhash64(key)),
      expression(lit(expectedItems)), expression(lit(numBits)))
      .toAggregateExpression())

  /** Row-local membership probe against an aggregated filter. */
  def mightContain(bloom: Column, key: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(xxhash64(key))))
}
