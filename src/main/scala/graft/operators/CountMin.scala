package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch construction shared by the batch heavy-hitter query
  * (q81) and the streaming sketch maintainer
  * ([[graft.streaming.Streams.cmsCells]]).
  *
  * Depth×256 counter matrix; row `j`'s hash is two md5 nibbles of the
  * word decoded via `instr('0123456789abcdef', …) - 1` — the one
  * hex-to-int primitive Spark SQL and DuckDB share exactly (see the
  * SimHash scaladoc in queries/TrainData.scala), which keeps the whole
  * sketch deterministic across engines AND partitionings, unlike
  * insertion-order-dependent summaries (Misra-Gries/SpaceSaving).
  *
  * Scale: `cells` is one partial-aggregated groupBy — each partition
  * builds its local counter matrix map-side, the shuffle-reduce ADDS
  * matrices (CMS merge is counter addition), and the result is ≤
  * depth×256 rows at any corpus size. The same addition algebra makes
  * the sketch stream-updatable: a micro-batch's increments commute with
  * the stored counters.
  */
object CountMin {

  val Width = 256

  /** Row-`j` (a column expression) cell index of word column `w`. */
  def cell(j: String, w: String = "w"): Column = expr(
    s"(instr('0123456789abcdef', substring(md5($w), 2*$j + 1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substring(md5($w), 2*$j + 2, 1)) - 1)")

  /** The merged sketch of a single-column (`w`) word relation — works
    * unchanged on a batch OR streaming DataFrame (the streaming case
    * makes the running aggregation state the sketch itself). */
  def cells(words: DataFrame, depth: Int = 4): DataFrame =
    words
      .select(col("w"), explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("cell", cell("j"))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
}
