package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — classifies every document id across two corpus
  * versions as added / removed / modified / unchanged by comparing
  * content fingerprints, the audit a training pipeline runs between
  * crawl snapshots before deciding what to re-process downstream
  * (incremental dedup, MV splice, re-embedding are all driven by exactly
  * this delta).
  *
  * Scale design: one full-outer equi-join on the id — the canonical
  * co-partitioned shuffle pair. With both snapshots stored bucketed by
  * id (the layout a lake would already use for upsert), the join plans
  * as a zero-exchange sort-merge; fingerprints are computed in the scan
  * projection so each side is read exactly once and only (id, 32-byte
  * hash) ever moves.
  */
object SnapshotDiff {

  /** (`idCol`, `status`) for every id in either snapshot, status ∈
    * {added, removed, modified, unchanged} — "added" means present only
    * in `v2` (the newer snapshot), "removed" only in `v1`. */
  def apply(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
            contentCol: String = "text"): DataFrame = {
    // presence is a dedicated flag, NOT hash-nullity: a document with
    // NULL content exists, and misreading it as added/removed would tell
    // downstream incremental stages to drop a live id. Hashes compare
    // null-safely for the same reason (NULL→NULL is "unchanged",
    // NULL→text is "modified").
    val a = v1.select(col(idCol).as("__id"),
      sha2(col(contentCol).cast("string"), 256).as("__h1"),
      lit(true).as("__in1"))
    val b = v2.select(col(idCol).as("__id"),
      sha2(col(contentCol).cast("string"), 256).as("__h2"),
      lit(true).as("__in2"))
    a.join(b, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__in1").isNull, "added")
          .when(col("__in2").isNull, "removed")
          .when(!(col("__h1") <=> col("__h2")), "modified")
          .otherwise("unchanged").as("status"))
  }
}
