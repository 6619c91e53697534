package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-table sign-hyperplane LSH for approximate-nearest-neighbor
  * candidate generation over an embedding column — the bucketed scale
  * path next to the brute-force cosine baseline.
  *
  * Scale design:
  *   - Each of `tables` hash tables quantizes a DISJOINT block of `bits`
  *     vector components to sign bits (axis-aligned hyperplanes), giving
  *     2^bits buckets per table. With bits=16 the expected bucket holds
  *     N/65536 vectors — within-bucket pairing is (N/65536)² per bucket,
  *     not the (N/256)² an 8-bit single table degrades to.
  *   - Recall lost to the narrower buckets is bought back with the OR
  *     over `tables` independent tables (standard multi-probe/multi-table
  *     LSH); `n_tables` (how many tables bucketed the pair together) is
  *     returned as a collision-strength signal for re-ranking.
  *   - Buckets larger than `maxBucket` (dense hubs — e.g. the all-zeros
  *     sign pattern of near-origin vectors) are dropped before pairing,
  *     bounding the worst bucket's fan-out; the size probe is a groupBy
  *     count, skew-safe via map-side partial aggregation, and the bucket
  *     list stays distributed (linear in corpus, not broadcastable).
  */
object AnnLsh {

  /** Sign-bit bucket over 1-based components [lo, lo+bits). A NULL or
    * too-short vector raises instead of silently bucketing as '0' bits —
    * element_at past the end returns NULL, and a corrupted bucket key
    * would quietly destroy recall, so enforce the dim requirement here. */
  private def signBucket(v: Column, lo: Int, bits: Int): Column = {
    val hi = lo + bits - 1
    val bitStr = concat_ws("", (lo until lo + bits).map(i =>
      when(element_at(v, i) >= 0, lit("1")).otherwise(lit("0"))): _*)
    when(size(v) >= hi, bitStr).otherwise(raise_error(concat(
      lit(s"ann_lsh: embedding dim must be >= $hi, got "),
      coalesce(size(v).cast("string"), lit("NULL")))))
  }

  /** One (`idCol`, tbl, bucket) row per hash table — the sign-bucket
    * keying shared by the self-join and cross-set paths. Single-pass:
    * one explode of `tables` (tbl, bucket) structs per row — a narrow
    * generate over ONE scan of `df`, where the union-of-`tables`
    * formulation read the (often checkpointed) embedding relation once
    * per table (the same fix [[MinHashLsh]] applied to its bands). */
  private def keyedBuckets(df: DataFrame, idCol: String, vecCol: String,
                           tables: Int, bits: Int): DataFrame = {
    // tables=0 would explode an empty array into an EMPTY relation — a
    // misconfigured caller would get zero candidates silently where the
    // old union-of-tables formulation threw (same guard style as PqAdc)
    require(tables >= 1, s"ann_lsh: tables must be >= 1, got $tables")
    df.select(col(idCol), explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          signBucket(col(vecCol), t * bits + 1, bits).as("bucket"))
      }: _*)).as("tb"))
      .select(col(idCol), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** Drops rows in over-`maxBucket` (tbl, bucket) hubs — the shared
    * fan-out bound; the size probe is a map-side-partial groupBy count
    * and the bucket list stays distributed. */
  private def capHubs(keyed: DataFrame, maxBucket: Int): DataFrame = {
    val small = keyed.groupBy("tbl", "bucket").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select("tbl", "bucket")
    keyed.join(small, Seq("tbl", "bucket"))
  }

  /** Candidate pairs (`a_id` < `b_id`) with `n_tables` = number of hash
    * tables that bucketed the pair together (1..tables). Requires
    * embedding dim ≥ tables*bits — enforced: a short or NULL vector fails
    * the job loudly rather than corrupting bucket keys. */
  def candidates(emb: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding", tables: Int = 4,
                 bits: Int = 16, maxBucket: Int = 128): DataFrame = {
    val kept = capHubs(keyedBuckets(emb, idCol, vecCol, tables, bits), maxBucket)
    kept.select(col("tbl"), col("bucket"), col(idCol).as("a_id"))
      .join(kept.select(col("tbl"), col("bucket"), col(idCol).as("b_id")),
        Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(countDistinct("tbl").as("n_tables"))
  }

  /** Cross-set candidates: rows of `corpus` sharing a bucket with rows of
    * `probes` in any table, as (`corpus_id`, `probe_id`, `n_tables`).
    * The semantic-decontamination / cross-snapshot shape: `probes` is the
    * SMALL side (an eval suite, a delta batch) and `corpus` the 100 TB
    * side. The bucket-size cap applies to the CORPUS side only — hub
    * buckets there are what blow up fan-out, while capping the probe side
    * would silently drop the very queries the caller asked about. The
    * probe bucket table is tiny and broadcasts; the corpus is bucketed in
    * one linear pass and never self-joined. */
  def candidatesAcross(corpus: DataFrame, probes: DataFrame,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       tables: Int = 4, bits: Int = 16,
                       maxBucket: Int = 128): DataFrame = {
    val kept = capHubs(keyedBuckets(corpus, idCol, vecCol, tables, bits), maxBucket)
    kept.select(col("tbl"), col("bucket"), col(idCol).as("corpus_id"))
      .join(broadcast(keyedBuckets(probes, idCol, vecCol, tables, bits)
        .select(col("tbl"), col("bucket"), col(idCol).as("probe_id"))),
        Seq("tbl", "bucket"))
      // row-local self-pair guard: overlapping corpus/probe id spaces
      // would otherwise emit (x, x) as a perfect "hit" — same policy as
      // [[MinHashLsh.candidatesAcross]]
      .filter(col("corpus_id") =!= col("probe_id"))
      .groupBy("corpus_id", "probe_id")
      .agg(countDistinct("tbl").as("n_tables"))
  }
}
