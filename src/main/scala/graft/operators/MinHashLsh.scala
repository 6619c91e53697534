package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate candidate generation — the
  * 100 TB-scale extension of the reference's exact-id dedup
  * (reference: src/transformer/data_quality.py:57-62 dedups ids only).
  *
  * Scale design:
  *   - Signatures are a pure NARROW map: the codegen'd
  *     [[graft.functions.MinHashSig]] expression computes all four
  *     components per row in one pass, so signature building has no
  *     exchange at all (the explode → groupBy(min) formulation shuffles
  *     one row per shingle — the pipeline's largest shuffle for nothing
  *     but a per-doc min).
  *   - ONE md5 per shingle is split into four 8-hex-char components (the
  *     split-a-wide-hash trick) instead of four salted hashes — 4× less
  *     hashing on both the engine and the oracle side.
  *   - Banding is 2 bands × 2 components (OR-of-ANDs): a pair is a
  *     candidate iff it agrees on BOTH components of EITHER band. A
  *     single-component band would bucket every doc sharing one
  *     boilerplate min-shingle; requiring two simultaneous component
  *     matches shrinks false-positive buckets quadratically at equal
  *     recall for truly-similar (≥ ~0.7 Jaccard) pairs.
  *   - Skew cap: band buckets larger than `maxBucket` are DROPPED before
  *     pairing. One shared boilerplate shingle ⇒ one mega-bucket ⇒
  *     quadratic pair fan-out on a skewed key; an oversized bucket is
  *     boilerplate by construction and carries no near-dup signal. The
  *     size probe is a groupBy count — map-side partial aggregation makes
  *     it skew-safe — and the bucket list stays distributed (it is linear
  *     in corpus size, NOT broadcastable at 100 TB).
  */
object MinHashLsh {

  /** All word-bigram shingles of a text column — the codegen'd
    * [[graft.functions.WordBigrams]] expression (an interpreted
    * higher-order `transform` lambda here was measured 5-10× slower in
    * the signature hot loop). 0/1-token docs yield an empty array. */
  def bigramsAll(text: Column): Column = graft.functions.WordBigrams(text)

  /** Distinct shingle set (for set-cardinality math like Jaccard). */
  def bigrams(text: Column): Column = array_distinct(bigramsAll(text))

  /** k=4 MinHash signature per id: `idCol, mh1..mh4` — shuffle-free (see
    * scale notes). Docs with no bigrams (empty/one-token text) produce
    * no signature row. */
  def signatures(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol), graft.functions.MinHashSig(col(textCol)).as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col(idCol) +:
        (1 to 4).map(j => element_at(col("__sig"), j).as(s"mh$j")): _*)

  /** One row per (band, doc): band 1 keys on mh1||mh2, band 2 on mh3||mh4.
    * Single-pass: one explode of 2 (band, bk) structs per signature row —
    * a narrow generate over ONE scan of `sigs`, where the union-of-2
    * formulation read the (often checkpointed) signature relation once
    * per band. */
  private def banded(sigs: DataFrame, idCol: String): DataFrame = {
    val base = sigs.select(col(idCol) +: (1 to 4).map(j => col(s"mh$j")): _*)
    base.select((col(idCol) +: (1 to 4).map(j => col(s"mh$j"))) :+
      explode(array(
        struct(lit(1).as("band"), concat(col("mh1"), col("mh2")).as("bk")),
        struct(lit(2).as("band"), concat(col("mh3"), col("mh4")).as("bk")))).as("bb"): _*)
      .select((Seq(col(idCol)) ++ (1 to 4).map(j => col(s"mh$j")) ++
        Seq(col("bb.band").as("band"), col("bb.bk").as("bk"))): _*)
  }

  /** Drop banded rows in buckets larger than `maxBucket` (the skew cap —
    * see scale notes). The size probe is a partial-aggregated count. */
  private def capBuckets(bd: DataFrame, maxBucket: Int): DataFrame = {
    val small = bd.groupBy("band", "bk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select("band", "bk")
    bd.join(small, Seq("band", "bk"))
  }

  /** Join-side projection: id + components prefixed `p` under the bucket key. */
  private def side(df: DataFrame, idCol: String, p: String): DataFrame =
    df.select(
      Seq(col("band"), col("bk"), col(idCol).as(s"${p}_id")) ++
        (1 to 4).map(j => col(s"mh$j").as(s"${p}_mh$j")): _*)

  /** Signature-agreement score for a joined a/b pair — ∈ 2..4 (bucket
    * collision guarantees the band's two components already match). */
  private val sigScore: Column = (1 to 4)
    .map(j => when(col(s"a_mh$j") === col(s"b_mh$j"), 1).otherwise(0))
    .reduce(_ + _)

  /** Candidate pairs (`doc_a` < `doc_b`, deduped across bands) with the
    * signature-agreement score `n_sig_match` ∈ 2..4. Buckets larger than
    * `maxBucket` contribute no pairs (see scale notes above). */
  def candidates(sigs: DataFrame, idCol: String = "doc_id",
                 maxBucket: Int = 64): DataFrame = {
    val kept = capBuckets(banded(sigs, idCol), maxBucket)
    side(kept, idCol, "a").join(side(kept, idCol, "b"), Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        sigScore.as("n_sig_match"))
      .distinct()
  }

  /** Cross-set candidates — the incremental-index path: each PROBE
    * signature (a new crawl batch) keys into the INDEX's banded buckets
    * (the signatures already stored for the existing corpus), yielding
    * `(probe_id, index_id, n_sig_match)` without ever re-pairing
    * index-vs-index. The size cap applies to INDEX buckets only
    * (an oversized index bucket is boilerplate; capping the probe side
    * would silently drop the very batch being screened — same policy as
    * [[AnnLsh.candidatesAcross]]). Overlapping probe/index id spaces are
    * tolerated: a row-local `probe_id != index_id` guard drops the
    * self-pairs (which would otherwise surface as perfect
    * n_sig_match=4 "duplicates" and make downstream dedup delete the
    * very documents it was screening). */
  def candidatesAcross(probeSigs: DataFrame, indexSigs: DataFrame,
                       idCol: String = "doc_id", maxBucket: Int = 64): DataFrame = {
    val pb = banded(probeSigs, idCol)
    val ib = capBuckets(banded(indexSigs, idCol), maxBucket)
    side(pb, idCol, "a").join(side(ib, idCol, "b"), Seq("band", "bk"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id").as("probe_id"), col("b_id").as("index_id"),
        sigScore.as("n_sig_match"))
      .distinct()
  }
}
