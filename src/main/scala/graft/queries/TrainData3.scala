package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfFlat, PqAdc}
import graft.sources.ModelRegistry

/** Round-12 frontier queries: the UNIGRAM-LM tokenizer family —
  * the SentencePiece-style counterpart of the BPE family (q82/q88/q89/
  * q163), completing the two tokenizer designs real pipelines train.
  *
  * Reference context: the reference pipeline counts whitespace tokens
  * (`transform_hashtag_data.py`'s text statistics); a training-data
  * engine needs trained-subword counts, and unigram-LM is the second of
  * the two dominant trainers (Kudo 2018). BPE grows a vocabulary bottom-
  * up by merging; unigram starts from a LARGE candidate set and keeps
  * the pieces that best explain the corpus under a unigram language
  * model, segmenting each word by Viterbi.
  *
  * Determinism contract (what makes this hash-gatable against DuckDB):
  *   - The LM objective is replaced by an exact integer surrogate:
  *     cost(piece) = lg2e10(total + 1) − lg2e10(cnt + 1), a fixed-point
  *     piecewise-linear −log2 p(piece) in 1/1024 units, built ONLY from
  *     the floor-log2 bin-length idiom (`length(bin(x)) − 1`, exact in
  *     both engines — the q156/q158 primitive) plus integer shifts.
  *   - Viterbi is a DP over word positions maximizing the packed key
  *     −(Σcost·2^29 + npieces·2^24 + boundaryMask) — cost first, then
  *     fewer pieces, then the earliest-boundary mask as a total
  *     tie-break, all in one int64 (bounds: Σcost < 2^20 at 12 pieces ×
  *     2^16 max cost, npieces·2^24 < 2^29, mask < 2^24 at UniMaxW=12,
  *     so the fields never bleed). The optimal path is UNIQUE: equal
  *     masks force equal boundaries force equal pieces.
  *   - Hard-EM (Viterbi-EM): segment under the seed costs, recount,
  *     rescore, segment again — each recount is a pure integer census,
  *     so the trained vocabulary is a value both engines derive
  *     identically (the kmTrainCtes / pqTrainCtes unroll discipline;
  *     the oracle replays seed census → DP → recount → DP in full).
  *
  * Scale design: the corpus collapses ONCE to the weighted word
  * vocabulary (w, f) — after that every EM step is vocab-sized (the
  * map-reduce BPE argument: at 100 TB the vocab is MBs, the corpus TBs).
  * The Viterbi DP is a ROW-LOCAL codegen'd `aggregate` fold per word
  * (the q82 array-fold pattern), never a per-position shuffle; the
  * trained per-word piece counts ride a vocab-sized broadcast onto the
  * one tokenize scan (q163's transport). Driver-side state is bounded:
  * the alphabet census, the UniMultiCap multi-char candidates, and the
  * ≤vocab-sized recount — model state, never data.
  */
object TrainData3 {
  import graft.engine.Tables

  // ── unigram-LM parameters ──
  /** Longest candidate piece, in characters. */
  private val UniMaxPiece = 4
  /** DP unroll bound: words longer than this segment as single chars
    * (both engines apply the identical fallback; the oracle's DP is a
    * fixed UniMaxW-step CTE chain and cannot recurse). */
  private val UniMaxW = 12
  /** Multi-character candidate budget of the seed vocabulary (single
    * chars are always kept for coverage). */
  private val UniMultiCap = 24
  /** Multi-piece budget AFTER the pruning round (q171) — deliberately
    * half of UniMultiCap so pruning genuinely bites at every gated SF. */
  private[graft] val UniPruneKeep = 12
  /** Field multipliers of the packed DP key (see the scaladoc bounds). */
  private val KeyCost = 536870912L // 2^29
  private val KeyPiece = 16777216L // 2^24

  /** Fixed-point piecewise-linear log2 in 1/1024 units: e·1024 +
    * (x·1024 >> e) − 1024 with e = floor(log2 x) — the driver-side
    * mirror of the SQL `length(bin(x)) − 1` idiom (x ≥ 1). */
  private def lg2e10(x: Long): Long = {
    require(x >= 1, s"lg2e10: x=$x must be >= 1")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    e * 1024L + ((x * 1024L) >> e) - 1024L
  }

  /** The same quantity as a DuckDB expression over BIGINT expr `x`. */
  private def lg2e10Sql(x: String): String =
    s"((length(bin($x)) - 1) * 1024 + (($x * 1024) >> (length(bin($x)) - 1)) - 1024)"

  /** And as a Spark SQL expression (shiftright with a column amount is
    * only reachable through the SQL form, not the Column API). */
  private def lg2e10Expr(x: String): String =
    s"((length(bin($x)) - 1) * 1024 + " +
      s"shiftright(($x) * 1024, length(bin($x)) - 1) - 1024)"

  /** Weighted word vocabulary of the corpus — the ONE corpus collapse
    * every training/encode step reuses ((w, f), empty words included so
    * doc-grain joins never drop tokens). */
  private def uniWords(spark: SparkSession, dir: String): DataFrame =
    TrainData.docsParallel(spark, dir)
      .select(explode(TrainData.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** All substring candidates of length 1..UniMaxPiece, one element per
    * OCCURRENCE (the seed census weights by position count × word
    * frequency — Kudo's suffix-array seeding restricted to short
    * pieces). Row-local; empty words contribute nothing. */
  private def uniAllPieces(w: Column): Column =
    when(length(w) === 0, typedLit(Seq.empty[String])).otherwise(
      flatten(transform(sequence(lit(1), length(w)), s =>
        transform(sequence(lit(1), least(lit(UniMaxPiece), length(w) - s + 1)),
          l => w.substr(s, l)))))

  /** Viterbi segmentation of one word under piece-cost map `vocab`
    * (piece → integer cost). Single chars are ALWAYS usable — an
    * out-of-vocabulary char costs `oovCost` (= lg2e10(total+1), i.e.
    * count 0 under +1 smoothing) — so the DP is total for any word.
    * Words longer than UniMaxW fall back to single-char pieces, and the
    * empty word segments to [] (both rules mirrored by the oracle).
    *
    * Served by the native codegen'd [[graft.functions.UniSeg]] kernel:
    * the relational `aggregate` fold below ([[uniSegColRelational]],
    * kept as the oracle-shaped reference and spec-pinned value-equal by
    * UniSegSpec) is interpreted per element and re-copies its
    * array-of-structs accumulator per DP step — measured ~19 JVM-CPU
    * seconds per rep across the vocab-sized word list of each unigram
    * query at sf0.1 (q164/q171 cpuw ≈ 19); the kernel is the identical
    * packed-key DP as one compiled linear pass (the [[graft.functions
    * .BpeTokLen]] discipline applied to the second tokenizer family). */
  private[graft] def uniSegCol(w: Column, vocab: Map[String, Long],
                               oovCost: Long): Column = {
    require(vocab.nonEmpty, "unigram: empty vocabulary")
    graft.functions.UniSeg(w, vocab, oovCost, UniMaxPiece, UniMaxW,
      KeyCost, KeyPiece)
  }

  /** The DP as a row-local relational `aggregate` fold — the original
    * formulation [[uniSegCol]]'s kernel replaced in the hot path; the
    * accumulator is the array of best DP states for positions 0..i,
    * each a struct(key, seg), minimized by `array_min`'s struct order.
    * Kept because it IS the executable mirror of the oracle's CTE
    * unroll (uniDpCtes) and the reference UniSegSpec pins the kernel
    * against. */
  private[graft] def uniSegColRelational(w: Column, vocab: Map[String, Long],
                                         oovCost: Long): Column = {
    require(vocab.nonEmpty, "unigram: empty vocabulary")
    val vlit = typedLit(vocab)
    val pow2 = typedLit((0 to UniMaxW).map(p => 1L << p))
    val zero = array(struct(lit(0L).as("key"),
      typedLit(Seq.empty[String]).as("seg")))
    val dp = aggregate(
      sequence(lit(1), length(w)), zero,
      (acc, i) => {
        val cands = (1 to UniMaxPiece).map { j =>
          val start = i - lit(j) // piece = w[start+1 .. start+j], 1-based
          val piece = w.substr(start + 1, lit(j))
          val sc0 = try_element_at(vlit, piece)
          val sc = if (j == 1) coalesce(sc0, lit(oovCost)) else sc0
          val prev = element_at(acc, start + 1)
          val mask = when(start > 0, element_at(pow2, start + 1))
            .otherwise(lit(0L))
          // outer guard FIRST: for i < j the piece/prev expressions
          // index out of range (ANSI errors) — CaseWhen's lazy branch
          // evaluation is the safety here, so the index guard must be
          // its own when, not one conjunct among others
          when(i >= lit(j),
            when(sc.isNotNull,
              struct(
                (prev.getField("key") + sc * lit(KeyCost) + lit(KeyPiece)
                  + mask).as("key"),
                concat(prev.getField("seg"), array(piece)).as("seg"))))
        }
        // minimize the packed key; ties (impossible — the mask field is
        // injective on boundary sets) would break to the smaller seg,
        // matching the oracle's ORDER BY key, seg
        concat(acc, array(array_min(filter(array(cands: _*),
          c => c.isNotNull))))
      })
    when(length(w) === 0, typedLit(Seq.empty[String]))
      .when(length(w) > UniMaxW,
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))
      .otherwise(element_at(dp, length(w) + 1).getField("seg"))
  }

  /** The trained unigram model: hard-EM round 1 — seed census (all
    * single chars + top-UniMultiCap multi-char substrings by count),
    * Viterbi-segment the word vocabulary under the seed costs, recount,
    * rescore. Returns (piece → cost, oovCost) — bounded model state,
    * memoized per data directory like the PQ/IVF models ([[FrozenModels]]:
    * the model is a pure function of the corpus and the pinned caps). */
  private[graft] def uniModel(spark: SparkSession, dir: String): (Map[String, Long], Long) =
    FrozenModels.memoGen(s"unigram-model|$dir",
        FrozenModels.fingerprint(s"$dir/documents.parquet")) {
      uniModelFromWords(uniWords(spark, dir).localCheckpoint(false))
    }

  /** Cost model from a use-count census: +1-smoothed fixed-point
    * −log2 p per piece, plus the OOV single-char cost (count 0). */
  private def uniCostsOf(counts: Seq[(String, Long)]): (Map[String, Long], Long) = {
    val tot = counts.map(_._2).sum
    val oov = lg2e10(tot + 1)
    (counts.map { case (p, c) => p -> (oov - lg2e10(c + 1)) }.toMap, oov)
  }

  /** Viterbi use-count census of `words` under model (vocab, oov) — the
    * hard-EM recount both the rescore and the prune consume. Bounded:
    * only vocab pieces and OOV single chars can appear. */
  private def uniUseCensus(words: DataFrame, vocab: Map[String, Long],
                           oov: Long): Seq[(String, Long)] =
    words.withColumn("seg", uniSegCol(col("w"), vocab, oov))
      .select(col("f"), explode(col("seg")).as("piece"))
      .groupBy("piece").agg(sum("f").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Round-1 use census: seed vocab (all single chars + top-UniMultiCap
    * multi-char substrings by occurrence count), one Viterbi-EM
    * recount — shared by the plain trainer and the pruning round. */
  private def uniCounts1(words: DataFrame): Seq[(String, Long)] = {
    val cnt0 = words
      .select(col("f"), explode(uniAllPieces(col("w"))).as("piece"))
      .groupBy("piece").agg(sum("f").as("cnt"))
      .localCheckpoint(false) // consumed twice (singles + top-multi cut)
    val singles = cnt0.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = cnt0.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(UniMultiCap)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val (v0, oov0) = uniCostsOf((singles ++ multi).toSeq)
    // hard-EM recount: pieces actually used, weighted by word freq
    uniUseCensus(words, v0, oov0)
  }

  /** The training body over an explicit word relation `words(w, f)` —
    * split out so specs can train on planted corpora. */
  private[graft] def uniModelFromWords(words: DataFrame): (Map[String, Long], Long) =
    uniCostsOf(uniCounts1(words))

  /** UTF-8 byte order — what Spark's UTF8String comparison and DuckDB's
    * binary collation both implement. Java String.compareTo is UTF-16
    * code-unit order, which diverges above the BMP, so a DRIVER-side
    * tie-break must not use it (the relational cuts get this ordering
    * for free from the engines); delegate to the engine's own class
    * rather than hand-rolling the byte loop. */
  private def utf8Less(a: String, b: String): Boolean = {
    import org.apache.spark.unsafe.types.UTF8String
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
  }

  /** Code-point length — the character grain Spark's `length()` and
    * DuckDB's `len()` share; Java String.length counts UTF-16 units and
    * would misclassify a supplementary-plane piece as multi-char. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** One vocabulary-PRUNING round on top of the hard-EM trainer — the
    * SentencePiece shrink step: real unigram training alternates EM
    * with pruning toward a target size, dropping the pieces whose
    * removal least raises corpus cost. Under a hard-EM (Viterbi) model
    * that contribution is the piece's USE-MASS — an unused piece costs
    * nothing to drop, a heavily-used one forces its mass onto longer
    * segmentations — so the prune ranks the round-1 multis by Viterbi
    * use-mass (ties → UTF-8 byte order, both engines' collation) and
    * keeps the top [[UniPruneKeep]]; single chars are always kept for
    * coverage (pruning one would strand its words on the OOV cost).
    * Costs are rescored on the kept mass, exactly [[uniCostsOf]].
    *
    * Scale: the prune input is the COLLECTED round-1 census — bounded
    * at |alphabet| + UniMultiCap entries by the seed caps — so the
    * prune itself is pure driver math over vocab-sized state; no extra
    * corpus scan vs the unpruned trainer ([[uniCounts1]] is shared). */
  private[graft] def uniModelPrunedFromWords(words: DataFrame): (Map[String, Long], Long) = {
    val c1 = uniCounts1(words)
    // single/multi split at CODE-POINT grain (cpLen): the oracle's
    // len(piece) = 1 keeps a supplementary-plane single as coverage,
    // and a Java-length split would instead throw it into the prune pool
    val kept = c1.filter(p => cpLen(p._1) == 1) ++
      c1.filter(p => cpLen(p._1) >= 2)
        .sortWith { (a, b) =>
          if (a._2 != b._2) a._2 > b._2 else utf8Less(a._1, b._1)
        }
        .take(UniPruneKeep)
    uniCostsOf(kept)
  }

  /** [[uniModelPrunedFromWords]] memoized per data directory like
    * [[uniModel]]. */
  private[graft] def uniModelPruned(spark: SparkSession, dir: String): (Map[String, Long], Long) =
    FrozenModels.memoGen(s"unigram-pruned|$dir",
        FrozenModels.fingerprint(s"$dir/documents.parquet")) {
      uniModelPrunedFromWords(uniWords(spark, dir).localCheckpoint(false))
    }

  // ── q164: unigram-LM tokenizer TRAINING census — the final vocab's
  // use counts after the hard-EM round (the readout a vocab build
  // persists: which pieces survived and how much corpus mass each
  // carries). The oracle replays the ENTIRE lifecycle — seed substring
  // census, candidate cut, Viterbi DP (a UniMaxW-step CTE unroll
  // carrying the packed integer key and the piece list), recount,
  // rescore, second Viterbi pass, final census — so a drift anywhere in
  // the integer cost model or the DP tie-breaks fails the gate. ──
  private def q164(spark: SparkSession, dir: String): DataFrame = {
    val (vocab, oov) = uniModel(spark, dir)
    uniWords(spark, dir)
      .withColumn("seg", uniSegCol(col("w"), vocab, oov))
      .select(col("f"), explode(col("seg")).as("piece"))
      .groupBy("piece").agg(sum("f").as("n_uses"))
      .orderBy(col("n_uses").desc, col("piece")).limit(25)
  }

  /** The Viterbi DP as a DuckDB CTE chain: `${p}b$i` = best state at
    * position i for every word with len ≥ i (packed key + piece list),
    * each step a ≤UniMaxPiece-way UNION of joins against vocab CTE
    * `$vocab(piece, cost)`; `${p}seg` = the final segmentation per word
    * incl. the >UniMaxW / empty fallbacks. `$oov` must be a 1-row CTE
    * (cost) giving the OOV single-char cost. */
  private def uniDpCtes(vocab: String, oov: String, src: String, p: String): String = {
    val steps = (1 to UniMaxW).map { i =>
      val branches = (1 to math.min(UniMaxPiece, i)).map { j =>
        val start = i - j
        val maskLit = if (start > 0) (1L << start).toString else "0"
        val joinKind = if (j == 1) "LEFT JOIN" else "JOIN"
        val costRef =
          if (j == 1) s"COALESCE(v.cost, (SELECT cost FROM $oov))" else "v.cost"
        s"""SELECT b.w, b.f,
          |        b.key + $costRef * $KeyCost + $KeyPiece + $maskLit AS key,
          |        list_append(b.seg, substr(b.w, ${start + 1}, $j)) AS seg
          |      FROM ${p}b$start b $joinKind $vocab v
          |        ON v.piece = substr(b.w, ${start + 1}, $j)
          |      WHERE len(b.w) >= $i""".stripMargin
      }.mkString("\n      UNION ALL\n      ")
      s"""${p}b$i AS MATERIALIZED (
        |  SELECT w, f, key, seg FROM (
        |    SELECT w, f, key, seg,
        |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY key, seg) AS rn
        |    FROM (
        |      $branches))
        |  WHERE rn = 1)""".stripMargin
    }
    val finals = (1 to UniMaxW)
      .map(i => s"  SELECT w, f, seg FROM ${p}b$i WHERE len(w) = $i")
      .mkString("\n  UNION ALL\n")
    s"""${p}b0 AS MATERIALIZED (
      |  SELECT w, f, CAST(0 AS BIGINT) AS key, CAST([] AS VARCHAR[]) AS seg
      |  FROM $src WHERE len(w) >= 1 AND len(w) <= $UniMaxW),
      |${steps.mkString(",\n")},
      |${p}seg AS MATERIALIZED (
      |$finals
      |  UNION ALL
      |  SELECT w, f, list_transform(range(1, len(w) + 1),
      |    i -> substr(w, CAST(i AS INT), 1)) AS seg
      |  FROM $src WHERE len(w) > $UniMaxW OR len(w) = 0)""".stripMargin
  }

  /** Shared trunk of the training unroll: corpus → words → seed census
    * → seed vocab (costs) → DP round 1 → recount. Leaves `uc1` (the
    * round-1 use census) for the rescore (q164/q165) and the prune
    * (q171) to branch on. */
  private def uniC1Ctes: String =
    s"""uw0 AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1),
      |ucand AS (SELECT f, unnest(flatten(list_transform(range(1, len(w) + 1),
      |    s -> list_transform(range(1, least($UniMaxPiece, len(w) - s + 1) + 1),
      |      l -> substr(w, CAST(s AS INT), CAST(l AS INT)))))) AS piece
      |  FROM uw0),
      |ucnt0 AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS cnt FROM ucand GROUP BY 1),
      |uv0pre AS (
      |  SELECT piece, cnt FROM ucnt0 WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (
      |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
      |    FROM ucnt0 WHERE len(piece) >= 2)
      |  WHERE rn <= $UniMultiCap),
      |uoov0 AS MATERIALIZED (SELECT ${lg2e10Sql("(t + 1)")} AS cost
      |  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM uv0pre)),
      |uv0 AS MATERIALIZED (SELECT piece,
      |    (SELECT cost FROM uoov0) - ${lg2e10Sql("(cnt + 1)")} AS cost
      |  FROM uv0pre),
      |${uniDpCtes("uv0", "uoov0", "uw0", "ur1")},
      |uc1 AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS cnt
      |  FROM (SELECT f, unnest(seg) AS piece FROM ur1seg) GROUP BY 1)""".stripMargin

  /** The full unpruned unroll: trunk + rescore on `uc1` + DP round 2.
    * Leaves `ur2seg` (w, f, seg) and `uc2` (final census). */
  private def uniTrainCtes: String =
    s"""$uniC1Ctes,
      |uoov1 AS MATERIALIZED (SELECT ${lg2e10Sql("(t + 1)")} AS cost
      |  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM uc1)),
      |uv1 AS MATERIALIZED (SELECT piece,
      |    (SELECT cost FROM uoov1) - ${lg2e10Sql("(cnt + 1)")} AS cost
      |  FROM uc1),
      |${uniDpCtes("uv1", "uoov1", "uw0", "ur2")},
      |uc2 AS (SELECT piece, CAST(SUM(f) AS BIGINT) AS n_uses
      |  FROM (SELECT f, unnest(seg) AS piece FROM ur2seg) GROUP BY 1)""".stripMargin

  /** The PRUNED unroll (q171): trunk + use-mass prune of `uc1` (singles
    * always kept, top-UniPruneKeep multis by cnt DESC, piece) + rescore
    * on the kept mass + DP round. Leaves `ucp` (the pruned census) —
    * the "one more stage" extension of the CTE discipline. */
  private def uniPrunedCtes: String =
    s"""$uniC1Ctes,
      |uv1ppre AS (
      |  SELECT piece, cnt FROM uc1 WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (
      |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
      |    FROM uc1 WHERE len(piece) >= 2)
      |  WHERE rn <= $UniPruneKeep),
      |uoov1p AS MATERIALIZED (SELECT ${lg2e10Sql("(t + 1)")} AS cost
      |  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM uv1ppre)),
      |uv1p AS MATERIALIZED (SELECT piece,
      |    (SELECT cost FROM uoov1p) - ${lg2e10Sql("(cnt + 1)")} AS cost
      |  FROM uv1ppre),
      |${uniDpCtes("uv1p", "uoov1p", "uw0", "urp")},
      |ucp AS (SELECT piece, CAST(SUM(f) AS BIGINT) AS n_uses
      |  FROM (SELECT f, unnest(seg) AS piece FROM urpseg) GROUP BY 1)""".stripMargin

  private val q164Sql =
    s"""WITH $uniTrainCtes
      |SELECT piece, n_uses FROM uc2
      |ORDER BY n_uses DESC, piece LIMIT 25""".stripMargin

  // ── q171: unigram vocabulary PRUNING round — q164's census under the
  // PRUNED model ([[uniModelPrunedFromWords]]): the round-1 multis are
  // ranked by Viterbi use-mass, only the top UniPruneKeep survive, and
  // the census re-runs the DP under the shrunk vocabulary. A prune that
  // ranked by RAW substring mass instead (the seed's ordering) would
  // keep different pieces and fail this gate — the spec additionally
  // plants a corpus where the two orderings disagree. ──
  private def q171(spark: SparkSession, dir: String): DataFrame = {
    val (vocab, oov) = uniModelPruned(spark, dir)
    uniWords(spark, dir)
      .withColumn("seg", uniSegCol(col("w"), vocab, oov))
      .select(col("f"), explode(col("seg")).as("piece"))
      .groupBy("piece").agg(sum("f").as("n_uses"))
      .orderBy(col("n_uses").desc, col("piece")).limit(25)
  }

  private val q171Sql =
    s"""WITH $uniPrunedCtes
      |SELECT piece, n_uses FROM ucp
      |ORDER BY n_uses DESC, piece LIMIT 25""".stripMargin

  // ── q165: per-doc unigram TOKENIZE — the doc-grain apply of the
  // trained model (q163's shape for the second tokenizer family): a
  // doc's piece count is the sum over its words of the word's Viterbi
  // piece count, because segmentation never crosses word boundaries.
  // The corpus is touched twice total (collapse + tokenize); the
  // per-word lengths ride a vocab-sized broadcast. Output: top-20 docs
  // by trained piece count with whitespace tokens and fertility
  // (pieces per 1000 whitespace tokens, integer per-mille). ──
  private def q165(spark: SparkSession, dir: String): DataFrame = {
    val (vocab, oov) = uniModel(spark, dir)
    val docs = TrainData.docsParallel(spark, dir)
      .select(col("doc_id"), col("text"))
    val vlen = uniWords(spark, dir)
      .withColumn("n_p", size(uniSegCol(col("w"), vocab, oov)).cast("long"))
      .select(col("w"), col("n_p"))
    docs.select(col("doc_id"), explode(TrainData.tokens(col("text"))).as("w"))
      .join(broadcast(vlen), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws_tok"), sum("n_p").as("uni_tok"))
      .withColumn("fertility_pm", expr("uni_tok * 1000 div ws_tok"))
      .orderBy(col("uni_tok").desc, col("doc_id")).limit(20)
  }

  private val q165Sql =
    s"""WITH $uniTrainCtes,
      |uvlen AS (SELECT w, CAST(len(seg) AS BIGINT) AS n_p FROM ur2seg),
      |udtok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |uper AS (
      |  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tok,
      |    CAST(SUM(v.n_p) AS BIGINT) AS uni_tok
      |  FROM udtok d JOIN uvlen v ON d.w = v.w GROUP BY 1)
      |SELECT doc_id, ws_tok, uni_tok,
      |  uni_tok * 1000 // ws_tok AS fertility_pm
      |FROM uper ORDER BY uni_tok DESC, doc_id LIMIT 20""".stripMargin

  // ── q166/q167: TRAINED quality classifier — hashed-bigram BERNOULLI
  // Naive Bayes (the fastText-shaped model every production curation
  // stack trains next to its heuristic filters; q27/q55 are the
  // heuristics, this LEARNS from their labels). Naive Bayes is chosen
  // deliberately: its training is CLOSED-FORM counting — no SGD, no
  // order-dependence — so the trained weights are a pure integer
  // function of the corpus and both engines derive them identically
  // (the same argument that makes the fixed-point Lloyd trainers
  // gateable). The BERNOULLI variant (per-bucket document frequency,
  // absent features carry weight too) is essential on this corpus: the
  // label boundary is q27's n_tok ≥ 30 tier cut, and a multinomial
  // occurrence model was measured to collapse to the majority class
  // (105/106 drop docs misclassified — every occurrence pushes toward
  // the bigger class when bigram CONTENT carries no class signal),
  // while presence/absence encodes exactly the density signal the
  // labels follow. Features: word bigrams hashed to NbBuckets buckets
  // via md5 nibbles (the q22/q152 hex→int primitive — Spark hash() and
  // DuckDB hash() differ, md5 is the shared hash); weights and priors
  // in lg2e10 units (+1 smoothing).
  //
  // Scoring algebra (what makes absent features O(present) to score):
  // margin = Σ_present A(b) + Σ_absent B(b) + prior, where
  //   A(b) = L(df_k+1) − L(df_d+1)            (presence log-odds delta)
  //   B(b) = L(n_k−df_k+1) − L(n_d−df_d+1)    (absence log-odds delta)
  // (the per-bucket −L(n_c+2) normalizers appear for every bucket in
  // both classes and fold into the bias). Rewriting
  // margin = Σ_present (A−B) + [Σ_all B + priorΔ], the bracket is a
  // MODEL CONSTANT — so a doc is scored by folding only its PRESENT
  // buckets (≤NbBuckets) over the literal weight array, plus one
  // literal bias ([[nbMarginCol]]). Scale: train = one corpus scan
  // into a 64-cell partial-agg census; score = one row-local scan
  // under the literal model; driver state = the 2-row class census
  // and the 64-cell model (bounded). ──
  private val NbBuckets = 64

  /** The NB trainer's census as ONE relation — per bucket the class-
    * conditional document frequencies (df_keep / df_drop), plus the
    * class census itself as cell b = −1 (df_keep = n_keep, df_drop =
    * n_drop). Every cell is a COUNTER, so merge = addition — the same
    * algebra as [[dsCensus]] — and the identical relation is both the
    * batch trainer's input and the streaming maintenance state
    * ([[graft.streaming.Streams.nbCensusCells]]): after any stream
    * prefix the running aggregation state equals this census of the
    * rows seen so far, and a model refresh is a ≤65-row read plus
    * [[nbModelFromCensus]]'s driver-side log math — no corpus re-scan.
    *
    * A NULL-text doc counts NOWHERE (NULL keep label, no features) —
    * exactly the oracle's WHERE keep / WHERE NOT keep census shape.
    * Bucket features ride the codegen'd [[graft.functions.HashBucketSet]]
    * kernel: the per-doc DISTINCT dedups in place, so ≤ NbBuckets rows
    * per doc leave the scan (a relational DISTINCT shuffles one row per
    * bigram OCCURRENCE; the HOF formulation pays an interpreted lambda
    * per bigram — both measured ~1 s of q167's wall at sf0.1). */
  private[graft] def nbCensus(docs: DataFrame): DataFrame =
    docs.select(col("text"),
        (size(TrainData.tokens(col("text"))) >= 30).as("keep"))
      .filter(col("keep").isNotNull)
      // ONE scan: each doc emits its class cell (-1) and its distinct
      // bucket set from the same row — a unionByName of two projections
      // here would scan (and tokenize/label) the corpus twice per
      // census build. Post-filter text is never NULL (keep is derived
      // from it), so the concat never NULLs out the class cell; a 0/1-
      // token doc emits [-1] alone (empty bucket set).
      .select(col("keep"),
        explode(concat(array(lit(-1L)), graft.functions.HashBucketSet(
          col("text"), "nb:", NbBuckets))).as("b"))
      .groupBy("b").agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("df_keep"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("df_drop"))

  /** The collected census: the NbBuckets-cell (df_keep, df_drop) spine
    * (unseen buckets 0 — ABSENCE carries weight in a Bernoulli model)
    * plus the class counts. Bounded driver model state; one distributed
    * job (census scan + 65-row readout). */
  private[graft] def nbCensusState(docs: DataFrame): (IndexedSeq[(Long, Long)], Long, Long) =
    nbStateFromCells(nbCensus(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap)

  /** Assemble (bucket spine, n_keep, n_drop) from a collected cell map —
    * the ONE place the b = −1 class-cell convention is decoded (shared
    * by the batch trainer, q176's refresh merge, and the streaming
    * twin's spec). */
  private[graft] def nbStateFromCells(cells: Map[Long, (Long, Long)]): (IndexedSeq[(Long, Long)], Long, Long) = {
    val (nk, nd) = cells.getOrElse(-1L, (0L, 0L))
    (IndexedSeq.tabulate(NbBuckets)(b => cells.getOrElse(b.toLong, (0L, 0L))),
      nk, nd)
  }

  /** [[nbCensusState]] memoized per data directory ([[FrozenModels]]) —
    * the census is a pure function of the corpus, so q166, q167 and
    * every bench rep share ONE training pass per process (the uniModel
    * discipline; previously each q166/q167 execution replayed the class
    * + feature census scans). */
  private[graft] def nbCensusDir(spark: SparkSession, dir: String): (IndexedSeq[(Long, Long)], Long, Long) =
    FrozenModels.memoGen(s"nb-census|$dir",
        FrozenModels.fingerprint(s"$dir/documents.parquet")) {
      nbCensusState(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    }

  /** The trained 65-value census rendered as the 64-row weight table:
    * per bucket the df counts and the A/B log-odds deltas (the scoring
    * algebra above) — pure driver math over the census, zero extra
    * scans. */
  private def nbWeightRows(census: (IndexedSeq[(Long, Long)], Long, Long)): Seq[(Long, Long, Long, Long, Long)] = {
    val (cells, nk, nd) = census
    cells.zipWithIndex.map { case ((dfk, dfd), b) =>
      (b.toLong, dfk, dfd,
        lg2e10(dfk + 1) - lg2e10(dfd + 1),
        lg2e10(nk - dfk + 1) - lg2e10(nd - dfd + 1))
    }
  }

  private def nbWeightsDf(spark: SparkSession,
                          census: (IndexedSeq[(Long, Long)], Long, Long)): DataFrame = {
    import spark.implicits._
    nbWeightRows(census)
      .toDF("b", "df_keep", "df_drop", "w_present", "w_absent")
  }

  /** The trained 64-row weight table from a corpus (spec entry point —
    * the gated path goes through [[nbCensusDir]]). */
  private[graft] def nbWeights(docs: DataFrame): DataFrame =
    nbWeightsDf(docs.sparkSession, nbCensusState(docs))

  private def q166(spark: SparkSession, dir: String): DataFrame =
    nbWeightsDf(spark, nbCensusDir(spark, dir)).orderBy("b")

  /** Shared oracle CTEs: `nbf` (distinct present buckets per doc),
    * `nbc` (df census on the full bucket spine), `nbw` (the model). */
  private def nbTrainCtesSql: String = {
    val compose = (0 until 8).map(n =>
      s"(instr('0123456789abcdef', substr(__h, ${n + 1}, 1)) - 1)" +
        s" * ${1L << (4 * n)}").mkString(" + ")
    s"""nblab AS MATERIALIZED (
      |  SELECT doc_id, len(string_split(text, ' ')) >= 30 AS keep
      |  FROM documents),
      |nbf AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, keep, ($compose) % $NbBuckets AS b FROM (
      |    SELECT doc_id, keep, md5('nb:' || g) AS __h FROM (
      |      SELECT doc_id, len(t) >= 30 AS keep,
      |        unnest(list_transform(range(1, len(t)),
      |          i -> t[i] || ' ' || t[i + 1])) AS g
      |      FROM (SELECT doc_id, string_split(text, ' ') AS t
      |            FROM documents)))),
      |nbc AS MATERIALIZED (
      |  SELECT s.b,
      |    COALESCE(d.dfk, 0) AS df_keep, COALESCE(d.dfd, 0) AS df_drop
      |  FROM (SELECT unnest(range(0, $NbBuckets)) AS b) s
      |  LEFT JOIN (
      |    SELECT b,
      |      CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS dfk,
      |      CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS dfd
      |    FROM nbf GROUP BY 1) d ON s.b = d.b),
      |nbn AS MATERIALIZED (
      |  SELECT
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nblab WHERE keep) AS nk,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nblab WHERE NOT keep) AS nd),
      |nbw AS MATERIALIZED (
      |  SELECT b, df_keep, df_drop,
      |    ${lg2e10Sql("(df_keep + 1)")} - ${lg2e10Sql("(df_drop + 1)")}
      |      AS w_present,
      |    ${lg2e10Sql("((SELECT nk FROM nbn) - df_keep + 1)")} -
      |      ${lg2e10Sql("((SELECT nd FROM nbn) - df_drop + 1)")} AS w_absent
      |  FROM nbc)""".stripMargin
  }

  private val q166Sql =
    s"""WITH $nbTrainCtesSql
      |SELECT b, df_keep, df_drop, w_present, w_absent FROM nbw
      |ORDER BY b""".stripMargin

  /** The frozen 64-cell scoring model as driver-side state for the
    * streaming twin ([[graft.streaming.Streams.nbScoreFilter]]) and
    * specs: `weights(b) = w_present(b) − w_absent(b)` (the per-PRESENT-
    * bucket margin delta) plus the model-constant bias (see the scoring
    * algebra at the section header). Bounded: NbBuckets longs + one
    * scalar — the IvfFlat-centroid transport contract. */
  private[graft] def nbModel(docs: DataFrame): (IndexedSeq[Long], Long) =
    nbModelFromCensus(nbCensusState(docs))

  /** The scoring model as driver math over a collected census — the
    * 65-row state ([[nbCensusState]] / the streaming maintenance cells)
    * is all a refresh needs. */
  private[graft] def nbModelFromCensus(census: (IndexedSeq[(Long, Long)], Long, Long)): (IndexedSeq[Long], Long) = {
    val (_, nk, nd) = census
    val rows = nbWeightRows(census)
    val wArr = rows.map(r => r._4 - r._5).toIndexedSeq
    val sumAbsent = rows.map(_._5).sum
    // bias = ΣB + priorΔ + C, where C = NbBuckets·(L(n_d+2) − L(n_k+2))
    // is the per-bucket Bernoulli normalizer −L(n_c+2) that every bucket
    // contributes in BOTH classes regardless of presence — dropping it
    // was measured to collapse the classifier to all-keep (the keep
    // class's bigger n made every per-bucket likelihood look larger)
    val bias = sumAbsent + lg2e10(nk + 1) - lg2e10(nd + 1) +
      NbBuckets * (lg2e10(nd + 2) - lg2e10(nk + 2))
    (wArr, bias)
  }

  /** The scoring column under a FROZEN model: margin = bias +
    * Σ_{b ∈ present buckets} weights(b), as one row-local fold over the
    * [[graft.functions.HashBucketSet]] kernel's ≤NbBuckets-element
    * per-doc bucket set. Shared VERBATIM by the batch scorer
    * ([[nbDocMargins]]) and the streaming gate
    * ([[graft.streaming.Streams.nbScoreFilter]]) — one kernel, two
    * deployment shapes. */
  private[graft] def nbMarginCol(text: Column, weights: IndexedSeq[Long],
                                 bias: Long): Column = {
    require(weights.size == NbBuckets,
      s"nb_margin: expected $NbBuckets weights, got ${weights.size}")
    aggregate(
      graft.functions.HashBucketSet(text, "nb:", NbBuckets),
      lit(bias),
      (acc, b) => acc + element_at(typedLit(weights), (b + lit(1L)).cast("int")))
  }

  /** Per-doc (doc_id, keep, margin) scoring relation — split out of
    * [[nbConfusion]] so the streaming twin's spec can pin per-doc batch
    * equality, not just the census. Two-phase by design: TRAIN collects
    * the bounded model ([[nbModel]] — 64 cells + bias, one feature pass
    * + one labeled pass), then SCORE is a single row-local scan under
    * the literal model ([[nbMarginCol]]) — no feature checkpoint, no
    * margin shuffle, no join; the previous feats-join formulation
    * measured 2.1 s vs 1.2 s at sf0.1. A doc with no bigrams folds to
    * margin = bias (the empty bucket set), exactly the old
    * `coalesce(mp, 0) + bias`. */
  private[graft] def nbDocMargins(docs: DataFrame): DataFrame =
    nbDocMargins(docs, nbModel(docs))

  /** [[nbDocMargins]] under an already-trained (possibly memoized)
    * model — the gated q167 path passes [[nbCensusDir]]'s model so the
    * census never retrains per execution. */
  private[graft] def nbDocMargins(docs: DataFrame,
                                  model: (IndexedSeq[Long], Long)): DataFrame = {
    val (weights, bias) = model
    docs.select(col("doc_id"),
      (size(TrainData.tokens(col("text"))) >= 30).as("keep"),
      // NULL text folds to NULL; the oracle's LEFT JOIN + COALESCE
      // shape scores such a doc at exactly `bias` — mirror it or the
      // engines diverge on the pred group key the day a corpus carries
      // a NULL (keep stays NULL in BOTH engines: len(NULL) is NULL)
      coalesce(nbMarginCol(col("text"), weights, bias), lit(bias)).as("m"))
  }

  /** Score every doc against the trained model and compare to its own
    * heuristic label (train-set fit) — the confusion census over
    * [[nbDocMargins]]; pred = margin ≥ 0 (tie → keep). */
  private[graft] def nbConfusion(docs: DataFrame): DataFrame =
    nbConfusion(docs, nbModel(docs))

  private[graft] def nbConfusion(docs: DataFrame,
                                 model: (IndexedSeq[Long], Long)): DataFrame =
    nbDocMargins(docs, model)
      .select(col("keep").as("label_keep"), col("m"))
      .withColumn("pred_keep", col("m") >= 0)
      .groupBy("label_keep", "pred_keep")
      .agg(count(lit(1)).as("n_docs"), sum("m").as("margin_sum"))
      .orderBy("label_keep", "pred_keep")

  private def q167(spark: SparkSession, dir: String): DataFrame =
    nbConfusion(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      nbModelFromCensus(nbCensusDir(spark, dir)))

  private val q167Sql =
    s"""WITH $nbTrainCtesSql,
      |bias AS (SELECT
      |    (SELECT CAST(SUM(w_absent) AS BIGINT) FROM nbw) +
      |    ${lg2e10Sql("((SELECT nk FROM nbn) + 1)")} -
      |    ${lg2e10Sql("((SELECT nd FROM nbn) + 1)")} +
      |    $NbBuckets * (${lg2e10Sql("((SELECT nd FROM nbn) + 2)")} -
      |      ${lg2e10Sql("((SELECT nk FROM nbn) + 2)")}) AS v),
      |marg AS (
      |  SELECT f.doc_id,
      |    CAST(SUM(w.w_present - w.w_absent) AS BIGINT) AS mp
      |  FROM nbf f JOIN nbw w ON f.b = w.b GROUP BY 1)
      |SELECT l.keep AS label_keep,
      |  COALESCE(m.mp, 0) + (SELECT v FROM bias) >= 0 AS pred_keep,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(COALESCE(m.mp, 0) + (SELECT v FROM bias)) AS BIGINT)
      |    AS margin_sum
      |FROM nblab l LEFT JOIN marg m ON l.doc_id = m.doc_id
      |GROUP BY 1, 2 ORDER BY label_keep, pred_keep""".stripMargin

  // ── q168: ANN index PERSISTENCE round-trip — the Writers discipline
  // (q146–q150) applied to the IVFADC index: WRITE the trained index as
  // tables (PQ codes + re-rank vectors, the M×K codebooks, the coarse
  // centroids — exactly the artifacts a FAISS-style build persists),
  // RELOAD them from parquet, and SERVE the q151 probe set from the
  // reloaded artifacts alone. The gated output is the top-k rank list,
  // which the oracle derives from the immutable inputs by replaying
  // train→encode→search (the shared ivfadcSearchCtes front) WITHOUT the
  // filesystem — so any corruption anywhere in the write/read path
  // (float round-trip, code arrays, model table reconstruction) breaks
  // the hash gate, and WritersSpec pins reload ≡ rebuild table-by-table.
  // Scale: the persisted layout is the real one (codes+vectors at rest,
  // model tables tiny); the reload collects ONLY the model tables
  // (M×K×subDim + K×dim — bounded model state), never the codes. ──
  private def q168(spark: SparkSession, dir: String): DataFrame =
    Writers.withTempDir("graft_q168_") { lake =>
      val sp = spark
      import sp.implicits._
      // scan-given parallelism, NOT embParallel: the encode here is a
      // trivial row-local projection feeding a WRITE, so the round-robin
      // spread exchange bought nothing and its 32 near-empty partitions
      // landed as 32 tiny files per codes leg (32 task commits at write,
      // 32 footers at every reload — guide §6 small-file debt); at scale
      // the scan's own splits carry the parallelism
      val corpus = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val cents = TrainData.trainedCentroids(spark, dir)
      val codebooks = TrainData2.frozenCodebooks(spark, dir)
      // PUBLISH through the registry: the data-sized leg (codes +
      // vectors) and the model tables, one generation, manifest row per
      // table carrying the source-data fingerprint
      val reg = new ModelRegistry(spark, lake)
      reg.publish("ivfadc", 1,
        FrozenModels.fingerprint(s"$dir/embeddings.parquet"), Map(
          "codes" -> PqAdc.encode(IvfFlat.assign(corpus, cents), codebooks,
              TrainData2.PqSub)
            .select("vec_id", "embedding", "cluster", "codes"),
          "codebooks" -> codebooks.zipWithIndex.flatMap { case (cb, m) =>
            cb.zipWithIndex.map { case (cw, k) => (m, k + 1, cw.toSeq) }
          }.toDF("m", "code", "cv").coalesce(1),
          "centroids" -> cents.zipWithIndex
            .map { case (cv, i) => (i + 1, cv.toSeq) }
            .toDF("cid", "cv").coalesce(1)))
      // RELOAD through the ONE registry load path: codes stay
      // distributed; model tables come back as driver-side state (the
      // same shape the in-memory build uses)
      val rCodes = reg.load("ivfadc", 1, "codes")
      val rCbs: Seq[Seq[Array[Double]]] = reg.load("ivfadc", 1, "codebooks")
        .orderBy("m", "code").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toSeq)
      val rCents: Seq[Array[Float]] = reg.load("ivfadc", 1, "centroids")
        .orderBy("cid").collect()
        .map(_.getSeq[Float](1).toArray).toSeq
      val probes = graft.engine.Tables.embeddings(spark, dir)
        .filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      PqAdc.search(rCodes, probes, rCents, rCbs, TrainData2.PqSub,
          nprobe = TrainData.IvfNprobe, shortlist = TrainData2.AdcShortlist,
          k = TrainData.IvfTopK)
        .select(col("probe_id"), col("cand_id"), col("rk"))
        .orderBy("probe_id", "rk").localCheckpoint()
    }

  private val q168Sql =
    s"""WITH ${TrainData2.ivfadcSearchCtes},
      |ranked AS (
      |  SELECT probe_id, cand_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY cosine DESC, cand_id) AS INT) AS rk
      |  FROM rescored)
      |SELECT probe_id, cand_id, rk FROM ranked
      |WHERE rk <= ${TrainData.IvfTopK}
      |ORDER BY probe_id, rk""".stripMargin

  // ── q172: the COMPOSED persisted-index lifecycle — persist → reload
  // → append → persist → serve, the production loop q162 (in-memory
  // append) and q168 (persist + serve) each exercise half of. The
  // gen-1 index (q168's layout: codes + model tables) is written and
  // reloaded; q162's deterministic delta batch is assigned + encoded
  // under the RELOADED frozen model (never the in-memory one — the
  // reload is load-bearing); the delta codes persist as generation 2;
  // and the probe is served from the two reloaded code legs merged.
  // The oracle replays train + delta synthesis + full-corpus encode +
  // search from the immutable inputs alone (TrainData2.gen2SearchCtes),
  // so corruption anywhere across the two generations' write/read/
  // append path breaks the hash gate; WritersSpec pins merged-reload ≡
  // one-shot in-memory rebuild. Scale: per append only the DELTA is
  // assigned/encoded (row-local under plan-literal models); the gen-1
  // codes never re-encode, and the reload collects ONLY model tables. ──
  private def q172(spark: SparkSession, dir: String): DataFrame =
    Writers.withTempDir("graft_q172_") { lake =>
      val sp = spark
      import sp.implicits._
      // scan-given parallelism for the same reason as q168: both codes
      // legs (gen 1 + the delta gen 2) are write-bound, and the spread
      // exchange's 32 near-empty partitions doubled as 32-file writes
      val corpus = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val cents = TrainData.trainedCentroids(spark, dir)
      val codebooks = TrainData2.frozenCodebooks(spark, dir)
      // GENERATION 1: the q168 layout (codes + the two model tables),
      // published as registry generation 1
      val reg = new ModelRegistry(spark, lake)
      val fp = FrozenModels.fingerprint(s"$dir/embeddings.parquet")
      reg.publish("ivfadc", 1, fp, Map(
        "codes" -> PqAdc.encode(IvfFlat.assign(corpus, cents), codebooks,
            TrainData2.PqSub)
          .select("vec_id", "embedding", "cluster", "codes"),
        "codebooks" -> codebooks.zipWithIndex.flatMap { case (cb, m) =>
          cb.zipWithIndex.map { case (cw, k) => (m, k + 1, cw.toSeq) }
        }.toDF("m", "code", "cv").coalesce(1),
        "centroids" -> cents.zipWithIndex
          .map { case (cv, i) => (i + 1, cv.toSeq) }
          .toDF("cid", "cv").coalesce(1)))
      // RELOAD: from here on only the persisted artifacts are consumed —
      // model tables back as bounded driver state, codes stay distributed
      val rCbs: Seq[Seq[Array[Double]]] = reg.load("ivfadc", 1, "codebooks")
        .orderBy("m", "code").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toSeq)
      val rCents: Seq[Array[Float]] = reg.load("ivfadc", 1, "centroids")
        .orderBy("cid").collect()
        .map(_.getSeq[Float](1).toArray).toSeq
      // APPEND: q162's deterministic delta, encoded under the RELOADED
      // frozen model and persisted as generation 2 (id offset = the
      // id-space bound, q162's collision rule)
      val offset = Tables.embeddings(spark, dir)
        .agg(max("vec_id")).collect()(0).getLong(0) + 1L
      val delta = corpus.select(
        (col("vec_id") + lit(offset)).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.01)).cast("float"))
          .as("embedding"))
        .localCheckpoint(false) // materialized delta batch (q162's rule)
      reg.publish("ivfadc", 2, fp, Map(
        "codes" -> PqAdc.encode(IvfFlat.assign(delta, rCents), rCbs,
            TrainData2.PqSub)
          .select("vec_id", "embedding", "cluster", "codes")))
      // SERVE: the merged generations are just the union of code legs —
      // counter-free, no rewrite of gen 1 (the registry's append
      // contract; ModelRegistrySpec pins gen-1 file immutability)
      val merged = reg.loadAll("ivfadc", "codes")
      val probes = Tables.embeddings(spark, dir)
        .filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      PqAdc.search(merged, probes, rCents, rCbs, TrainData2.PqSub,
          nprobe = TrainData.IvfNprobe, shortlist = TrainData2.AdcShortlist,
          k = TrainData.IvfTopK)
        .select(col("probe_id"), col("cand_id"), col("rk"))
        .orderBy("probe_id", "rk").localCheckpoint()
    }

  private val q172Sql =
    s"""WITH ${TrainData2.gen2SearchCtes},
      |ranked AS (
      |  SELECT probe_id, cand_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY cosine DESC, cand_id) AS INT) AS rk
      |  FROM rescored)
      |SELECT probe_id, cand_id, rk FROM ranked
      |WHERE rk <= ${TrainData.IvfTopK}
      |ORDER BY probe_id, rk""".stripMargin

  // ── q169: DSIR-style hashed n-gram importance RESAMPLING (Xie et
  // al. 2023, "Data Selection for Language Models via Importance
  // Resampling") — the distribution-MATCHING selector next to the NB
  // classifier's keep/drop decision (q166/q167): score every raw doc by
  // how much more likely its hashed-bigram counts are under a TARGET
  // distribution (here: the lang='en' slice — DSIR's canonical "match
  // formal English" use) than under the raw-corpus distribution, then
  // keep the top-quarter by that importance logit. The two differ
  // exactly as the papers do: NB is Bernoulli over bucket PRESENCE with
  // a decision boundary; DSIR is multinomial over bucket COUNTS with a
  // ranked resample — both engines share only the md5-bucket primitive
  // (feature spaces stay independent via the "ds:"/"nb:" hash prefixes).
  //
  // Determinism: per-bucket importance weights are fixed-point log2
  // deltas (lg2e10, +1 smoothing over the full bucket spine); a doc's
  // logit is the exact integer Σ_b n_db·(L(t_b+1) − L(s_b+1)) +
  // n_d·(L(S+B) − L(T+B)) — the second term is the Laplace-normalizer
  // difference every bigram token contributes regardless of bucket.
  // Selection is the temperature→0 limit of DSIR's Gumbel resample:
  // rank by (logit DESC, doc_id), keep ⌈n/4⌉.
  //
  // Scale: the heavy pass is ONE bigram explode + count rollup shared
  // (checkpointed) by the census and the scoring join; the model is the
  // DsBuckets-row weight table (broadcast) plus two census scalars. The
  // global row_number is doc-census grain; at 100 TB the rank would be
  // replaced by a logit threshold read off the q79 histogram sketch —
  // the census output (lang grain) is unchanged by that swap. ──
  private[graft] val DsBuckets = NbBuckets // 64; spaces differ by hash prefix

  /** The DsBuckets-cell training census: per bucket, target (lang='en')
    * and raw occurrence counts — one occurrence-grain scan straight
    * into a partial agg (map-side combine leaves a 64-row exchange).
    * Merge = counter addition, so the SAME relation is the batch
    * trainer's input ([[dsModel]]) and the streaming maintenance state
    * ([[graft.streaming.Streams.dsCensusCells]]). */
  private[graft] def dsCensus(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(graft.functions.HashBucketSet.list(
          col("text"), "ds:", DsBuckets)).as("b"))
      .groupBy("b").agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tb"),
        count(lit(1)).as("sb"))

  /** The frozen DSIR model as driver-side state: per-bucket importance
    * deltas `w(b) = L(t_b+1) − L(s_b+1)` plus the Laplace-normalizer
    * delta every bigram token contributes regardless of bucket.
    * Training is ONE occurrence-grain census scan (the codegen'd
    * [[graft.functions.HashBucketSet]] list kernel explodes straight
    * into a DsBuckets-cell partial agg — map-side combine leaves a
    * 64-row exchange); model = DsBuckets longs + one scalar. */
  private[graft] def dsModel(docs: DataFrame): (IndexedSeq[Long], Long) =
    dsModelFromCensus(dsCensus(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap)

  /** The scoring model as driver math over a collected census — the
    * DsBuckets-cell state ([[dsCensus]] at rest / the streaming
    * maintenance cells / q175's refreshed merge) is all it needs. */
  private[graft] def dsModelFromCensus(cens: Map[Long, (Long, Long)]): (IndexedSeq[Long], Long) = {
    val (tt, st) = (cens.values.map(_._1).sum, cens.values.map(_._2).sum)
    val weights = IndexedSeq.tabulate(DsBuckets) { b =>
      val (tb, sb) = cens.getOrElse(b.toLong, (0L, 0L)) // +1 smoothing spine
      lg2e10(tb + 1) - lg2e10(sb + 1)
    }
    val shift = lg2e10(st + DsBuckets) - lg2e10(tt + DsBuckets)
    (weights, shift)
  }

  /** [[dsModel]] memoized per data directory ([[FrozenModels]]) — the
    * model is a pure function of the corpus, so q169/q170 and every
    * bench rep share ONE census pass per process (the nbCensusDir /
    * uniModel discipline). */
  private[graft] def dsModelDir(spark: SparkSession, dir: String): (IndexedSeq[Long], Long) =
    FrozenModels.memoGen(s"dsir-model|$dir",
        FrozenModels.fingerprint(s"$dir/documents.parquet")) {
      dsModel(Tables.documents(spark, dir).select(col("lang"), col("text")))
    }

  /** The DSIR scoring column under a FROZEN model: logit =
    * Σ_occurrences w(bucket) + n_bigrams·shift, one row-local fold over
    * the occurrence-grain bucket list (Σ_b n_db·w(b) ≡ the
    * occurrence sum — integer, order-free). Shared VERBATIM by the
    * batch selector ([[dsirSelect]]) and the streaming threshold gate
    * ([[graft.streaming.Streams.dsirScoreFilter]]). */
  private[graft] def dsLogitCol(text: Column, weights: IndexedSeq[Long],
                                shift: Long): Column = {
    require(weights.size == DsBuckets,
      s"dsir_logit: expected $DsBuckets weights, got ${weights.size}")
    // fold (w(b) + shift) per OCCURRENCE — Σw + n·shift in one
    // traversal, so the kernel column is referenced (and computed) once
    aggregate(
      graft.functions.HashBucketSet.list(text, "ds:", DsBuckets),
      lit(0L),
      (acc, b) => acc + lit(shift) +
        element_at(typedLit(weights), (b + lit(1L)).cast("int")))
  }

  /** Doc-count line above which [[dsirSelect]] swaps its global
    * top-⌈n/4⌉ rank for the histogram-threshold plan (same selected
    * set, no corpus-sized single-partition sort). Generous for
    * local[32]; a cluster deployment would tune it to what one task
    * sorts comfortably. */
  private val DsRankMaxDocs = 100000L
  /** Coarse-bin budget of the threshold plan — bounds its histogram
    * window at DsThresholdBins+1 rows regardless of corpus size. */
  private val DsThresholdBins = 4096L

  /** Per-doc importance logits + the ⌈n/4⌉ selection flag — split out
    * so the spec can pin WHICH docs a planted vocab-separated corpus
    * selects, not just the census. Two-phase like [[nbDocMargins]]:
    * TRAIN collects the bounded model ([[dsModel]]), SCORE is one
    * row-local scan under the literal model — no feature checkpoint,
    * no broadcast join, no per-doc count shuffle.
    *
    * SELECTION has two plans behind the doc-count census (the
    * q156-family selectable-fallback contract; `force` pins a path for
    * tests, which pin set equality through BOTH):
    *   - `rank` (≤ [[DsRankMaxDocs]]): one global
    *     row_number(logit DESC, doc_id) — fine while a single task can
    *     sort the corpus' (logit, doc_id) pairs.
    *   - `threshold` (the 100 TB plan): find the cut logit T = the
    *     ⌈n/4⌉-th largest in TWO bounded refinement steps — a coarse
    *     FIXED-WIDTH bin histogram (≤ [[DsThresholdBins]]+1 rows, bin
    *     width from a 2-scalar extent census) locates the boundary
    *     BIN, then the exact logit-grain histogram of that ONE bin
    *     (≈ n/DsThresholdBins docs) yields T. sel = logit > T, plus
    *     the lowest-doc_id docs AT T up to the remaining budget. The
    *     at-T tie group is the one relation whose intra-tie order
    *     matters, and it is TIE-MASS GATED (`tieRankMax`, default
    *     [[DsRankMaxDocs]] — the same one-task-sort line): under the
    *     gate it is rank-ordered and its selected ids broadcast; past
    *     it (an empty-text flood all scoring one logit) the SAME
    *     two-step refinement finds the budget-th smallest doc_id in
    *     the tie group and selection becomes a pure row-local
    *     predicate — no corpus-sized window, join, or broadcast on
    *     ANY input shape. Every windowed relation is bounded — a
    *     logit-grain histogram over the WHOLE corpus would itself be
    *     ~n rows when logits are mostly distinct, i.e. the very
    *     single-partition sort this plan exists to avoid. The selected
    *     SET is identical to the rank's by construction (rank orders
    *     by logit DESC then doc_id) wherever doc_ids are unique;
    *     duplicate ids at the exact cut select whole (boundary-grain
    *     ambiguity, both tie paths alike). */
  private[graft] def dsirSelect(docs: DataFrame,
                                force: Option[String] = None,
                                model: Option[(IndexedSeq[Long], Long)] = None,
                                tieRankMax: Long = DsRankMaxDocs): DataFrame = {
    require(force.forall(Set("rank", "threshold")),
      s"dsir_select: force must be rank|threshold, got $force")
    // the gated queries pass the memoized per-dir model so every
    // execution (and bench rep) shares one training census; spec
    // corpora train inline
    val (weights, shift) = model.getOrElse(dsModel(docs))
    val nDocs = docs.count()
    val selN = (nDocs + 3) / 4
    // Pass-through contract: every docs column except `text` survives
    // into the output alongside `logit` and `sel` — the selector is the
    // engine's ONE at-scale top-quarter rule, and downstream censuses
    // (q178's per-source mixture) need their grouping columns to ride
    // through it rather than re-join the corpus on doc_id.
    val scored = docs
      // NULL text → logit 0, the oracle's COALESCE shape (see
      // nbDocMargins' NULL rule)
      .withColumn("logit",
        coalesce(dsLogitCol(col("text"), weights, shift), lit(0L)))
      .drop("text")
    val useRank = force.map(_ == "rank").getOrElse(nDocs <= DsRankMaxDocs)
    if (useRank)
      scored.withColumn("sel",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("logit").desc, col("doc_id"))) <= selN)
    else {
      val W = org.apache.spark.sql.expressions.Window
      val sc = scored.localCheckpoint(false) // consumers: extent, bins, refine, sel
      if (sc.take(1).isEmpty) sc.withColumn("sel", lit(false)) // empty corpus
      else {
        val (t, aboveT, tieMass) = orderCut(sc, "logit", selN, desc = true)
        val atBudget = selN - aboveT // docs to take AT the boundary logit
        // Small-tie path: rank ONLY the boundary-logit docs (the single
        // group whose intra-tie order matters) — sort and broadcast are
        // both bounded by the tie mass at T. DISTINCT before the join
        // back: duplicate doc_ids inside the selected tie slice would
        // otherwise multiply matching rows (a row-count corruption, not
        // just an ordering ambiguity); with distinct, every row of a
        // selected id is selected — the same ≤-grain ambiguity the
        // doc_id-cut path has at its boundary id. The join back is
        // null-SAFE: the rank plan's (logit desc, doc_id asc) orders
        // NULL ids FIRST, so they enter the tie budget first — a plain
        // === would silently deselect every one of them (and distinct
        // guarantees at most ONE null key, so <=> cannot fan out).
        def atSelBroadcast(): DataFrame = {
          val atSel = sc.filter(col("logit") === t)
            .withColumn("__rn", row_number().over(W.orderBy("doc_id")))
            .filter(col("__rn") <= atBudget)
            .select(col("doc_id").as("__bid")).distinct()
            // explicit hit flag: a <=> match on the NULL key still
            // leaves __bid NULL, so presence must not be read off it
            .withColumn("__hit", lit(true))
          sc.join(broadcast(atSel), sc("doc_id") <=> atSel("__bid"), "left")
            .withColumn("sel",
              col("logit") > t || coalesce(col("__hit"), lit(false)))
            .drop("__bid", "__hit")
        }
        if (tieMass <= tieRankMax) atSelBroadcast()
        else {
          // TIE-MASS GATE (r15 VERDICT #2): past the one-task-sort line
          // the at-T tie group (e.g. an empty-text flood all scoring 0)
          // must not be globally ranked OR broadcast. Instead the same
          // two-step refinement that found T finds the budget-th
          // smallest doc_id D INSIDE the tie group, and selection
          // becomes a pure row-local predicate — no window, no join, no
          // broadcast. Rank parity: the rank plan orders (logit desc,
          // doc_id asc nulls first), so NULL-id tie rows are selected
          // before any value — the predicate keeps them all when the
          // budget covers them; a tie group whose NULL-id mass alone
          // exceeds the budget has no value-expressible cut among
          // indistinguishable keys and falls back to the broadcast
          // path (absent from every gated corpus; disclosed).
          // Duplicate ids AT the cut D select whole (≤ D) — the same
          // boundary-grain ambiguity as the broadcast path's distinct.
          val nNull =
            sc.filter(col("logit") === t && col("doc_id").isNull).count()
          if (atBudget <= nNull) atSelBroadcast()
          else {
            val vals =
              sc.filter(col("logit") === t && col("doc_id").isNotNull)
            val (d, _, _) =
              orderCut(vals, "doc_id", atBudget - nNull, desc = false)
            sc.withColumn("sel", col("logit") > t ||
              (col("logit") === t &&
                (col("doc_id").isNull || col("doc_id") <= d)))
          }
        }
      }
    }
  }

  /** k-th order-statistic cut in TWO bounded refinement steps — the
    * shared kernel of the at-scale selectors ([[dsirSelect]]'s logit
    * threshold and its tie-group doc_id cut): a coarse FIXED-WIDTH bin
    * histogram (≤ [[DsThresholdBins]]+1 rows, bin width from a
    * 2-scalar extent census) locates the boundary BIN, then the exact
    * value-grain histogram of that ONE bin (≈ n/DsThresholdBins rows
    * under any near-uniform spread) yields the cut. Returns (cut
    * value, count strictly BEYOND the cut, count AT the cut) — beyond
    * = larger when `desc` (top-k), smaller otherwise (bottom-k).
    * Caller guarantees `cName` is non-null long and `df` non-empty. */
  private def orderCut(df: DataFrame, cName: String, k: Long,
                       desc: Boolean): (Long, Long, Long) = {
    val W = org.apache.spark.sql.expressions.Window
    val ext = df.agg(min(cName).as("lo"), max(cName).as("hi")).head
    val (lo, hi) = (ext.getLong(0), ext.getLong(1))
    val width = math.max((hi - lo) / DsThresholdBins + 1, 1L)
    val bin = if (desc) expr(s"(${hi}L - $cName) div ${width}L")
              else expr(s"($cName - ${lo}L) div ${width}L")
    val bBin = df.select(bin.as("__bin")).groupBy("__bin")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(W.orderBy("__bin")
        .rowsBetween(W.unboundedPreceding, 0)))
      .filter(col("cum") >= k).orderBy("__bin").limit(1).collect()(0)
    val beyondBin = bBin.getLong(2) - bBin.getLong(1)
    val ord = if (desc) col(cName).desc else col(cName).asc
    val bRow = df.filter(bin === bBin.getLong(0))
      .groupBy(cName).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(W.orderBy(ord)
        .rowsBetween(W.unboundedPreceding, 0)))
      .filter(col("cum") + lit(beyondBin) >= k)
      .orderBy(ord).limit(1).collect()(0)
    (bRow.getLong(0), beyondBin + bRow.getLong(2) - bRow.getLong(1),
      bRow.getLong(1))
  }

  /** The deployable STREAM cut for [[dsirSelect]]'s selection rule —
    * the one source of truth for the threshold
    * `streaming.Streams.dsirScoreFilter` gates on (SCALE.md's 100 TB
    * shape: read the cut once from the scored corpus, then gate every
    * arriving row locally). Returns (T, exact): T is the boundary
    * logit both batch plans select at — derived from the SAME scoring
    * column ([[dsLogitCol]]) and the SAME two-step [[orderCut]]
    * refinement the batch threshold plan uses, so the constants cannot
    * drift apart — and `exact` says whether `logit >= T` reproduces
    * the batch set EXACTLY: true iff the at-T tie group is taken whole
    * (selN lands on the tie boundary). When false, a pure threshold
    * admits the REST of that one tie group too (it can never drop a
    * batch-selected doc, and never admit below T) — the disclosed
    * stream/batch gap, bounded by the boundary tie mass. */
  private[graft] def dsirCut(docs: DataFrame,
      model: Option[(IndexedSeq[Long], Long)] = None): (Long, Boolean) = {
    val (weights, shift) = model.getOrElse(dsModel(docs))
    val scored = docs.withColumn("logit",
        coalesce(dsLogitCol(col("text"), weights, shift), lit(0L)))
      .select("logit").localCheckpoint(false) // consumers: count + orderCut
    val n = scored.count()
    if (n == 0) (Long.MinValue, true)
    else {
      val selN = (n + 3) / 4
      val (t, aboveT, tieMass) = orderCut(scored, "logit", selN, desc = true)
      (t, selN - aboveT == tieMass)
    }
  }

  /** The lang-grain selection census both DSIR gates share (q169 lets
    * the doc census pick the plan; q170 forces the 100 TB threshold
    * plan — identical output by construction, identical oracle). */
  private def dsirCensus(spark: SparkSession, dir: String,
                         force: Option[String]): DataFrame =
    dsirSelect(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("text")),
      force = force, model = Some(dsModelDir(spark, dir)))
      .groupBy("lang").agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("sel"), 1L).otherwise(0L)).as("n_sel"),
        sum(when(col("sel"), col("logit")).otherwise(0L)).as("sel_logit_sum"))
      .orderBy("lang")

  private def q169(spark: SparkSession, dir: String): DataFrame =
    dsirCensus(spark, dir, force = None)

  // ── q170: the DSIR THRESHOLD plan, oracle-gated — q169's census with
  // the 100 TB selection path FORCED. At every gated SF the doc census
  // picks the rank plan (≤ DsRankMaxDocs), so without this query the
  // declared at-scale path (coarse histogram → one-bin exact refine →
  // tie-group-only rank, no corpus-wide single-partition sort) would be
  // exercised only by specs and probes, never by a hash gate. The
  // oracle is IDENTICAL to q169's: the threshold plan selects the same
  // set as the rank by construction, and this gate is what turns that
  // construction into a checked invariant. PlanSpec additionally pins
  // that every window in the forced plan sits above the boundary-logit
  // tie filter — bounded by the tie mass, never the corpus. ──
  private def q170(spark: SparkSession, dir: String): DataFrame =
    dsirCensus(spark, dir, force = Some("threshold"))

  /** The q169 CTE chain through `dslogit(doc_id, lang, logit)` — the
    * trained-model scoring front shared by the q169/q170/q175 census
    * tail and q178's per-source mixture composition (TrainData4). */
  private[queries] val dsirLogitCtesSql = {
    val compose = (0 until 8).map(n =>
      s"(instr('0123456789abcdef', substr(__h, ${n + 1}, 1)) - 1)" +
        s" * ${1L << (4 * n)}").mkString(" + ")
    s"""dsbg AS MATERIALIZED (
      |  SELECT doc_id, lang, ($compose) % $DsBuckets AS b,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM (
      |    SELECT doc_id, lang, md5('ds:' || g) AS __h FROM (
      |      SELECT doc_id, lang,
      |        unnest(list_transform(range(1, len(t)),
      |          i -> t[i] || ' ' || t[i + 1])) AS g
      |      FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
      |            FROM documents)))
      |  GROUP BY 1, 2, 3),
      |dscen AS MATERIALIZED (
      |  SELECT s.b, COALESCE(c.tb, 0) AS tb, COALESCE(c.sb, 0) AS sb
      |  FROM (SELECT unnest(range(0, $DsBuckets)) AS b) s
      |  LEFT JOIN (
      |    SELECT b,
      |      CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS tb,
      |      CAST(SUM(n) AS BIGINT) AS sb
      |    FROM dsbg GROUP BY 1) c ON s.b = c.b),
      |dstot AS (SELECT CAST(SUM(tb) AS BIGINT) AS tt,
      |    CAST(SUM(sb) AS BIGINT) AS st FROM dscen),
      |dsw AS MATERIALIZED (
      |  SELECT b, ${lg2e10Sql("(tb + 1)")} - ${lg2e10Sql("(sb + 1)")} AS w
      |  FROM dscen),
      |dsshift AS (SELECT
      |    ${lg2e10Sql("((SELECT st FROM dstot) + " + DsBuckets + ")")} -
      |    ${lg2e10Sql("((SELECT tt FROM dstot) + " + DsBuckets + ")")} AS v),
      |dslogit AS MATERIALIZED (
      |  SELECT d.doc_id, d.lang,
      |    COALESCE(g.wsum, 0) +
      |      COALESCE(g.nd, 0) * (SELECT v FROM dsshift) AS logit
      |  FROM documents d LEFT JOIN (
      |    SELECT f.doc_id,
      |      CAST(SUM(f.n * w.w) AS BIGINT) AS wsum,
      |      CAST(SUM(f.n) AS BIGINT) AS nd
      |    FROM dsbg f JOIN dsw w ON f.b = w.b GROUP BY 1) g
      |  ON d.doc_id = g.doc_id)""".stripMargin
  }

  private val q169Sql =
    s"""WITH $dsirLogitCtesSql,
      |dssel AS (
      |  SELECT lang, logit,
      |    ROW_NUMBER() OVER (ORDER BY logit DESC, doc_id) <=
      |      ((SELECT COUNT(*) FROM documents) + 3) // 4 AS sel
      |  FROM dslogit)
      |SELECT lang, COUNT(*) AS n_raw,
      |  CAST(SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
      |  CAST(SUM(CASE WHEN sel THEN logit ELSE 0 END) AS BIGINT)
      |    AS sel_logit_sum
      |FROM dssel GROUP BY 1 ORDER BY lang""".stripMargin

  // ── q173/q174: TOKENIZER model persistence — the q168 Writers
  // discipline applied to the two trained tokenizer families (the ANN
  // index got its persistence gates in q168/q172; a production
  // tokenizer is likewise trained once and SHIPPED as an artifact to
  // the tokenize fleet). q173 persists the BPE merge list WITH its
  // round index — ORDER IS the model: merges apply sequentially, and a
  // reload that loses the order ships a different tokenizer — reloads
  // it, and serves q163's exact output through the shared row-local
  // fold kernel (TrainData2.bpeTokLenCol, the streaming filter's
  // kernel) at VOCAB grain with the q163 broadcast transport. q174
  // persists the unigram (piece, cost) table + the OOV scalar and
  // serves q165's output under the reloaded model. Both gate against
  // the ORIGINAL queries' oracles, which train from scratch with no
  // filesystem — any loss in the persist/reload path (ordering, type
  // round-trip, row duplication) breaks the hash. ──
  private def q173(spark: SparkSession, dir: String): DataFrame =
    Writers.withTempDir("graft_q173_") { lake =>
      val sp = spark
      import sp.implicits._
      // TRAIN + PERSIST (train memoized like every frozen model)
      val reg = new ModelRegistry(spark, lake)
      reg.publish("bpe", 1,
        FrozenModels.fingerprint(s"$dir/documents.parquet"), Map(
          "merges" -> TrainData2.trainedMerges(spark, dir).zipWithIndex.flatMap {
            case (round, k) => round.map { case (l, r) => (k + 1, l, r) }
          }.toDF("round", "left_sym", "right_sym").coalesce(1)))
      // RELOAD ordered by the persisted round index
      val reloaded: Seq[Seq[(String, String)]] = reg.load("bpe", 1, "merges")
        .orderBy("round").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.map(r => (r.getString(1), r.getString(2))).toSeq)
      // SERVE q163's output: per-word lengths under the reloaded model
      // computed once at vocab grain, broadcast onto one tokenize scan
      val docs = TrainData.docsParallel(spark, dir)
        .select(col("doc_id"), col("text"))
      val vlen = docs.select(explode(TrainData.tokens(col("text"))).as("w"))
        .distinct()
        .select(col("w"), TrainData2.bpeTokLenCol(col("w"), reloaded).as("n_sym"))
      docs.select(col("doc_id"), explode(TrainData.tokens(col("text"))).as("w"))
        .join(broadcast(vlen), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("ws_tok"), sum("n_sym").as("bpe_tok"))
        .withColumn("fertility_pm", expr("bpe_tok * 1000 div ws_tok"))
        .orderBy(col("bpe_tok").desc, col("doc_id")).limit(20)
        .localCheckpoint()
    }

  private def q174(spark: SparkSession, dir: String): DataFrame =
    Writers.withTempDir("graft_q174_") { lake =>
      val sp = spark
      import sp.implicits._
      val (vocab, oov) = uniModel(spark, dir)
      val reg = new ModelRegistry(spark, lake)
      reg.publish("unigram", 1,
        FrozenModels.fingerprint(s"$dir/documents.parquet"), Map(
          "vocab" -> vocab.toSeq.toDF("piece", "cost").coalesce(1),
          "oov" -> Seq(oov).toDF("oov_cost").coalesce(1)))
      val rVocab = reg.load("unigram", 1, "vocab").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rOov = reg.load("unigram", 1, "oov").collect()(0).getLong(0)
      // q165's body under the RELOADED model
      val vlen = uniWords(spark, dir)
        .withColumn("n_p", size(uniSegCol(col("w"), rVocab, rOov)).cast("long"))
        .select(col("w"), col("n_p"))
      TrainData.docsParallel(spark, dir)
        .select(col("doc_id"), explode(TrainData.tokens(col("text"))).as("w"))
        .join(broadcast(vlen), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("ws_tok"), sum("n_p").as("uni_tok"))
        .withColumn("fertility_pm", expr("uni_tok * 1000 div ws_tok"))
        .orderBy(col("uni_tok").desc, col("doc_id")).limit(20)
        .localCheckpoint()
    }

  // ── q175/q176: incremental MODEL-CENSUS refresh — the trainer-side
  // member of the incremental family (q53 dedup, q73 LSH, q83 sketches,
  // q99 clusters, q162 ANN): the DSIR / NB training censuses live AT
  // REST as ≤65-row tables, a new document batch arrives, and the
  // refreshed model comes from STORED + DELTA-BATCH counter addition —
  // never a base-corpus re-scan (census(base ∪ delta) ≡ census(base) +
  // census(delta) because every cell is a counter; this is the batch
  // form of the dsCensusCells/nbCensusCells streaming maintenance).
  // Both gate against the FULL-RETRAIN oracles (q169Sql / q167Sql):
  // the refresh path must be indistinguishable from training on the
  // union from scratch, across engines, through a real parquet
  // round-trip of the stored census (via the ModelRegistry — the
  // census is model state like any other, round-14). Scale: refresh cost = one DELTA
  // scan + a 65-row read + driver log math — the model-refresh loop a
  // 100 TB ingest pipeline runs on a schedule. ──
  private def q175(spark: SparkSession, dir: String): DataFrame =
    Writers.withTempDir("graft_q175_") { lake =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("text"))
      val base = docs.filter(col("doc_id") % 10 =!= 3)
      val delta = docs.filter(col("doc_id") % 10 === 3)
      // generation 1: the base census at rest — published through the
      // model registry like every persisted model (the census IS the
      // trainer's model state; the manifest fingerprint records which
      // corpus generation it was counted from)
      val reg = new ModelRegistry(spark, lake)
      reg.publish("dsir-census", 1,
        FrozenModels.fingerprint(s"$dir/documents.parquet"),
        Map("census" -> dsCensus(base)))
      // REFRESH: stored + delta-batch census, merged by counter addition
      val merged = reg.load("dsir-census", 1, "census")
        .unionByName(dsCensus(delta))
        .groupBy("b").agg(sum("tb").as("tb"), sum("sb").as("sb"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // serve the q169 census under the refreshed model — must equal
      // the full retrain exactly
      dsirSelect(docs, model = Some(dsModelFromCensus(merged)))
        .groupBy("lang").agg(
          count(lit(1)).as("n_raw"),
          sum(when(col("sel"), 1L).otherwise(0L)).as("n_sel"),
          sum(when(col("sel"), col("logit")).otherwise(0L)).as("sel_logit_sum"))
        .orderBy("lang").localCheckpoint()
    }

  private def q176(spark: SparkSession, dir: String): DataFrame =
    Writers.withTempDir("graft_q176_") { lake =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 10 =!= 3)
      val delta = docs.filter(col("doc_id") % 10 === 3)
      val reg = new ModelRegistry(spark, lake)
      reg.publish("nb-census", 1,
        FrozenModels.fingerprint(s"$dir/documents.parquet"),
        Map("census" -> nbCensus(base)))
      val merged = reg.load("nb-census", 1, "census")
        .unionByName(nbCensus(delta))
        .groupBy("b").agg(
          sum("df_keep").as("df_keep"), sum("df_drop").as("df_drop"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      nbConfusion(docs, nbModelFromCensus(nbStateFromCells(merged)))
        .localCheckpoint()
    }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q164_unigram_train", q164, Some(q164Sql)),
    QueryDef("q165_unigram_encode", q165, Some(q165Sql)),
    QueryDef("q166_nb_train", q166, Some(q166Sql)),
    QueryDef("q167_nb_score", q167, Some(q167Sql)),
    QueryDef("q168_index_persist", q168, Some(q168Sql)),
    QueryDef("q169_dsir_resample", q169, Some(q169Sql)),
    // same oracle as q169 on purpose: the threshold plan's contract IS
    // set-equality with the rank plan
    QueryDef("q170_dsir_threshold", q170, Some(q169Sql)),
    QueryDef("q171_unigram_prune", q171, Some(q171Sql)),
    QueryDef("q172_index_lifecycle", q172, Some(q172Sql)),
    // both persistence gates reuse their source queries' oracles on
    // purpose: serve-from-reload ≡ train-from-scratch IS the contract
    QueryDef("q173_bpe_persist", q173, Some(TrainData2.q163Sql)),
    QueryDef("q174_unigram_persist", q174, Some(q165Sql)),
    // refresh ≡ full retrain IS the contract — hence the source oracles
    QueryDef("q175_dsir_refresh", q175, Some(q169Sql)),
    QueryDef("q176_nb_refresh", q176, Some(q167Sql)))
}


