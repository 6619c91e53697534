package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, MinHashLsh}

/** Dev tool: empirical scaling probe for the near-dup pipeline
  * (signatures → banded candidates → connected components) at Nx the
  * sf0.1 corpus, built by unioning the documents table with offset ids
  * (copies get a per-replica salt token appended so they are near-dups
  * of their original, not byte-identical — the hard case).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE=10 \
  *     sbt -batch "runMain graft.ScaleProbe"
  *
  * Prints one JSON line: corpus size, per-stage wall seconds, pair and
  * cluster counts — the evidence behind SCALE.md's "linear in corpus"
  * claims. Not part of the driver bench (minutes at 100x).
  */
object ScaleProbe {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PROBE=truthjoin: q98's exact-truth side under BOTH
    // selectable plans (raw shingle equi-join vs the τ=1/2 df-prefix
    // pigeonhole) — same audit output by construction (HygieneSpec pins
    // row equality), so the leg measures pure plan cost: the raw join
    // pays Σ_s df_probe(s)·df_corpus(s) intermediate rows, the prefix
    // plan pays the df census + prefix join + row-local verify.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "truthjoin") {
      // corpus shapes: "dense" = the driver documents table (constant
      // shingle vocabulary — every shingle common, NO rare tail: the
      // raw join's partial-agg count wins); "skew" = mult×2000 docs of
      // unique 24-token tails PLUS one 13-token boilerplate block in
      // every doc — the df distribution real crawls show (one hot key,
      // long df=1 tail): the raw join pays hot_df_probe×hot_df_corpus
      // rows per boilerplate shingle while every prefix is pure df=1
      // tail and the prefix join emits (almost) nothing.
      val corpus =
        if (sys.env.getOrElse("SPARK_GRAFT_TRUTH_CORPUS", "dense") == "skew") {
          val boiler = (1 to 13).map(j => s"bp$j").mkString(" ")
          spark.range(mult * 2000L).select(col("id").as("doc_id"),
            concat_ws(" ", (1 to 24).map(j =>
              concat(lit(s"u${j}_"), col("id").cast("string"))) :+ lit(boiler): _*)
              .as("text"))
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(true)
        } else graft.engine.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint(true)
      val nd = corpus.count()
      // two reps, min: the first leg otherwise pays whole-JVM warmup
      def leg(force: String) = {
        val rs = (1 to 2).map(_ => timed {
          graft.queries.Hygiene.q98Docs(corpus, Some(force)).count()
        })
        (rs.head._1, rs.map(_._2).min)
      }
      val (nE, tE) = leg("exact")
      val (nP, tP) = leg("prefix")
      println(s"""{"probe":"truthjoin","sf":"$sfDir",""" +
        s""""corpus":"${sys.env.getOrElse("SPARK_GRAFT_TRUTH_CORPUS", "dense")}",""" +
        s""""docs":$nd,"rows_exact":$nE,""" +
        s""""rows_prefix":$nP,"exact_sec":${f"$tE%.2f"},""" +
        s""""prefix_sec":${f"$tP%.2f"}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE=ann: the round-9 similarity-search family —
    // IVF train (fixed model work on the BASE corpus), assign+PQ-encode
    // (map-side, corpus-linear), IVFADC search (per-probe cost tracks
    // probed-cluster mass, not corpus size times dim), brute-force
    // ground truth for recall, and the banded Hamming near-dup over
    // synthetic 64-bit fingerprints with planted 1-bit-perturbed groups
    // of 4. Runs BEFORE the documents-corpus replication below — this
    // family reads embeddings only and must not pay that checkpoint.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "ann") {
      import graft.operators.{IvfFlat, PqAdc}
      import graft.functions.CosineSimilarity
      val embBase = graft.engine.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val dim = embBase.select(size(col("embedding"))).first().getInt(0)
      val stride = embBase.agg(max("vec_id")).collect()(0).getLong(0) + 1L
      // SPARK_GRAFT_ANN_CORPUS=clustered: pull every vector 90% toward
      // center (vec_id mod 16) — the FAISS-typical clustered regime the
      // near-uniform driver embeddings never show. In this mode the
      // search runs the q181 operating point (nprobe=12) at the FIXED
      // AdcShortlist budget, demonstrating the fixed arm of the rerank
      // rule holds its recall ceiling independent of corpus size
      // (TrainData4Spec pins the same at sf0.1; this leg scales it).
      val clustered =
        sys.env.getOrElse("SPARK_GRAFT_ANN_CORPUS", "uniform") == "clustered"
      val mixCenters = embBase.filter(col("vec_id") < 16).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
      val vecs0 = (0 until mult).map(k =>
          embBase.select((col("vec_id") + lit(k * stride)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
      val vecs =
        (if (clustered)
           graft.queries.TrainData4.clusterMix(vecs0, mixCenters)
         else vecs0).localCheckpoint(true)
      val nVec = vecs.count()
      val ivfK = 16
      val pqM = 4
      val pqSub = dim / pqM
      require(pqM * pqSub == dim, s"dim $dim not divisible into $pqM subspaces")
      // in clustered mode the models train on the clustered BASE (the
      // 100 TB story unchanged: fixed-size training sample, applied
      // everywhere) and the probes come from the clustered space
      val trainBase =
        if (clustered)
          graft.queries.TrainData4.clusterMix(embBase, mixCenters)
            .localCheckpoint(true)
        else embBase
      val seeds = trainBase.filter(col("vec_id") < ivfK).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
      val cbSeeds = trainBase.filter(col("vec_id") < 64).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      val initCbs = (0 until pqM).map(m =>
        cbSeeds.toSeq.map(s => s.slice(m * pqSub, (m + 1) * pqSub).map(_.toDouble)))
      // model training is fixed work on the base corpus — it does NOT
      // scale with mult (the 100 TB story: train on a sample, apply
      // everywhere); timed to show it stays flat. Both halves of the
      // shipping lifecycle train: the coarse quantizer (IvfFlat.train)
      // and the fine codebooks (PqAdc.trainCodebooks — the round-11
      // path q151/q153 gate)
      // clustered mode trains and serves the RESIDUAL code family —
      // direct codes quantize away the within-cluster signal on tight
      // clusters (measured here: direct 0.80 vs residual ≥0.9 at the
      // fixed budget), which is exactly why q153/q181 ship the variant
      val ((cents, codebooks), tTrain) = timed {
        val c = IvfFlat.train(trainBase, seeds, iters = 3)
        val cb =
          if (clustered) {
            val seedRows = IvfFlat.assign(
                trainBase.filter(col("vec_id") < 64), c)
              .orderBy("vec_id").select("embedding", "cluster").collect()
            val seedResid = seedRows.map { r =>
              val emb = r.getSeq[Float](0).toArray
              val cc = c(r.getInt(1) - 1)
              Array.tabulate(emb.length)(i => emb(i).toDouble - cc(i).toDouble)
            }.toSeq
            val initR = (0 until pqM).map(m =>
              seedResid.map(_.slice(m * pqSub, (m + 1) * pqSub)))
            PqAdc.trainCodebooksResidual(
              IvfFlat.assign(trainBase, c), c, initR, pqSub, iters = 2)
          } else PqAdc.trainCodebooks(trainBase, initCbs, pqSub, iters = 2)
        (c, cb)
      }
      val ((encoded, _), tEncode) = timed {
        val a = IvfFlat.assign(vecs, cents)
        val e = (if (clustered) PqAdc.encodeResidual(a, cents, codebooks, pqSub)
                 else PqAdc.encode(a, codebooks, pqSub))
          .localCheckpoint(true)
        (e, e.count())
      }
      val probes = trainBase.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
        .localCheckpoint(true)
      val topK = 10
      // uniform mode: the historical 4-probe/4k-shortlist leg.
      // clustered mode: the q181 operating point at the FIXED budget —
      // shortlist does NOT scale with mult, which is the demonstration.
      val (np, sl) =
        if (clustered) (12, graft.queries.TrainData2.AdcShortlist)
        else (4, 4 * topK)
      val (adc, tAdc) = timed[Set[(Long, Long)]] {
        (if (clustered)
           PqAdc.searchResidual(encoded, probes, cents, codebooks, pqSub,
             nprobe = np, shortlist = sl, k = topK)
         else
           PqAdc.search(encoded, probes, cents, codebooks, pqSub,
             nprobe = np, shortlist = sl, k = topK))
          .select("probe_id", "cand_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val (brute, tBrute) = timed[Set[(Long, Long)]] {
        import org.apache.spark.sql.expressions.Window
        val wk = Window.partitionBy("probe_id")
          .orderBy(col("cosine").desc, col("cand_id"))
        probes.join(vecs.select(col("vec_id").as("cand_id"),
            col("embedding").as("cv")), col("probe_id") =!= col("cand_id"))
          .withColumn("cosine", CosineSimilarity(col("pv"), col("cv")))
          .withColumn("rk", row_number().over(wk))
          .filter(col("rk") <= topK)
          .select("probe_id", "cand_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      // emptiness guard: a degenerate probe set (zero brute-force rows)
      // reads as recall 1.0 — vacuously true, never a 0/0 NaN
      val recall =
        if (brute.isEmpty) 1.0 else brute.count(adc.contains).toDouble / brute.size
      // planted-perturbation Hamming near-dup: ids in groups of 4 share
      // a group hash; members 1..3 flip one distinct bit each, so every
      // in-group pair is within Hamming 2 and groups cluster fully
      val hashed = vecs.select(col("vec_id").as("media_id"),
        xxhash64(expr("vec_id DIV 4"))
          .bitwiseXOR(expr(
            "CASE WHEN vec_id % 4 = 0 THEN CAST(0 AS BIGINT) " +
              "ELSE shiftleft(CAST(1 AS BIGINT), CAST(vec_id % 4 AS INT) * 7) END"))
          .as("phash"))
      val ((nGroups, nDups), tNeardup) = timed {
        val r = graft.engine.Multimodal.nearDupByHash(hashed)
          .agg(countDistinct(when(col("n_members") === 4, col("keeper"))).as("g"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("d")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      println(s"""{"probe":"ann","sf":"$sfDir","mult":$mult,"vectors":$nVec,""" +
        s""""corpus":"${if (clustered) "clustered" else "uniform"}",""" +
        s""""codes":"${if (clustered) "residual" else "direct"}",""" +
        s""""nprobe":$np,"shortlist":$sl,""" +
        s""""dim":$dim,"ivf_k":$ivfK,"pq_m":$pqM,""" +
        s""""train_sec":${f"$tTrain%.2f"},"encode_sec":${f"$tEncode%.2f"},""" +
        s""""adc_sec":${f"$tAdc%.2f"},"brute_sec":${f"$tBrute%.2f"},""" +
        s""""recall_at_$topK":${f"$recall%.3f"},""" +
        s""""neardup_groups":$nGroups,"neardup_dups":$nDups,""" +
        s""""neardup_sec":${f"$tNeardup%.2f"}}""")
      spark.stop()
      return
    }

    val base = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // stride by the id-space BOUND, not the row count — sparse ids would
    // otherwise collide across replicas and silently merge documents
    val n0 = base.agg(max("doc_id")).collect()(0).getLong(0) + 1L

    // SPARK_GRAFT_PROBE=classifier: the round-12 curation scorers — NB
    // train+score (q166/q167) and DSIR select (q169), both TWO-PHASE:
    // train = one hashed-bigram census scan into the 64-cell model,
    // score = one row-local scan under the literal model. Wall should
    // track the corpus (the census + score scans), never the model;
    // replication leaves the per-doc margins of replica 0 docs almost
    // unchanged (each replica adds one salt bigram per doc and scales
    // every bucket census ~mult×, which the fixed-point log deltas
    // absorb), so accuracy should hold flat while docs multiply.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "classifier") {
      val lbase = graft.engine.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("text"))
      val ccorpus = (0 until mult).map { k =>
        lbase.select((col("doc_id") + lit(k * n0)).as("doc_id"), col("lang"),
          (if (k == 0) col("text")
           else concat(col("text"), lit(s" replica$k"))).as("text"))
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val nc = ccorpus.count()
      val (cm, tNb) = timed {
        graft.queries.TrainData3.nbConfusion(
          ccorpus.select(col("doc_id"), col("text"))).collect()
      }
      val nbTotal = cm.map(_.getLong(2)).sum
      val nbCorrect = cm.filter(r => r.getBoolean(0) == r.getBoolean(1))
        .map(_.getLong(2)).sum
      val (nSel, tDsir) = timed {
        graft.queries.TrainData3.dsirSelect(ccorpus)
          .filter(col("sel")).count()
      }
      println(s"""{"probe":"classifier","sf":"$sfDir","mult":$mult,"docs":$nc,""" +
        s""""nb_sec":${f"$tNb%.2f"},"nb_correct":$nbCorrect,"nb_total":$nbTotal,""" +
        s""""dsir_sec":${f"$tDsir%.2f"},"dsir_selected":$nSel}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE=prefixjoin: q157's exact-Jaccard AllPairs/PPJoin
    // kernel — through the SAME private[graft] prefixJoinPairs the gated
    // query ships (runs BEFORE the default salted replication below: it
    // builds its own similarity-controlled corpus and must not pay that
    // checkpoint). Replica 1 appends one token to each original (a
    // planted near-dup pair per base doc — Jaccard ≈ s/(s+5), which
    // clears τ = 0.6 only for docs with s ≥ 8 distinct 5-gram shingles
    // (~12+ words); shorter docs plant a candidate that verify rejects,
    // so the planted-pair linearity is exact on the qualifying subset
    // and approximate on corpora with very short docs); replicas
    // k ≥ 2 salt EVERY word (disjoint
    // shingle space, zero cross-family candidates), so ground truth
    // grows by exactly the planted pairs and all remaining candidate
    // mass is the base corpus's own internal structure repeated once
    // per family — candidates and verified pairs should scale LINEARLY
    // in mult while the df census + prefix join + verify walls track
    // the corpus scan. An exact similarity join over a corpus that is
    // ITSELF quadratically similar pays its output size by definition;
    // that adversarial case belongs to the capped-LSH near-dup path
    // (the default probe), not the exact audit path.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "prefixjoin") {
      import graft.queries.TrainData2
      val pcorpus = (0 until mult).map { k =>
        base.select((col("doc_id") + lit(k * n0)).as("doc_id"),
          (if (k == 0) col("text")
           else if (k == 1) concat(col("text"), lit(" nd1"))
           else concat(lit(s"z${k}_"),
             regexp_replace(col("text"), lit(" "), lit(s" z${k}_")))).as("text"))
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val np = pcorpus.count()
      val ((nCand, nVer), tJoin) = timed {
        val (cand, ver) = TrainData2.prefixJoinPairs(pcorpus)
        (cand.count(), ver.count())
      }
      println(s"""{"probe":"prefixjoin","sf":"$sfDir","mult":$mult,"docs":$np,""" +
        s""""candidates":$nCand,"verified":$nVer,""" +
        s""""join_sec":${f"$tJoin%.2f"}}""")
      spark.stop()
      return
    }
    // SPARK_GRAFT_PROBE=packing: the q58/q68/q180 layout rule under
    // BOTH packedOffsets plans (TrainData4Spec pins offset equality, so
    // the leg measures pure plan cost): the window plan prefix-sums
    // each source shard in ONE task — its wall tracks the largest
    // shard, not the cluster — while the two-pass plan pays a bounded
    // (source, bucket) census + broadcast + within-bucket windows that
    // parallelize across buckets. The probe replicates WITHOUT salting
    // (ids offset per replica, source kept) so shard sizes scale with
    // mult, and reads out an offset checksum both plans must share.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "packing") {
      import graft.queries.TrainData
      // SPARK_GRAFT_PACK_IDS=skewed: fling 1% of doc_ids to negative
      // far-outliers (unique by construction — dense ids stay ≥ 0), so
      // 99% of docs crowd <<1% of the id extent. Round-0 fixed-width
      // bins then put ~the whole corpus in ONE bucket and the probe
      // measures the r16 recursive re-split actually bounding it
      // (max_bucket_docs ≤ bucket_cap in the emitted line).
      val skewed =
        sys.env.getOrElse("SPARK_GRAFT_PACK_IDS", "dense") == "skewed"
      val perDoc0 = (0 until mult).map { k =>
        graft.engine.Tables.documents(spark, sfDir)
          .select(col("source"), (col("doc_id") + lit(k * n0)).as("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
      }.reduce(_ unionByName _)
      val perDoc = (if (skewed)
          perDoc0.withColumn("doc_id",
            when(col("doc_id") % 100 =!= 0, col("doc_id"))
              .otherwise(-(col("doc_id") * lit(1000000L)) - 1L))
        else perDoc0)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val nDocs = perDoc.count()
      val (_, census) = TrainData.packBuckets(perDoc, None)
      val cap = TrainData.packBucketCap(nDocs)
      val maxBucket = census.map(_.getLong(2)).max
      require(maxBucket <= cap,
        s"packing probe: bucket of $maxBucket docs over the $cap cap")
      def sum(p: String): (Long, Long) = {
        val r = TrainData.packedOffsets(perDoc, Some(p))
          .agg(count(lit(1)), coalesce(
            org.apache.spark.sql.functions.sum(
              col("start_off") % lit(1000003L)), lit(0L))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val ((nW, ckW), tWin) = timed(sum("window"))
      val ((nT, ckT), tTwo) = timed(sum("twopass"))
      require(nW == nT && ckW == ckT,
        s"packing probe: plans diverged ($nW/$ckW vs $nT/$ckT)")
      println(s"""{"probe":"packing","sf":"$sfDir","mult":$mult,"docs":$nDocs,""" +
        s""""ids":"${if (skewed) "skewed" else "dense"}",""" +
        s""""buckets":${census.size},"max_bucket_docs":$maxBucket,""" +
        s""""bucket_cap":$cap,"offset_checksum":$ckW,""" +
        s""""window_sec":${f"$tWin%.2f"},""" +
        s""""twopass_sec":${f"$tTwo%.2f"}}""")
      spark.stop()
      return
    }

    // replica k: ids offset by k*n0, text salted with a replica token so
    // copies stay NEAR-dups (high Jaccard) instead of exact dups
    val corpus = (0 until mult).map { k =>
      base.select((col("doc_id") + lit(k * n0)).as("doc_id"),
        if (k == 0) col("text")
        else concat(col("text"), lit(s" replica$k")).as("text"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val n = corpus.count()


    // SPARK_GRAFT_PROBE=sketch: the round-5 operators — corpus-linear
    // sketch builds with CONSTANT state (CMS cells, histogram bins) and
    // vocabulary-bound BPE rounds (the corpus is read once for the word
    // count; every merge round after that touches only the vocab, so
    // round wall should stay flat as the corpus multiplies).
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "sketch") {
      val (words, tWords) = timed {
        corpus.select(explode(split(col("text"), " ")).as("w"))
          .localCheckpoint(true)
      }
      val nTok = words.count()
      val (weights, tVocab) = timed {
        words.groupBy("w").agg(count(lit(1)).as("f")).localCheckpoint(true)
      }
      val vocab = weights.count()
      val (cms, tCms) = timed {
        graft.operators.CountMin.cells(words).localCheckpoint(true)
      }
      val cmsRows = cms.count()
      val (hist, tHist) = timed {
        corpus.select(least(expr("length(text) div 16"), lit(255L)).as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("cnt")).localCheckpoint(true)
      }
      val histRows = hist.count()
      val syms0 = graft.queries.TrainData2.bpeCharSyms(weights)
      // bpeRound already eagerly localCheckpoints its merged output — a
      // second checkpoint here would double-materialize the vocab inside
      // the timed block and inflate the published round numbers
      val bpe = (1 to 3).scanLeft((syms0, 0.0)) { case ((s, _), k) =>
        val ((s2, rec), t) = timed {
          val r = graft.queries.TrainData2.bpeRound(s, k)
          r._2.collect() // force the round (top pair + merge)
          r
        }
        (s2, t)
      }.drop(1).map(_._2)
      // batched rounds (q88): same per-round wall class, up to M=8
      // merges each — the round-count-to-reach-a-vocabulary divides by
      // the reported merges/round
      val bpeBatch = (1 to 2).scanLeft((syms0, 0.0, 0)) { case ((s, _, _), k) =>
        val ((s2, nm), t) = timed {
          val (s2, rec) = graft.queries.TrainData2.bpeBatchRound(s, k)
          (s2, rec.collect().length)
        }
        (s2, t, nm)
      }.drop(1)
      // doc-grain tokenize (q163's kernel, train INCLUDED): re-collapses
      // the corpus to the vocab, re-runs the flat rounds, then one
      // broadcast-vocab tokenize scan — total wall should track the two
      // corpus scans (word count + tokenize) since the rounds are flat
      val (bpeMass, tTokenize) = timed {
        graft.queries.TrainData2.bpeDocTokens(corpus)
          .agg(sum("bpe_tok")).collect()(0).getLong(0)
      }
      // unigram-LM train + encode (q164/q165's kernel): the candidate
      // census and both Viterbi passes are VOCAB-grain (row-local folds
      // over the word relation), the encode is one broadcast-vocab
      // corpus scan — so total wall should sit in the same
      // two-corpus-scan class as BPE tokenize and stay corpus-linear.
      val ((uniVocab, uniMass), tUnigram) = timed {
        val (uv, uo) = graft.queries.TrainData3.uniModelFromWords(weights)
        val vlen = weights.withColumn("n_p",
          size(graft.queries.TrainData3.uniSegCol(col("w"), uv, uo)).cast("long"))
        val mass = corpus
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .join(broadcast(vlen.select("w", "n_p")), "w")
          .agg(sum("n_p")).collect()(0).getLong(0)
        (uv.size, mass)
      }
      // PRUNED unigram train + encode (q171's kernel): identical corpus
      // legs (uniCounts1 + one broadcast-vocab encode scan) plus the
      // prune itself — driver array ops over the ≤|alphabet|+UniMultiCap
      // collected census. If the prune were anything but vocab-sized,
      // prune_sec would diverge from unigram_sec as the corpus
      // multiplies; matching walls ARE the measurement.
      val ((pruneVocab, pruneMass), tPrune) = timed {
        val (pv, po) = graft.queries.TrainData3.uniModelPrunedFromWords(weights)
        val vlen = weights.withColumn("n_p",
          size(graft.queries.TrainData3.uniSegCol(col("w"), pv, po)).cast("long"))
        val mass = corpus
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .join(broadcast(vlen.select("w", "n_p")), "w")
          .agg(sum("n_p")).collect()(0).getLong(0)
        (pv.size, mass)
      }
      println(s"""{"probe":"sketch","sf":"$sfDir","mult":$mult,"docs":$n,""" +
        s""""tokens":$nTok,"vocab":$vocab,"cms_rows":$cmsRows,"hist_rows":$histRows,""" +
        s""""words_sec":${f"$tWords%.2f"},"vocab_sec":${f"$tVocab%.2f"},""" +
        s""""cms_sec":${f"$tCms%.2f"},"hist_sec":${f"$tHist%.2f"},""" +
        s""""bpe_round_sec":[${bpe.map(t => f"$t%.2f").mkString(",")}],""" +
        s""""bpe_batch_round_sec":[${bpeBatch.map(t => f"${t._2}%.2f").mkString(",")}],""" +
        s""""bpe_batch_merges":[${bpeBatch.map(_._3).mkString(",")}],""" +
        s""""tokenize_mass":$bpeMass,"tokenize_sec":${f"$tTokenize%.2f"},""" +
        s""""unigram_vocab":$uniVocab,"unigram_mass":$uniMass,""" +
        s""""unigram_sec":${f"$tUnigram%.2f"},""" +
        s""""unigram_prune_vocab":$pruneVocab,"unigram_prune_mass":$pruneMass,""" +
        s""""unigram_prune_sec":${f"$tPrune%.2f"}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE=hygiene: the round-7 governance operators with
    // provably-safe scaling shapes — text normalization and canary
    // extraction are scan-fused row-local chains (corpus-LINEAR wall),
    // while the fuzzy-vocab deletion-neighborhood join is bounded by the
    // VOCABULARY (constant here as the corpus multiplies, so its wall
    // should stay flat — the measured form of "everything after the word
    // count is vocab-sized").
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "hygiene") {
      val (norm, tNorm) = timed {
        corpus
          .withColumn("dirty", concat(
            when(col("doc_id") % 5 === 0, "\t ").otherwise(""), col("text"),
            when(col("doc_id") % 3 === 0, " \u200B\u200B").otherwise("")))
          .withColumn("clean", trim(regexp_replace(regexp_replace(regexp_replace(
            col("dirty"), "[\u200B\u200C\u200D\uFEFF]", ""),
            "[\t\r\n\u00A0]", " "), " +", " ")))
          .agg(sum(when(col("clean") === col("text"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
      }
      val (canary, tCanary) = timed {
        val canaries = spark.range(0, 5).select(
          concat(lit("canary-"), md5(concat(lit("canary:"),
            col("id").cast("string")))).as("guid"))
        corpus
          .select(explode(regexp_extract_all(
            when(col("doc_id") % 37 === 0,
              concat(col("text"), lit(" canary-"),
                md5(concat(lit("canary:"), (col("doc_id") % 5).cast("string")))))
              .otherwise(col("text")),
            lit("canary-[0-9a-f]{32}"), lit(0))).as("guid"))
          .join(broadcast(canaries), "guid").count()
      }
      val (fuzzy, tFuzzy) = timed {
        val vocab = corpus.select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) >= 3)
          .groupBy("w").agg(count(lit(1)).as("f")).localCheckpoint(true)
        val vars = vocab.withColumn("v", explode(expr(
          "array_union(array(w), transform(sequence(1, length(w))," +
            " i -> concat(substring(w, 1, i - 1), substring(w, i + 1))))")))
        vars.select(col("w").as("w1"), col("v"))
          .join(vars.select(col("w").as("w2"), col("v")), "v")
          .filter(col("w1") < col("w2")).select("w1", "w2").distinct()
          .filter(levenshtein(col("w1"), col("w2")) === 1).count()
      }
      println(s"""{"probe":"hygiene","sf":"$sfDir","mult":$mult,"docs":$n,""" +
        s""""restored":$norm,"canary_hits":$canary,"fuzzy_pairs":$fuzzy,""" +
        s""""normalize_sec":${f"$tNorm%.2f"},"canary_sec":${f"$tCanary%.2f"},""" +
        s""""fuzzy_sec":${f"$tFuzzy%.2f"}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE=warehouse: the round-7/8 analytics kernels with
    // declared scaling shapes — PIT reads (q119: one partitioned LEAD
    // window + a row-local filter, key-linear), rolling 24 h distinct
    // (q137: fans DEDUPED user-hours ×24, user-hour-linear), transition
    // matrix (q139: per-user LEAD then a |types|²-grain census,
    // event-linear) and two-hop reach (q138: BOTH wedge paths on the
    // same graph — a planted hub makes the naive Σdeg² mass visible and
    // the oriented path's bound measurable, the evidence behind its
    // census-driven selection).
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "warehouse") {
      val ev0 = graft.engine.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val u0 = ev0.agg(max("user_id")).collect()(0).getLong(0) + 1L
      val e0 = ev0.agg(max("event_id")).collect()(0).getLong(0) + 1L
      val events = (0 until mult).map(k =>
          ev0.select((col("user_id") + lit(k * u0)).as("user_id"),
            (col("event_id") + lit(k * e0)).as("event_id"),
            col("event_type"), col("ts")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val nEv = events.count()
      val (nRoll, tRoll) = timed {
        val uh = events
          .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("h"))
          .distinct().localCheckpoint(true)
        val hours = uh.select(col("h").as("rh")).distinct()
        uh.select(col("user_id"), col("h"),
            explode(sequence(col("h"), col("h") + 23)).as("rh"))
          .join(hours, Seq("rh"), "left_semi")
          .groupBy("rh").agg(countDistinct("user_id").as("n")).count()
      }
      val (nTrans, tTrans) = timed {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("t"), col("event_id"))
        events
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type").agg(count(lit(1))).count()
      }
      val ord0 = graft.engine.Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate"), col("o_totalprice"))
      val c0 = ord0.agg(max("o_custkey")).collect()(0).getLong(0) + 1L
      val k0 = ord0.agg(max("o_orderkey")).collect()(0).getLong(0) + 1L
      val orders = (0 until mult).map(k =>
          ord0.select((col("o_custkey") + lit(k * c0)).as("o_custkey"),
            (col("o_orderkey") + lit(k * k0)).as("o_orderkey"),
            col("o_orderstatus"), col("o_orderdate"), col("o_totalprice")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val nOrd = orders.count()
      // q142's two Pareto rank paths over mult× the customer base: the
      // exact single-partition window vs the value-census rank, verified
      // identical via a full-assignment fingerprint (bit_xor of per-row
      // (custkey, rk) hashes — order-free, overflow-free; each pair
      // appears exactly once so xor cancellation cannot hide a diff)
      val rev = orders.groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .localCheckpoint(true)
      val nCust = rev.count()
      def rankFp(scalePath: Boolean): Long =
        graft.queries.Warehouse.paretoRank(rev, scalePath)
          .agg(expr("bit_xor(xxhash64(o_custkey, rk))")).collect()(0).getLong(0)
      val (fpExact, tParetoExact) = timed { rankFp(scalePath = false) }
      val (fpCensus, tParetoCensus) = timed { rankFp(scalePath = true) }
      require(fpExact == fpCensus,
        s"pareto rank paths disagree: fingerprint $fpExact vs $fpCensus")
      val (nPit, tPit) = timed {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        val d = lit("1998-06-01").cast("timestamp")
        orders
          .select(col("o_custkey"), col("o_orderstatus").as("status"),
            col("o_orderdate").as("valid_from"),
            lead(col("o_orderdate"), 1).over(w).as("valid_to"))
          .filter(col("valid_from") <= d &&
            (col("valid_to").isNull || col("valid_to") > d))
          .groupBy("status").agg(count(lit(1))).count()
      }
      // two-hop: same synthetic adjacency as q138 over mult× the node
      // count, PLUS one planted hub (node 0 linked to every 20th node)
      // so the Σdeg² census actually fires the way a hub-heavy real
      // graph would
      val nNodes = n // corpus docs × mult
      val ids = corpus.select(col("doc_id")).localCheckpoint(true)
      val baseAdj = ids
        .select(col("doc_id").as("src"),
          explode(array(lit(1), lit(2), lit(3))).as("j"))
        .select(col("src"),
          ((col("src") * col("src") * 31 + col("j") * 97) % nNodes).as("dst"))
      val hubAdj = ids.filter(col("doc_id") % 20 === 0 && col("doc_id") =!= 0)
        .select(lit(0L).as("src"), col("doc_id").as("dst"))
      val adj = baseAdj.unionByName(hubAdj)
        .filter(col("dst") =!= col("src"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct().localCheckpoint(true)
      val sym = adj.select(col("u").as("a"), col("v").as("b"))
        .unionAll(adj.select(col("v").as("a"), col("u").as("b")))
        .localCheckpoint(true)
      val deg = sym.groupBy("a").agg(count(lit(1)).as("deg")).localCheckpoint(true)
      val fanout = deg.agg(sum(col("deg") * col("deg"))).collect()(0).getLong(0)
      val nEdges = adj.count()
      // (nodes, Σ per-node distinct reach): the SUM is the real equality
      // check — the node count alone is the number of non-isolated nodes,
      // identical for any wedge enumeration no matter how wrong
      def reachStats(hop2: DataFrame): (Long, Long) = {
        val r = sym.select(col("a"), col("b")).unionAll(hop2)
          .filter(col("a") =!= col("b"))
          .groupBy("a").agg(countDistinct("b").as("r"))
          .agg(count(lit(1)).as("n"), sum(col("r")).as("mass")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val ((nNaive, massNaive), tNaive) = timed {
        reachStats(sym.join(sym.select(col("a").as("b"), col("b").as("c")), Seq("b"))
          .select(col("a"), col("c").as("b")))
      }
      val ((nOri, massOri), tOri) = timed {
        // the SAME kernel q138 ships (operators/Wedges) — the probe
        // benchmarks the shipping algorithm, not a copy that can drift
        reachStats(graft.operators.Wedges.orientedTwoHop(adj, deg))
      }
      require(nNaive == nOri && massNaive == massOri,
        s"two-hop paths disagree: nodes $nNaive vs $nOri, mass $massNaive vs $massOri")
      println(s"""{"probe":"warehouse","sf":"$sfDir","mult":$mult,""" +
        s""""events":$nEv,"orders":$nOrd,"customers":$nCust,""" +
        s""""nodes":$nNodes,"edges":$nEdges,""" +
        s""""deg2_fanout":$fanout,"roll_rows":$nRoll,"trans_cells":$nTrans,""" +
        s""""pit_rows":$nPit,"twohop_nodes":$nNaive,"twohop_mass":$massNaive,""" +
        s""""roll_sec":${f"$tRoll%.2f"},"trans_sec":${f"$tTrans%.2f"},""" +
        s""""pit_sec":${f"$tPit%.2f"},""" +
        s""""pareto_exact_sec":${f"$tParetoExact%.2f"},""" +
        s""""pareto_census_sec":${f"$tParetoCensus%.2f"},""" +
        s""""twohop_naive_sec":${f"$tNaive%.2f"},""" +
        s""""twohop_oriented_sec":${f"$tOri%.2f"}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE=repetition: the round-9 text-quality kernels —
    // q154's tagged 2/3/4-gram top-count census, q155's stride-1
    // duplicated-window census, q156's unigram-LM surprisal rescore —
    // through the SAME private[graft] kernels the gated queries ship
    // (repetitionVerdicts/windowDupRuns/surprisalScores), so a
    // threshold or tokenizer change cannot drift the published numbers.
    // Replication makes the window census the DENSE case: all but the
    // single salt-spanning window per replica doc duplicate the
    // original (global freq ≥ mult), so the probe measures that a
    // highly-repeated span costs its occurrence count (partial-agg on
    // the digest key), never an occurrence-pair square. The surprisal
    // vocabulary stays ~constant as the corpus multiplies (each replica
    // adds one salt token), so the LM exchange stays flat while the
    // scoring pass goes corpus-linear.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "repetition") {
      import graft.queries.TrainData2
      val (nFlagged, tRep) = timed {
        TrainData2.repetitionVerdicts(corpus)
          .filter(col("f2") || col("f3") || col("f4")).count()
      }
      val ((nDupDocs, maxRun), tWin) = timed {
        // coalesce: a corpus with NO duplicated window yields (0, null)
        // and the probe must report 0, not NPE
        val r = TrainData2.windowDupRuns(corpus)
          .agg(count(lit(1)), coalesce(max("max_run"), lit(0L))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val vocabN = corpus
        .select(explode(split(col("text"), " ")).as("word")).distinct().count()
      val (nHead, tLm) = timed {
        TrainData2.surprisalScores(corpus.withColumn("source", lit("probe")))
          .filter(expr("score * 100 div n_tok") <= TrainData2.SurprisalHeadMax)
          .count()
      }
      // the q159/q161 action kernels over the SAME dense corpus: nearly
      // every replica doc carries a giant cut span, so the rebuild's
      // anti-range join runs at its worst case (almost all tokens cut)
      val ((nCutDocs, removedTot), tCut) = timed {
        val r = TrainData2.spanRemovalPlan(corpus)
          .agg(count(lit(1)), coalesce(sum("removed_words"), lit(0L)))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val (keptTot, tApply) = timed {
        TrainData2.cutApplyPlan(corpus)
          .agg(coalesce(sum("kept_tok"), lit(0L))).collect()(0).getLong(0)
      }
      println(s"""{"probe":"repetition","sf":"$sfDir","mult":$mult,"docs":$n,""" +
        s""""rep_flagged":$nFlagged,"dup_docs":$nDupDocs,"max_run":$maxRun,""" +
        s""""vocab":$vocabN,"head_docs":$nHead,""" +
        s""""cut_docs":$nCutDocs,"removed_words":$removedTot,""" +
        s""""kept_tok":$keptTot,""" +
        s""""rep_sec":${f"$tRep%.2f"},"window_sec":${f"$tWin%.2f"},""" +
        s""""lm_sec":${f"$tLm%.2f"},"cut_sec":${f"$tCut%.2f"},""" +
        s""""apply_sec":${f"$tApply%.2f"}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE=retrieval: q158's BM25 kernel — through the SAME
    // private[graft] bm25PerDoc + Bm25Query the gated query ships. The
    // broadcasts (term list, df relation, 1-row corpus scalars) are
    // constant-sized as the corpus multiplies, so the probe measures
    // that retrieval cost is ONE scan + one (doc, term)-keyed partial
    // aggregation — corpus-linear, with the top-k a TakeOrderedAndProject
    // whose driver share is k rows regardless of corpus size.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "neardup") == "retrieval") {
      import graft.queries.TrainData2
      val ((hitDocs, topScore), tBm) = timed {
        val r = TrainData2.bm25PerDoc(corpus, TrainData2.Bm25Query)
          .agg(count(lit(1)), coalesce(max("score_fp"), lit(0L))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      println(s"""{"probe":"retrieval","sf":"$sfDir","mult":$mult,"docs":$n,""" +
        s""""hit_docs":$hitDocs,"top_score":$topScore,""" +
        s""""bm25_sec":${f"$tBm%.2f"}}""")
      spark.stop()
      return
    }

    val (sigs, tSig) = timed {
      MinHashLsh.signatures(corpus).localCheckpoint(true)
    }
    val nSigs = sigs.count()
    // same policy knobs as the gated queries — the probe measures the
    // pipeline that actually ships, not a drifted copy
    val (cand, tCand) = timed {
      MinHashLsh.candidates(sigs, maxBucket = graft.queries.TrainData.LshMaxBucket)
        .filter(col("n_sig_match") >= graft.queries.TrainData.LshStrongMatch)
        .select("doc_a", "doc_b")
        .localCheckpoint(true)
    }
    val nPairs = cand.count()
    val (comps, tCc) = timed {
      ConnectedComponents(cand, "doc_a", "doc_b").localCheckpoint(true)
    }
    val nNodes = comps.count()
    val nClusters = comps.select("comp").distinct().count()

    println(s"""{"probe":"neardup","sf":"$sfDir","mult":$mult,"docs":$n,""" +
      s""""sigs":$nSigs,"pairs":$nPairs,"clustered_nodes":$nNodes,""" +
      s""""clusters":$nClusters,"sig_sec":${f"$tSig%.2f"},""" +
      s""""cand_sec":${f"$tCand%.2f"},"cc_sec":${f"$tCc%.2f"}}""")
    spark.stop()
  }
}
