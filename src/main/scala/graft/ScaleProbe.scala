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

    val base = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // stride by the id-space BOUND, not the row count — sparse ids would
    // otherwise collide across replicas and silently merge documents
    val n0 = base.agg(max("doc_id")).collect()(0).getLong(0) + 1L
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

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
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
