package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.Silver

/** ScalaCheck properties (SURVEY.md §5.3) — raw Gen with pinned seeds
  * (the scalatest bridge artifact is not in the offline cache):
  * dedup idempotence/uniqueness, SCD2 invariants over batch sequences. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(String, Int, Int)]] = Gen.listOfN(30,
    for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      ver <- Gen.choose(0, 5)
      v <- Gen.choose(0, 100)
    } yield (k, ver, v))

  test("dedupLatest: one row per key, idempotent, keeps ordered max") {
    samples(rowsGen, 10).foreach { rows =>
      val df = rows.toDF("k", "ver", "v")
      val out = Silver.dedupLatest(df, Seq("k"), Seq($"ver".desc, $"v".desc))
      val collected = out.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      assert(collected.map(_._1).distinct.length == collected.length)
      assert(collected.map(_._1).toSet == rows.map(_._1).toSet)
      assert(collected.toSet.subsetOf(rows.toSet))
      val twice = Silver.dedupLatest(out, Seq("k"), Seq($"ver".desc, $"v".desc))
      assert(twice.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
        == collected.toSet)
      rows.groupBy(_._1).foreach { case (k, grp) =>
        val want = grp.maxBy(t => (t._2, t._3))
        assert(collected.find(_._1 == k).contains(want))
      }
    }
  }

  private val batchesGen: Gen[List[List[(String, Int)]]] = Gen.listOfN(4,
    Gen.listOfN(6, for {
      k <- Gen.oneOf("u", "v", "w")
      f <- Gen.choose(1, 3)
    } yield (k, f)))

  test("scd2: exactly one current row per key; history intervals chain") {
    samples(batchesGen, 5).foreach { batches =>
      val dims = batches.zipWithIndex.foldLeft(
        Seq.empty[(String, java.lang.Long, Date, Date, Boolean)].toDF(
          "k", "followers", "valid_from", "valid_to", "is_current")) {
        case (dim, (batch, i)) =>
          val eff = Date.valueOf(s"2024-0${i + 1}-01")
          val latest = batch.groupBy(_._1).map { case (k, g) => (k, g.last._2.toLong) }.toSeq
          Silver.scd2Apply(dim, latest.toDF("k", "followers"),
            "k", Seq("followers"), lit(eff))
      }
      val out = dims.collect()
      out.map(_.getString(0)).distinct.foreach { k =>
        val rows = out.filter(_.getString(0) == k)
        assert(rows.count(_.getAs[Boolean]("is_current")) == 1)
        rows.foreach { r =>
          assert(r.getAs[Boolean]("is_current") == (r.getAs[Date]("valid_to") == null))
        }
        val froms = rows.map(_.getAs[Date]("valid_from").toString).sorted
        assert(froms.distinct.length == froms.length)
      }
    }
  }
}
