package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.{Silver, Star}

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

  /** Minimal bronze slice for [[Star.accountBatch]]: id + account cols +
    * ingestion order. */
  private def accBronze(rows: (String, String, Long, Timestamp)*) =
    rows.toSeq.map { case (id, acct, followers, ing) =>
      (id, acct, s"user-$acct", s"User $acct", followers, 10L, 5L, false, ing)
    }.toDF("id", "account_id", "account_username", "account_display_name",
      "account_followers_count", "account_following_count",
      "account_statuses_count", "account_is_bot", "ingestion_timestamp")

  test("scd2 multi-change-per-run: two snapshots of one account in one batch → one new current row") {
    // SURVEY §7.5(6): the documented divergence from the reference. Its
    // row-at-a-time SCD2 writes BOTH versions when one load carries two
    // snapshots of an account (an expired intermediate + a current row);
    // this engine collapses to latest-per-account BEFORE the SCD2 apply,
    // so one batch yields exactly ONE new current row and no
    // intermediate history — pinned here so the divergence stays a
    // decision, not an accident.
    val now = Timestamp.valueOf("2024-01-02 00:00:00")
    val batch = accBronze(
      ("t1", "a1", 100L, Timestamp.valueOf("2024-01-01 10:00:00")),
      ("t2", "a1", 900L, Timestamp.valueOf("2024-01-01 11:00:00")), // later wins
      ("t3", "a2", 50L, Timestamp.valueOf("2024-01-01 10:30:00")))
    val dim = Star.dimAccount(Star.emptyDimAccount(spark), batch, now)
    val a1 = dim.filter($"account_id" === "a1").collect()
    assert(a1.length == 1, s"one batch must yield ONE a1 row, got ${a1.length}")
    assert(a1(0).getAs[Boolean]("is_current") &&
      a1(0).getAs[Long]("account_followers_count") == 900L,
      "the latest in-batch snapshot must be the surviving current row")

    // and the collapse composes with history: a LATER batch (again with
    // two snapshots) expires the old row and adds exactly one more
    val batch2 = accBronze(
      ("t4", "a1", 1000L, Timestamp.valueOf("2024-01-03 10:00:00")),
      ("t5", "a1", 5000L, Timestamp.valueOf("2024-01-03 11:00:00")))
    val dim2 = Star.dimAccount(dim,
      batch2, Timestamp.valueOf("2024-01-04 00:00:00"))
    val a1h = dim2.filter($"account_id" === "a1")
      .orderBy("valid_from").collect()
    assert(a1h.length == 2, s"history must be expired+current, got ${a1h.length}")
    assert(!a1h(0).getAs[Boolean]("is_current") &&
      a1h(0).getAs[Long]("account_followers_count") == 900L)
    assert(a1h(1).getAs[Boolean]("is_current") &&
      a1h(1).getAs[Long]("account_followers_count") == 5000L)
  }
}
