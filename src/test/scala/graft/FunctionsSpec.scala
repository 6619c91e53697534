package graft

import org.apache.spark.sql.functions._
import graft.engine.{Functions => F}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("v").select(c).collect()(0).get(0)

  test("cleanHtml strips tags, <br> to space, unescapes, collapses, empty->null") {
    val rows = Seq(
      "<p>Hello<br/>world</p>",
      "a &amp; b &lt;tag&gt; &#39;q&#39;",
      "  <div>  </div>  ",
      "a&nbsp;&nbsp;b",
      "no html at all",
      null
    ).toDF("content").select(F.cleanHtml($"content").as("c")).collect().map(_.getString(0))
    assert(rows(0) == "Hello world")
    assert(rows(1) == "a & b <tag> 'q'")
    assert(rows(2) == null) // tags removed, whitespace collapsed to empty
    assert(rows(3) == "a b") // NBSP collapses like whitespace (Python \s parity)
    assert(rows(4) == "no html at all")
    assert(rows(5) == null)
  }

  test("emptyToNull trims before testing") {
    val r = Seq("", "  ", " x ").toDF("v").select(F.emptyToNull($"v")).collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0) && r(2).getString(0) == " x ")
  }

  test("dow0 matches PostgreSQL semantics: 0=Sunday..6=Saturday") {
    // 2024-01-07 is a Sunday, 2024-01-08 a Monday, 2024-01-13 a Saturday
    val r = Seq("2024-01-07", "2024-01-08", "2024-01-13").toDF("d")
      .select(F.dow0(to_date($"d"))).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(0, 1, 6))
  }

  test("isWeekend flags Saturday and Sunday only") {
    val r = Seq("2024-01-05", "2024-01-06", "2024-01-07", "2024-01-08").toDF("d")
      .select(F.isWeekend(to_date($"d"))).collect().map(_.getBoolean(0))
    assert(r.toSeq == Seq(false, true, true, false))
  }

  test("csvCount guards null and blank, counts members") {
    val r = Seq[(String)]("a,b,c").toDF("v").select(
      F.csvCount($"v"), F.csvCount(lit(null).cast("string")), F.csvCount(lit("  "))
    ).collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 0 && r.getInt(2) == 0)
  }

  test("quality rules: negative->null, long language->null, visibility set") {
    val r = Seq((-1L, "abcdefghijk", "friends-only"), (5L, "en", "public"))
      .toDF("n", "lang", "vis")
      .select(F.nullIfNegative($"n"), F.nullIfLongerThan($"lang", 10),
        F.validateInSet($"vis", Seq("public", "unlisted", "private", "direct")))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(r(1).getLong(0) == 5L && r(1).getString(1) == "en" && r(1).getString(2) == "public")
  }

  test("preview truncates with ellipsis only past the limit") {
    val r = Seq("x" * 250, "short").toDF("v")
      .select(F.preview($"v", 200)).collect().map(_.getString(0))
    assert(r(0) == "x" * 200 + "..." && r(1) == "short")
  }

  test("influenceTier threshold edges") {
    val r = Seq(9000.0, 8999.99, 5000.0, 1000.0, 999.99).toDF("b")
      .select(F.influenceTier($"b")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("Mega", "Macro", "Macro", "Mid", "Micro"))
  }

  test("safeRatio guards zero and negative denominators") {
    val r = Seq((10.0, 4.0), (10.0, 0.0), (10.0, -2.0)).toDF("a", "b")
      .select(F.safeRatio($"a", $"b")).collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(2.5, 0.0, 0.0))
  }

  test("avgMoney rounds half-up exactly on true half-cent quotients") {
    // 68128011 cents / 18 = 3784889.5 cents -> half-up 3784890 -> 37848.90
    val df = Seq.fill(17)(0.0).map(_ => 37848.90).toDF("v")
      .union(Seq(37848.81).toDF("v")) // sum = 681280.11
    val r = df.agg(F.avgMoney($"v", count(lit(1)))).collect()(0).getDouble(0)
    assert(r == 37848.90)
  }

  test("avgIntExact: 1/8 at scale 2 rounds half-up to 0.13") {
    val df = Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L).toDF("v")
    val r = df.agg(F.avgIntExact(sum($"v"), count(lit(1)))).collect()(0).getDouble(0)
    assert(r == 0.13)
  }

  test("dateKey and epoch helpers") {
    val r = Seq("2024-03-05").toDF("d")
      .select(F.dateKey(to_date($"d")),
        F.hoursSince(lit("2024-03-06 00:00:00").cast("timestamp"),
          to_date($"d").cast("timestamp")),
        F.daysSince(lit("2024-03-07 00:00:00").cast("timestamp"),
          to_date($"d").cast("timestamp")))
      .collect()(0)
    assert(r.getInt(0) == 20240305)
    assert(r.getDouble(1) == 24.0)
    assert(r.getDouble(2) == 2.0)
  }

  test("pctOf guards zero totals with NULL") {
    val r = Seq((3L, 4L), (3L, 0L)).toDF("p", "t")
      .select(F.pctOf($"p", $"t")).collect()
    assert(r(0).getDouble(0) == 75.0 && r(1).isNullAt(0))
  }

  test("csvExplode lowercases and splits members") {
    val r = Seq("A,b,C").toDF("v").select(F.csvExplode($"v"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("a", "b", "c"))
  }

  test("sentiment stand-in is deterministic and label thresholds hold") {
    val r1 = one(F.standInScore(lit("hello world")))
    val r2 = one(F.standInScore(lit("hello world")))
    assert(r1 == r2)
    val labels = Seq(0.5, 0.75, 0.9).toDF("s")
      .select(F.sentimentLabel($"s", positiveIf = $"s" >= 0.875))
      .collect().map(_.getString(0))
    assert(labels.toSeq == Seq("Neutral", "Negative", "Positive"))
  }
}
