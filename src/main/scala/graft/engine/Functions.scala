package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.HtmlUnescape

/** Scalar function library — SURVEY.md §2.6 (F1–F15), re-expressed as pure
  * Catalyst column expressions. Everything here stays inside whole-stage
  * codegen (no Scala closures), so the bronze transform chain remains one
  * fused narrow stage per partition at any scale.
  */
object Functions {

  // ── F1: HTML cleaning (reference: src/transformer/text_cleaner.py:16-43) ──
  // <br> → space, strip all tags, unescape entities, collapse whitespace,
  // trim, empty → NULL.
  def cleanHtml(c: Column): Column = {
    val brToSpace = regexp_replace(c, "<br\\s*/?>", " ")
    val noTags    = regexp_replace(brToSpace, "<[^>]+>", "")
    val unescaped = HtmlUnescape(noTags)
    // \s in Java regex misses U+00A0 (which &nbsp; decodes to); Python's \s
    // matches it, so include it explicitly for reference parity.
    val collapsed = trim(regexp_replace(unescaped, "[\\s\\u00A0]+", " "))
    when(collapsed === "", lit(null)).otherwise(collapsed)
  }

  // ── F2: empty-string → NULL (text_cleaner.py:79-99) ──
  def emptyToNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(c)

  // ── F7: date-part extraction (silver_etl.py:95-120) ──
  // dow is normalized to PostgreSQL semantics: 0 = Sunday .. 6 = Saturday
  // (Spark dayofweek is 1 = Sunday — SURVEY §7.5.2).
  def dateKey(d: Column): Column = date_format(d, "yyyyMMdd").cast("int")
  def dow0(d: Column): Column = (dayofweek(d) - 1)
  def isWeekend(d: Column): Column = dayofweek(d).isin(1, 7)
  def dayName(d: Column): Column = date_format(d, "EEEE")
  def monthName(d: Column): Column = date_format(d, "MMMM")

  // ── F8: epoch arithmetic vs a pinned `now` (silver_etl.py:156-160) ──
  def hoursSince(now: Column, ts: Column): Column =
    (unix_timestamp(now) - unix_timestamp(ts)) / lit(3600.0)
  def daysSince(now: Column, ts: Column): Column =
    (unix_timestamp(now) - unix_timestamp(ts)) / lit(86400.0)

  // ── F9: CASE bucketing — influence tier (silver_etl.py:162-167) ──
  // Thresholds rescaled to the c_acctbal domain of the test star schema.
  def influenceTier(balance: Column): Column =
    when(balance >= 9000, "Mega")
      .when(balance >= 5000, "Macro")
      .when(balance >= 1000, "Mid")
      .otherwise("Micro")

  // ── F10: guarded ratios (silver_etl.py:169-173; gold NULLIF divisions) ──
  def safeRatio(num: Column, den: Column): Column =
    when(den > 0, num / den).otherwise(lit(0.0))
  def pctOf(part: Column, total: Column): Column =
    lit(100.0) * part / nullif(total.cast("double"), lit(0.0))

  // ── F11/F15: preview — first 200 chars + ellipsis when truncated ──
  def preview(c: Column, n: Int = 200): Column =
    when(length(c) > n, concat(substring(c, 1, n), lit("...")))
      .otherwise(c)

  // ── F12: CSV-string split → count, with NULL/empty guard (SURVEY §7.5.4) ──
  def csvCount(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(0)).otherwise(size(split(c, ",")))

  // ── F13: CSV-string → exploded lowercase members (models/gold/02:144-155) ──
  def csvExplode(c: Column): Column = explode(split(lower(c), ","))

  // ── P7/P8: data-quality rules (src/transformer/data_quality.py:24-54) ──
  def nullIfNegative(c: Column): Column = when(c < 0, lit(null)).otherwise(c)
  def nullIfLongerThan(c: Column, n: Int): Column =
    when(length(c) > n, lit(null)).otherwise(c)
  def validateInSet(c: Column, valid: Seq[String]): Column =
    when(c.isin(valid: _*), c).otherwise(lit(null))

  // ── Exact (order-independent) money/avg arithmetic ──
  // Doubles sum nondeterministically under parallel partial aggregation, and
  // the test data produces true half-cent quotients where engines round
  // differently — so all money SUM/AVG goes through exact DECIMAL / integer
  // floor arithmetic. See queries/Core.scala call sites and tools/check.py.
  def dec2(c: Column): Column = c.cast("decimal(12,2)")
  def decPct(c: Column): Column = c.cast("decimal(4,2)")
  def sumMoney(c: Column): Column = round(sum(dec2(c)), 2).cast("double")
  /** round_half_up(sum/cnt, scale) via floor((2T+n)/(2n)) on integer units. */
  def avgMoney(c: Column, cnt: Column, scale: Int = 2): Column = {
    val units = (sum(dec2(c)) * math.pow(10, scale).toLong).cast("long")
    floor((units * 2 + cnt) / (cnt * 2)) / math.pow(10, scale)
  }
  /** Same for integer-valued sums (quantities, lengths, counts). */
  def avgIntExact(s: Column, cnt: Column, scale: Int = 2): Column = {
    val p = math.pow(10, scale).toLong
    floor((s.cast("long") * (2 * p) + cnt) / (cnt * 2)) / p.toDouble
  }

  // ── F16 stand-in: deterministic sentiment scoring ──
  // The reference runs a RoBERTa model (sentiment_analyzer.py:70-168); the
  // engine capability is a *pluggable scoring column* + threshold/label
  // post-processing. Stand-in: hash-derived score in [0,1), fully
  // deterministic and codegen'd.
  def standInScore(text: Column): Column =
    (pmod(xxhash64(text), lit(10000L)) / lit(10000.0))
  def sentimentLabel(score: Column, positiveIf: Column, threshold: Double = 0.75): Column =
    when(score < threshold, "Neutral")
      .otherwise(when(positiveIf, "Positive").otherwise("Negative"))
}
