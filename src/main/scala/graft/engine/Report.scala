package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Notifier-stage aggregates (reference: src/notifier/discord_notifier.py —
  * summary stats, language distribution, top-5 positive/negative toots and
  * the negative-sentiment alert predicate), as pure DataFrames/values with
  * no webhook side effects.
  */
object Report {

  final case class Summary(nToots: Long, nAccounts: Long, totalEngagement: Long,
                           maxEngagement: Long, minCreatedAt: java.sql.Timestamp,
                           maxCreatedAt: java.sql.Timestamp)

  /** discord_notifier.py:79-111 — scalar run summary. */
  def summary(fact: DataFrame): Summary = {
    val r: Row = fact.agg(
      count(lit(1)).as("n"),
      countDistinct("account_key").as("na"),
      coalesce(sum("total_engagement"), lit(0L)).as("te"),
      coalesce(max("total_engagement"), lit(0L)).as("me"),
      min("created_at").as("minc"),
      max("created_at").as("maxc")).collect()(0)
    Summary(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getTimestamp(4), r.getTimestamp(5))
  }

  /** discord_notifier.py:115-121 — top language distribution. */
  def languageDistribution(fact: DataFrame, topN: Int = 5): DataFrame =
    fact.filter(col("language").isNotNull)
      .groupBy("language").agg(count(lit(1)).as("n_toots"))
      .orderBy(col("n_toots").desc, col("language"))
      .limit(topN)

  /** discord_notifier.py:96-100 — sentiment counts. */
  def sentimentCounts(fact: DataFrame): DataFrame =
    fact.groupBy(coalesce(col("sentiment_label"), lit("Unscored")).as("sentiment"))
      .agg(count(lit(1)).as("n_toots"))

  /** discord_notifier.py:379-384,463-468 — top-k by sentiment polarity
    * (sort desc + head(k), planned as TakeOrderedAndProject). */
  def topBySentiment(fact: DataFrame, label: String, k: Int = 5): DataFrame =
    fact.filter(lower(col("sentiment_label")) === label.toLowerCase)
      .orderBy(col("sentiment_score").desc, col("toot_id"))
      .limit(k)
      .select("toot_id", "sentiment_score", "total_engagement", "language")

  /** Pipeline error alert (reference: main.py:246-258 catches any stage
    * failure and fires discord_notifier.send_error_alert(error_message,
    * stage); the embed is titled "❌ {stage} Error" with the message in a
    * fenced block). Webhook I/O is out of scope; this is the value the
    * notifier would render. */
  final case class ErrorReport(stage: String, errorType: String, message: String) {
    def title: String = s"$stage Error"
    def description: String = s"```\n$message\n```"
  }

  def errorReport(stage: String, e: Throwable): ErrorReport =
    ErrorReport(stage, e.getClass.getSimpleName,
      Option(e.getMessage).getOrElse(e.toString))

  final case class SentimentAlert(triggered: Boolean, negative: Long,
                                  positive: Long, neutral: Long,
                                  percentage: Double)

  /** discord_notifier.py:144-166 — alert when Negative toots outnumber
    * Positive + Neutral combined. Unscored (NULL-label) rows are EXCLUDED
    * from the comparison (the reference's counts dict drops falsy labels)
    * but INCLUDED in the percentage denominator (`negative / len(df)`);
    * `round(x, 2)` in Python is half-even on the double. The reference
    * evaluates `(neg / n) * 100` — divide THEN scale — and the two
    * double roundings differ from `neg * 100.0 / n` on ordinary inputs
    * (neg=23, n=160: 14.37 vs 14.38), so the operand order is pinned. */
  def negativeAlert(fact: DataFrame): SentimentAlert = {
    val r = fact.agg(
      count(lit(1)),
      sum(when(col("sentiment_label") === "Negative", 1L).otherwise(0L)),
      sum(when(col("sentiment_label") === "Positive", 1L).otherwise(0L)),
      sum(when(col("sentiment_label") === "Neutral", 1L).otherwise(0L))).collect()(0)
    val n = r.getLong(0)
    def cnt(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    val (neg, pos, neu) = (cnt(1), cnt(2), cnt(3))
    val pct = if (n == 0) 0.0
      else BigDecimal((neg.toDouble / n) * 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    SentimentAlert(neg > pos + neu, neg, pos, neu, pct)
  }
}
