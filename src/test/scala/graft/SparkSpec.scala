package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, one session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // session shared across suites

  /** Reference split-on-space sliding-window shingler (WordNgrams
    * semantics: empty tokens preserved, < n tokens → no grams) — the
    * ONE brute-force implementation shared by WordNgramsSpec and the
    * q154/q155 pins, so the pins cannot drift apart. */
  protected def naiveWordNgrams(text: String, n: Int): Seq[String] = {
    val t = text.split(" ", -1)
    if (t.length < n) Seq.empty
    else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
