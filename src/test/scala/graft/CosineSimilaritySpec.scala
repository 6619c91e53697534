package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, GraftExtensions}

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(2.0f, 4.0f, 6.0f)),   // parallel -> 1.0
    (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),               // orthogonal -> 0.0
    (Array(0.0f, 0.0f), Array(1.0f, 1.0f))                // zero norm -> null
  ).toDF("a", "b")

  test("matches the composed aggregate/zip_with formulation bit-for-bit") {
    val nonZero = vecs.filter(aggregate($"a", lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")) > 0)
    val composed = nonZero.select(
      (aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate($"a", lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))) *
         sqrt(aggregate($"b", lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))))
        .as("c")).collect()
    val native = nonZero.select(CosineSimilarity($"a", $"b").as("c")).collect()
    composed.zip(native).foreach { case (c, n) =>
      assert(c.getDouble(0) == n.getDouble(0))
    }
    assert(native(0).getDouble(0) == 1.0)
    assert(native(1).getDouble(0) == 0.0)
    // zero-norm -> NULL (try_divide semantics; ANSI division would throw)
    val z = vecs.select(CosineSimilarity($"a", $"b").as("c")).collect()
    assert(z(2).isNullAt(0))
  }

  test("null input and length mismatch return null") {
    val df = Seq(
      (Some(Array(1.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f)))
    ).toDF("a", "b")
    val r = df.select(CosineSimilarity($"a", $"b")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("callable from SQL as cosine_similarity") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                         CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
