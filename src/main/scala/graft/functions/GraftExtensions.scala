package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers graft's custom Catalyst
  * expressions as SQL functions so `spark.sql("SELECT html_unescape(c)")`
  * works alongside the Column API. Wire at build time with
  * `.withExtensions(new GraftExtensions)` or
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`,
  * or onto an already-running session with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      new FunctionIdentifier("html_unescape"),
      new ExpressionInfo(classOf[HtmlUnescapeExpr].getName, "html_unescape"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "html_unescape expects exactly 1 argument")
        HtmlUnescapeExpr(children.head)
      }),
      (
        new FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "cosine_similarity expects exactly 2 arguments")
          CosineSimilarityExpr(children.head, children(1))
        }),
      (
        new FunctionIdentifier("word_bigrams"),
        new ExpressionInfo(classOf[WordBigramsExpr].getName, "word_bigrams"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "word_bigrams expects exactly 1 argument")
          WordBigramsExpr(children.head)
        }),
      (
        new FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNgramsExpr].getName, "word_ngrams"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "word_ngrams expects (text, n) — 2 arguments")
          children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
              WordNgramsExpr(children.head, n)
            case other => throw new IllegalArgumentException(
              s"word_ngrams: n must be an integer literal, got $other")
          }
        }),
      (
        new FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "minhash_sig expects exactly 1 argument")
          MinHashSigExpr(children.head)
        }))

  /** Register into a live session's function registry (extensions given to
    * the builder only apply at first session creation). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
