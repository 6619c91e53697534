package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace-split tokens that belong to a fixed set — the
  * language-ID / quality-scoring kernel (stopword hit counting), as a
  * native codegen'd expression.
  *
  * Replaces `size(filter(split(text, " "), x => x.isin(set: _*)))`, whose
  * lambda evaluates INTERPRETED per token (higher-order functions are
  * excluded from whole-stage codegen — same rationale as
  * [[WordBigrams]]). Counts every occurrence (duplicates included),
  * exactly like the declarative form and DuckDB's
  * `len(list_filter(string_split(text, ' '), x -> x IN (...)))`.
  *
  * The set is baked into the expression (a query-constant vocabulary,
  * e.g. stopwords); the generated code probes a shared HashSet — no
  * per-row array materialization at all.
  */
object TokenSetCount {
  /** Static kernel: split once, probe `set` per token. */
  def count(s: UTF8String, set: java.util.HashSet[String]): Int = {
    val toks = s.toString.split(" ", -1)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  def apply(c: Column, tokens: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TokenSetCountExpr(ColumnBridge.expression(c), tokens))
  }
}

case class TokenSetCountExpr(child: Expression, tokens: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](tokens.size * 2)
    tokens.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    TokenSetCount.count(v.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetCount.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCountExpr =
    copy(child = newChild)
  override def prettyName: String = "token_set_count"
}
