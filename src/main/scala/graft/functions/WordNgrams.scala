package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native Catalyst expression — the general-n
  * sibling of [[WordBigrams]] (same motivation: the declarative
  * `transform(sequence(...), ...)` formulation evaluates its lambda
  * interpreted, off the whole-stage-codegen path, and the shingle loop is
  * the hot path of every span/dedup pipeline).
  *
  * Semantics match `split(text, " ")` + sliding window of `n` tokens
  * joined by single spaces, empty tokens preserved; fewer than `n` tokens
  * yields an empty array, never an error. `n` is a plan-time constant
  * (compiled into the generated call), not a per-row column.
  */
object WordNgrams {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(c), n))
  }
}

case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    WordNgrams.compute(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}
