package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-bigram shingles as a native Catalyst expression.
  *
  * The near-dup pipelines (MinHash signatures, exact Jaccard re-rank) are
  * dominated by per-document shingle generation. The declarative
  * formulation — `transform(sequence(...), i -> concat(element_at(t,i+1),
  * ' ', element_at(t,i+2)))` — evaluates the lambda INTERPRETED per
  * element (higher-order functions are excluded from whole-stage codegen),
  * measured 5-10× slower than codegen'd paths in this repo's hot loops.
  * This expression produces the identical bigram array in one generated
  * call, keeping the scan → explode → hash stage fully codegen'd.
  *
  * Semantics match `split(text, " ")` + adjacent-pair concat exactly,
  * including empty tokens from repeated/leading/trailing spaces (Spark's
  * `split` keeps trailing empty strings: Java `split(regex, -1)`); 0 or 1
  * tokens yield an empty array, never an error.
  */
object WordBigrams {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WordBigramsExpr(ColumnBridge.expression(c)))
  }
}

case class WordBigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = WordBigrams.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBigrams.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): WordBigramsExpr =
    copy(child = newChild)
  override def prettyName: String = "word_bigrams"
}
