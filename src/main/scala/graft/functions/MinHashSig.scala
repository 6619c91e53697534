package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k=4 MinHash signature of a text column in ONE narrow pass — md5 each
  * word-bigram shingle, keep the minimum of each 8-hex-char quarter of
  * the digest (the split-a-wide-hash trick; identical values to
  * `min(substring(md5(shingle), ...))` over exploded shingles, so the
  * DuckDB oracle reproduces signatures byte-for-byte).
  *
  * Why an expression and not explode → groupBy(min): the aggregation
  * formulation SHUFFLES every (doc, shingle-hash) row to group them back
  * per doc — at corpus scale that is the near-dup pipeline's largest
  * shuffle, carrying ~|tokens| rows per document. Computed per-row, the
  * signature stage becomes a pure map: no exchange at all, and the only
  * remaining shuffles in LSH candidate generation are the (band, bucket)
  * ones that do real work. Per-row state also makes the signature usable
  * in Structured Streaming without a pre-aggregation (single stateful
  * operator per query stays available for the bucket check itself).
  *
  * Returns a 4-element array `[mh1, mh2, mh3, mh4]`, or NULL for texts
  * with fewer than 2 tokens (no shingles — matches the aggregation
  * formulation, which produces no row for such docs).
  */
object MinHashSig {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < 2) return null
    val md = digest.get()
    val mins = new Array[String](4)
    var i = 0
    while (i < toks.length - 1) {
      md.reset()
      val hash = md.digest((toks(i) + " " + toks(i + 1)).getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(j * 2) = HexChars((hash(j) >> 4) & 0xf)
        hex(j * 2 + 1) = HexChars(hash(j) & 0xf)
        j += 1
      }
      var q = 0
      while (q < 4) {
        val part = new String(hex, q * 8, 8)
        if (mins(q) == null || part.compareTo(mins(q)) < 0) mins(q) = part
        q += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c)))
  }
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = MinHashSig.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute() may return null (sub-2-token text) even for non-null
    // input, so the generated code must re-check after the call.
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.MinHashSig.compute(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }"""
    ev.copy(code = code)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}
