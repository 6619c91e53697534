package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-nibble feature buckets of a document's word bigrams, as one
  * native codegen'd kernel — DISTINCT (Bernoulli grain: the trained
  * quality classifier q166/q167 and its streaming twin) or one element
  * per occurrence (multinomial grain: DSIR q169 and its streaming
  * twin).
  *
  * Semantics are value-identical to the composed batch formulation the
  * oracle replays: `split(text, " ")` (trailing empties kept) →
  * adjacent-pair bigrams ([[WordBigrams]]) → `md5(prefix || bigram)` →
  * Σ_{n<8} hexNibble(n)·16ⁿ mod `buckets` (the codebase's little-endian
  * 8-nibble compose) → DISTINCT. JVM `MessageDigest("MD5")` over UTF-8
  * bytes produces exactly Spark's `md5()` hex, and the nibble walk
  * reads high-nibble-first per byte — the hex-string character order
  * `substr(__h, n+1, 1)` sees.
  *
  * Why a kernel: the composed pipeline pays either a per-OCCURRENCE
  * relational DISTINCT (a corpus-bigram-sized shuffle) or an
  * interpreted per-element HOF lambda (8 conv+substring calls per
  * bigram) — both measured ~1 s of q167's wall at sf0.1. Here the
  * per-doc set dedups in place and only ≤ `buckets` rows per doc ever
  * leave the scan, inside whole-stage codegen. Output order is
  * first-occurrence (set semantics downstream; consumers group or fold,
  * never index). 0- or 1-token docs yield an empty array.
  */
object HashBucketSet {
  /** Static kernel shared by interpreted eval and generated code.
    * `dedup = false` keeps one element per bigram OCCURRENCE in order —
    * the multinomial grain (DSIR's count features); `dedup = true`
    * keeps the first occurrence of each bucket — the Bernoulli grain
    * (the NB classifier's presence features). */
  def compute(s: UTF8String, prefix: UTF8String, buckets: Int,
              dedup: Boolean): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val p = prefix.toString
    val seen = if (dedup) new java.util.LinkedHashSet[java.lang.Long]() else null
    val all = if (dedup) null else new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      val g = p + toks(i) + " " + toks(i + 1)
      val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var n = 0
      while (n < 8) {
        val b = d(n / 2) & 0xff
        val nib = if (n % 2 == 0) b >>> 4 else b & 0xf
        v += nib.toLong << (4 * n)
        n += 1
      }
      if (dedup) seen.add(v % buckets) else all(i) = v % buckets
      i += 1
    }
    if (!dedup) return new GenericArrayData(all)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** DISTINCT buckets (Bernoulli grain). */
  def apply(c: Column, prefix: String, buckets: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HashBucketSetExpr(ColumnBridge.expression(c),
      prefix, buckets, dedup = true))
  }

  /** One bucket per bigram occurrence (multinomial grain). */
  def list(c: Column, prefix: String, buckets: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HashBucketSetExpr(ColumnBridge.expression(c),
      prefix, buckets, dedup = false))
  }
}

case class HashBucketSetExpr(child: Expression, prefix: String, buckets: Int,
                             dedup: Boolean) extends UnaryExpression {
  require(buckets >= 1, s"hash_bucket_set: buckets=$buckets must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_bucket_set expects string, got ${other.simpleString}")
    }

  @transient private lazy val prefixUtf8 = UTF8String.fromString(prefix)

  override def nullSafeEval(v: Any): Any =
    HashBucketSet.compute(v.asInstanceOf[UTF8String], prefixUtf8, buckets, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pRef = ctx.addReferenceObj("hbsPrefix", prefixUtf8,
        "org.apache.spark.unsafe.types.UTF8String")
      s"${ev.value} = graft.functions.HashBucketSet.compute($c, $pRef, $buckets, $dedup);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashBucketSetExpr =
    copy(child = newChild)
  override def prettyName: String = "hash_bucket_set"
}
