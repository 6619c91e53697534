package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation of one word under a LITERAL
  * (piece → integer cost) vocabulary, as a native codegen'd expression —
  * the serve-side kernel of the unigram tokenizer family (the q164/q171
  * use censuses, the q165/q174 encode paths, the streaming gate and the
  * ScaleProbe legs all segment through this).
  *
  * Why a kernel (the [[BpeTokLen]] argument, measured here too): the
  * composed formulation — a row-local `aggregate` fold whose
  * accumulator is an ARRAY OF STRUCTS of every DP prefix state, with
  * UniMaxPiece `try_element_at` map probes, substrings and struct
  * rebuilds per position — is interpreted per element and re-copies the
  * whole accumulator array per step: the suite's unigram queries spent
  * ~19 JVM-CPU-seconds PER REP segmenting a vocab-sized word list
  * (q164/q171 cpuw ≈ 19 at sf0.1). This kernel is the identical DP as
  * one linear pass in compiled code inside whole-stage codegen.
  *
  * Semantics are value-identical to the relational fold
  * ([[graft.queries.TrainData3]]'s `uniSegColRelational`, spec-pinned
  * equal by UniSegSpec) and to the oracle's CTE-unrolled DP:
  *   - symbols are CODE POINTS (Spark `length`/`substr` grain — also
  *     DuckDB's);
  *   - the empty word segments to []; a word longer than `maxW` code
  *     points falls back to single code-point pieces;
  *   - otherwise a DP over positions 1..len minimizing the packed
  *     int64 key `Σcost·keyCost + npieces·keyPiece + boundaryMask`
  *     (candidates j = 1..maxPiece ending at i; a j==1 piece missing
  *     from the vocab costs `oovCost`, so the DP is total; longer
  *     missing pieces contribute no candidate). Key arithmetic is
  *     plain wrapping Long math — bit-identical to the expression
  *     form. The packed mask makes the optimal key unique per boundary
  *     set; on the (construction-impossible) equal-key tie the kernel
  *     replays `array_min`'s struct order by comparing the candidate
  *     SEGMENTATIONS lexicographically, exactly like the struct's
  *     second field.
  */
object UniSeg {
  /** Static kernel shared by interpreted eval and generated code.
    * `pieces`/`costs` are the vocab as parallel sorted arrays (binary
    * search — the map is vocab-sized, lookups are per candidate). */
  def compute(w: UTF8String, pieces: Array[String], costs: Array[Long],
              oovCost: Long, maxPiece: Int, maxW: Int,
              keyCost: Long, keyPiece: Long): GenericArrayData = {
    val s = w.toString
    // code-point grain: cp(i) = char offset of code point i
    val nChars = s.length
    var nCp = 0
    var ci = 0
    while (ci < nChars) { ci += Character.charCount(s.codePointAt(ci)); nCp += 1 }
    val cpOff = new Array[Int](nCp + 1)
    ci = 0; var k = 0
    while (ci < nChars) {
      cpOff(k) = ci; k += 1; ci += Character.charCount(s.codePointAt(ci))
    }
    cpOff(nCp) = nChars

    def cpSub(from: Int, until: Int): String = s.substring(cpOff(from), cpOff(until))

    if (nCp == 0) return new GenericArrayData(Array.empty[Any])
    if (nCp > maxW) {
      val out = new Array[Any](nCp)
      var i = 0
      while (i < nCp) { out(i) = UTF8String.fromString(cpSub(i, i + 1)); i += 1 }
      return new GenericArrayData(out)
    }

    // natural (String.compareTo) order — the same ordering the sorted
    // vocab Seq was built with, so exact-match lookup is well-defined
    def lookup(p: String): Int =
      java.util.Arrays.binarySearch(pieces.asInstanceOf[Array[AnyRef]], p)

    // DP state per position 0..nCp: packed key, backpointer (start
    // position), and the piece that ends there — enough to rebuild the
    // segmentation without materializing every prefix list
    val key = new Array[Long](nCp + 1)
    val back = new Array[Int](nCp + 1)
    val pc = new Array[String](nCp + 1)
    // segmentation of the best path INTO position p, for the
    // (construction-impossible) equal-key tie replay of array_min's
    // struct order — rebuilt lazily, rare path only
    def segOf(lastStart: Int, lastPiece: String): List[String] = {
      var acc: List[String] = List(lastPiece)
      var q = lastStart
      while (q > 0) { acc = pc(q) :: acc; q = back(q) }
      acc
    }
    def segLess(a: List[String], b: List[String]): Boolean = {
      val ia = a.iterator; val ib = b.iterator
      while (ia.hasNext && ib.hasNext) {
        val x = UTF8String.fromString(ia.next())
        val y = UTF8String.fromString(ib.next())
        val c = x.compareTo(y)
        if (c != 0) return c < 0
      }
      ia.isEmpty && ib.hasNext
    }
    var i = 1
    while (i <= nCp) {
      var bestKey = Long.MaxValue
      var bestStart = -1
      var bestPiece: String = null
      var haveBest = false
      var j = 1
      val jMax = if (maxPiece < i) maxPiece else i
      while (j <= jMax) {
        val start = i - j
        val piece = cpSub(start, i)
        val idx = lookup(piece)
        val sc: Long =
          if (idx >= 0) costs(idx)
          else if (j == 1) oovCost
          else Long.MinValue // sentinel: no candidate
        if (sc != Long.MinValue) {
          val mask = if (start > 0) 1L << start else 0L
          val cand = key(start) + sc * keyCost + keyPiece + mask
          val better =
            if (!haveBest) true
            else if (cand != bestKey) cand < bestKey
            else segLess(segOf(start, piece), segOf(bestStart, bestPiece))
          if (better) { bestKey = cand; bestStart = start; bestPiece = piece; haveBest = true }
        }
        j += 1
      }
      // j == 1 always yields a candidate (OOV fallback), so haveBest holds
      key(i) = bestKey; back(i) = bestStart; pc(i) = bestPiece
      i += 1
    }
    var segRev: List[String] = Nil
    var p = nCp
    while (p > 0) { segRev = pc(p) :: segRev; p = back(p) }
    new GenericArrayData(segRev.map(x => UTF8String.fromString(x): Any).toArray)
  }

  def apply(c: Column, vocab: Map[String, Long], oovCost: Long,
            maxPiece: Int, maxW: Int, keyCost: Long, keyPiece: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // sorted pairs: binary-search-ready in the kernel, and a CANONICAL
    // order so two calls with the same Map are structurally equal
    // expressions (common-subexpression elimination keeps working)
    ColumnBridge.column(UniSegExpr(ColumnBridge.expression(c),
      vocab.toSeq.sortBy(_._1), oovCost, maxPiece, maxW, keyCost, keyPiece))
  }
}

/** `vocab` stays a sorted Seq of pairs ON the case class so expression
  * equality is structural (the [[BpeTokLenExpr]] rationale); the
  * kernel's parallel arrays are derived lazily once per task. */
case class UniSegExpr(child: Expression, vocab: Seq[(String, Long)],
                      oovCost: Long, maxPiece: Int, maxW: Int,
                      keyCost: Long, keyPiece: Long) extends UnaryExpression {
  require(vocab.nonEmpty, "uni_seg: empty vocabulary")

  @transient private lazy val pieceArr: Array[String] = vocab.map(_._1).toArray
  @transient private lazy val costArr: Array[Long] = vocab.map(_._2).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"uni_seg expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    UniSeg.compute(v.asInstanceOf[UTF8String], pieceArr, costArr,
      oovCost, maxPiece, maxW, keyCost, keyPiece)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pRef = ctx.addReferenceObj("uniPieces", pieceArr, "java.lang.String[]")
      val cRef = ctx.addReferenceObj("uniCosts", costArr, "long[]")
      s"${ev.value} = graft.functions.UniSeg.compute($c, $pRef, $cRef, " +
        s"${oovCost}L, $maxPiece, $maxW, ${keyCost}L, ${keyPiece}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): UniSegExpr =
    copy(child = newChild)
  override def prettyName: String = "uni_seg"
}
