package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained-BPE token count of one word under a LITERAL merge list, as a
  * native codegen'd expression — the serve-side scalar of the BPE
  * tokenizer family (q173's persisted-model serve and the streaming
  * gate [[graft.streaming.Streams.bpeTokenizeFilter]] share it).
  *
  * Why a kernel: the composed formulation — one `aggregate` fold per
  * round chained by `foldLeft` over Column expressions — duplicates the
  * ENTIRE previous round's expression subtree at every reference the
  * next round makes to its input array (`size`, two `element_at`s, the
  * `sequence` bound), and interpreted HOF evaluation re-runs each copy
  * per element: the work grows ~5^rounds, measured 3.6 s for a
  * THIRTY-ONE-row vocabulary at 3 rounds. This kernel is one linear
  * pass per round inside whole-stage codegen.
  *
  * Semantics are value-identical to the composed fold (and the q163
  * oracle's gaps-and-islands replay): symbols start as CODE POINTS
  * (Spark's `substr(i, 1)` grain — also DuckDB's), each round scans its
  * OWN input left to right, emits the merged symbol where
  * (s[i], s[i+1]) is one of the round's pairs and skips i+1 — so
  * in-round products never re-merge, and pairwise symbol-disjointness
  * within a round (the trainers' construction) makes the greedy skip
  * equal the islands parity rule. The empty word counts 0 symbols.
  */
object BpeTokLen {
  /** Static kernel shared by interpreted eval and generated code.
    * `merges(r)` is round r's pairs as (left, right) string arrays. */
  def compute(w: UTF8String, merges: Array[Array[Array[String]]]): Long = {
    val s = w.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + n))
      i += n
    }
    var r = 0
    while (r < merges.length) {
      val round = merges(r)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        var merged = false
        if (j < syms.size - 1) {
          var p = 0
          while (!merged && p < round.length) {
            if (round(p)(0) == syms.get(j) && round(p)(1) == syms.get(j + 1))
              merged = true
            p += 1
          }
        }
        if (merged) { out.add(syms.get(j) + syms.get(j + 1)); j += 2 }
        else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      r += 1
    }
    syms.size.toLong
  }

  def apply(c: Column, merges: Seq[Seq[(String, String)]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeTokLenExpr(ColumnBridge.expression(c), merges))
  }
}

/** `merges` stays a Seq of pairs ON the case class so expression
  * equality is structural (an Array field would compare by reference,
  * defeating common-subexpression elimination and plan canonicalization
  * for two identical bpe_tok_len calls); the kernel's array form is
  * derived lazily once per task. */
case class BpeTokLenExpr(child: Expression,
                         merges: Seq[Seq[(String, String)]]) extends UnaryExpression {
  @transient private lazy val mergeArr: Array[Array[Array[String]]] =
    merges.map(_.map(p => Array(p._1, p._2)).toArray).toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_tok_len expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    BpeTokLen.compute(v.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][][]")
      s"${ev.value} = graft.functions.BpeTokLen.compute($c, $mRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokLenExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_tok_len"
}
