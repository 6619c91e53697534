package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization ENCODE as a native codegen'd expression — the
  * hot corpus-side scalar of the IVFADC path (reference capability:
  * similarity search over an embedding column; [[CosineSimilarity]] is
  * the coarse-assign twin).
  *
  * The composed formulation — per subspace an `array_position(array(K
  * aggregate(zip_with(...)) folds), array_min(...))` — evaluates every
  * fold's lambdas INTERPRETED per element (higher-order functions are
  * excluded from whole-stage codegen), and at M=8/K=8 those 64 folds per
  * row dominated the encode scan. This compiles to one tight M·K·subDim
  * loop and keeps the surrounding projection codegen'd.
  *
  * Arithmetic is IDENTICAL to the composed form (and the DuckDB oracle's
  * `list_aggregate(..., 'sum')`): per codeword a LEFT-TO-RIGHT double
  * accumulation of squared diffs, argmin per subspace with ties → the
  * LOWEST (1-based) code — exactly `array_position`'s first-occurrence
  * semantics. The codebooks are bounded driver-side model state carried
  * into generated code as a reference object (same contract as the plan
  * literals they replace).
  *
  * The input must ALREADY be guarded (callers wrap in
  * [[graft.operators.PqAdc.encode]]'s `when(size === M·subDim,
  * coalesce(codes, raise_error)).otherwise(raise_error)` policy): a
  * short vector here returns NULL rather than reading out of bounds,
  * and a correctly-sized vector with a NULL ELEMENT also returns NULL
  * (see [[compute]]) — in both cases the guard's raise_error is what
  * surfaces, never a silent code. A bare use of this expression without
  * that guard would let NULL codes sort FIRST in an ascending ADC scan.
  */
object PqEncode {
  /** Static kernel shared by interpreted eval and generated code.
    * A NULL ELEMENT anywhere in the vector yields NULL codes — ArrayData
    * getters read a null slot as 0.0, which would silently encode a
    * corrupted vector with plausible codes (the composed fold this
    * kernel replaced nulled the distance instead; NULL-out preserves
    * that loud-by-absence policy). */
  def compute(vec: ArrayData, cbs: Array[Array[Array[Double]]], subDim: Int,
              isFloat: Boolean): Any = {
    val mCnt = cbs.length
    if (vec.numElements() < mCnt * subDim) return null
    var p = 0
    val dim = mCnt * subDim
    while (p < dim) {
      if (vec.isNullAt(p)) return null
      p += 1
    }
    val out = new Array[Any](mCnt)
    var mi = 0
    while (mi < mCnt) {
      val off = mi * subDim
      val cb = cbs(mi)
      var bestIdx = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < cb.length) {
        val cw = cb(k)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (isFloat) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val d = x - cw(i)
          acc += d * d
          i += 1
        }
        // strict < keeps the FIRST minimal code — array_position ties
        if (acc < bestD) { bestD = acc; bestIdx = k }
        k += 1
      }
      out(mi) = bestIdx + 1
      mi += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, codebooks: Seq[Seq[Array[Double]]], subDim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(c),
      codebooks.map(_.toArray).toArray, subDim))
  }
}

case class PqEncodeExpr(child: Expression,
                        codebooks: Array[Array[Array[Double]]],
                        subDim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float> or array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], codebooks, subDim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val res = ctx.freshName("pqCodes")
      s"""
         |Object $res = graft.functions.PqEncode.compute($c, $cbRef, $subDim, $isFloat);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}
