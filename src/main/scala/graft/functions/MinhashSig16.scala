package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the 16-hash MinHash signature of a
  * gram-value array in ONE generated pass.
  *
  * `minhash_sig16(gvs)[j] == array_min(transform(gvs, v ->
  * pmod(v * A_j + B_j, P)))` for the [[graft.operators.OpUtils]]
  * universal-hash family (A_j, B_j, P = largest prime < 2^30) — the
  * exact value the DuckDB oracle mirrors — but all 16 running minima
  * advance in a single loop over the array.
  *
  * Why (r14 bench profile, guide §1.2 "per-task work"): `transform` /
  * `array_min` are higher-order functions, which Catalyst evaluates
  * INTERPRETED (CodegenFallback) — the signature build ran 16 separate
  * interpreted array traversals per document, each allocating a fresh
  * 16×-derived array just to take its min. That pipeline is the shared
  * d03-family store build (d02/d03/d12/d13/d15/d22/d33/d34), the
  * single most expensive dedup stage in the sf1 sweep. One fused pass
  * does 16 mul+add+mod per element and allocates only the 16-slot
  * output.
  *
  * Cross-engine determinism: v < 2^30 and A_j < P < 2^30 keep
  * v*A_j + B_j < 2^60 — exact in a long, non-negative, so `% P` equals
  * `pmod`. Integer ops only — bit-identical to the HOF form
  * (MinhashSig16Spec pins equality on real corpus grams).
  *
  * Null contract: a NULL input array yields NULL (nullSafeEval); an
  * EMPTY array yields 16 NULL elements — array_min of an empty
  * transform is NULL, and the d03-family relies on under-3-word docs
  * sharing the all-null signature. Null ELEMENTS throw (house
  * fail-fast rule; the gram pipeline never produces them).
  */
case class MinhashSig16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig16 expects ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig16"

  override def nullSafeEval(input: Any): Any =
    MinhashSig16.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinhashSig16.sig($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig16 {
  private val K = graft.operators.OpUtils.MinhashK
  private val P = graft.operators.OpUtils.MinhashP
  private val A = graft.operators.OpUtils.minhashA.toArray
  private val B = graft.operators.OpUtils.minhashB.toArray

  /** Shared by interpreted eval and generated code. */
  def sig(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    if (n == 0) {
      // array_min over an empty transform is NULL per hash — keep the
      // all-null signature contract for under-3-word docs
      return new GenericArrayData(new Array[Any](K))
    }
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"minhash_sig16: null gram value at index $i (input must be null-free)")
      val v = xs.getLong(i)
      var j = 0
      while (j < K) {
        val h = (v * A(j) + B(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
