package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays with
  * the exact left-fold accumulation order of the declarative form it
  * replaces — `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
  * (acc, x) -> acc + x)`, i.e. `((0.0 + a0*b0) + a1*b1) + …` — which
  * is also the order the DuckDB oracle's `oDot`/`list_reduce` mirrors,
  * so results are bitwise identical.
  *
  * Why (r14, guide §1.2 "per-task work"): `zip_with`/`aggregate` are
  * higher-order functions, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) with a closure dispatch and a boxed intermediate
  * array per row. The similarity tier's norm/dot hot paths (s14 per-row
  * norms, s17's brute-force truth pass over query × corpus pairs) spent
  * most of their time there. Same move as [[CosineSimilarity]].
  *
  * Null/length contract: a NULL array yields NULL (nullSafeEval); NULL
  * elements and length mismatches throw (house fail-fast — zip_with
  * would have nulled the row silently; the vector tables are fixed-
  * width non-null, so neither occurs).
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold expects two ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fold"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotFold.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.DotFold.dot($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotFold {
  /** Shared by interpreted eval and generated code. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_fold: length mismatch ${n} vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }
}
