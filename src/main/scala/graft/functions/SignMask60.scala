package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: 60-bit sign mask of an embedding — bit
  * i−1 set iff v[i] > 0, dims 1..60 (61..64 dropped to keep the mask in
  * positive-BIGINT range in both engines; at production dims the mask
  * is an array of words).
  *
  * This is s16/s31's tier-0 binary-embedding sketch. The declarative
  * form (`aggregate(sequence(1,60), ...)`) is 60 interpreted lambda
  * steps per vector — ~120 boxed closure evaluations each carrying an
  * element_at bound check; this is one generated loop over the first 60
  * slots. Same exact-integer output, so the DuckDB oracle (the 60-step
  * list_reduce) is unchanged — the r11 "hash-identity native rewrite"
  * pattern.
  *
  * Input contract: ARRAY<DOUBLE> with ≥ 60 elements (embeddings are
  * 64-dim); shorter input throws like ANSI element_at would in the HOF
  * form. A null element contributes a clear bit, exactly as the HOF's
  * `IF(null > 0.0, set, 0)` falls to the else branch.
  */
case class SignMask60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_mask60 expects ARRAY<DOUBLE>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    if (xs.numElements() < 60)
      throw new IllegalArgumentException(
        s"sign_mask60: need >= 60 dims, got ${xs.numElements()}")
    var mask = 0L
    var i = 0
    while (i < 60) {
      if (!xs.isNullAt(i) && xs.getDouble(i) > 0.0) mask |= (1L << i)
      i += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val mask = ctx.freshName("mask")
      s"""
         |if ($a.numElements() < 60) {
         |  throw new IllegalArgumentException(
         |    "sign_mask60: need >= 60 dims, got " + $a.numElements());
         |}
         |long $mask = 0L;
         |for (int $i = 0; $i < 60; $i++) {
         |  if (!$a.isNullAt($i) && $a.getDouble($i) > 0.0D) $mask |= (1L << $i);
         |}
         |${ev.value} = $mask;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
