package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 120-bit majority-vote SimHash over the
  * INTERLEAVED `[hi_0, lo_0, hi_1, lo_1, …]` token-hash array
  * [[GramHashes120]] emits. Returns `ARRAY<BIGINT>` of exactly two
  * elements `[sketch_hi, sketch_lo]`, each a 60-bit majority sketch of
  * its half — together the 120-bit document sketch.
  *
  * Bit j of each half is set iff strictly more tokens have bit j set
  * than clear (the [[SimHash60]] vote rule, applied to 120 counters in
  * the same single generated pass). An empty array yields `[0, 0]`,
  * matching the oracle's empty-fold; an odd-length array (not a valid
  * interleave) throws.
  *
  * Why 120 bits (r12 verdict #1): the 60-bit sketch's 4×15-bit bands
  * have a 32,768-value keyspace per band and a MEASURED ~quadratic
  * band-collision mass (bench/r12_d09_proportionality.json). This
  * sketch bands 4×30-bit — 2^30 values per band — so the
  * common-word-correlated collision class collapses while pigeonhole
  * still covers hamming ≤ 3 (3 flipped bits touch ≤ 3 of 4 disjoint
  * bands).
  *
  * The DuckDB oracle mirrors the same majority rule per half with the
  * 60-pass list_reduce form — integer votes, no FP, equality exact.
  *
  * Input contract: ARRAY<BIGINT>, null-free, even length (throw
  * otherwise, per the house fail-fast rule for sketch pipelines).
  */
case class SimHash120(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash120 expects ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash120"

  override def nullSafeEval(input: Any): Any =
    SimHash120.sketch(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.SimHash120.sketch($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash120 {
  /** Shared by interpreted eval and generated code. */
  def sketch(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    if (n % 2 != 0)
      throw new IllegalArgumentException(
        s"simhash120: odd input length $n (expect interleaved [hi, lo] pairs)")
    val votes = new Array[Int](120)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"simhash120: null token hash at index $i (input must be null-free)")
      val x = xs.getLong(i)
      val base = if (i % 2 == 0) 0 else 60
      var j = 0
      while (j < 60) {
        votes(base + j) += (if (((x >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) hi |= (1L << j)
      if (votes(60 + j) > 0) lo |= (1L << j)
      j += 1
    }
    new GenericArrayData(Array(hi, lo))
  }
}
