package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: keep-first duplicate-gram statistics of
  * an ARRAY<STRING> in ONE hash-set pass.
  *
  * Returns ARRAY<BIGINT> `[n_repeat, rep_chars]` where `n_repeat` is
  * the number of positions i (2-based onward) whose gram equals some
  * EARLIER gram in the same array, and `rep_chars` is the total
  * character length those repeat occurrences carry — exactly the
  * MassiveText repetition quantities t27 reports as ppm.
  *
  * Why native (the s17/mips_buckets lesson, r8): the declarative form
  * is `filter(sequence(2, g), i -> exists(slice(gs, 1, i-1), x -> x =
  * gs[i]))` — O(g²) interpreted lambda steps AND an O(i) array slice
  * allocation per position, the slowest timed cell of round 9 (7.7 s
  * at sf0.1). This expression is one generated O(g) pass keeping a
  * HashSet of seen grams; `DupGramStatsSpec` pins native ≡ declarative
  * on real corpus text, and the DuckDB oracle keeps the quadratic
  * list-form (grading the same contract from the outside).
  *
  * Input contract: ARRAY<STRING> with no null elements (null would
  * silently skew the char mass — throw instead, per the r8 ADVICE on
  * input validation). Empty and 1-gram arrays yield [0, 0].
  */
case class DupGramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_gram_stats expects ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dup_gram_stats"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    var rep = 0L
    var repChars = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"dup_gram_stats: null gram at index $i (input must be null-free)")
      val g = xs.getUTF8String(i)
      if (!seen.add(g)) { rep += 1L; repChars += g.numChars().toLong }
      i += 1
    }
    new GenericArrayData(Array(rep, repChars))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val seen = ctx.freshName("seen")
      val rep = ctx.freshName("rep")
      val repChars = ctx.freshName("repChars")
      s"""
         |int $n = $a.numElements();
         |java.util.HashSet $seen = new java.util.HashSet(Math.max(16, $n * 2));
         |long $rep = 0L;
         |long $repChars = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "dup_gram_stats: null gram at index " + $i + " (input must be null-free)");
         |  }
         |  UTF8String $g = $a.getUTF8String($i);
         |  if (!$seen.add($g)) { $rep += 1L; $repChars += (long) $g.numChars(); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{$rep, $repChars});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
