package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the complete within-doc duplicate-3-gram
  * profile from the WORDS array in ONE generated pass.
  *
  * Returns ARRAY<BIGINT> `[n_grams, n_repeat, gram_chars, rep_chars]`
  * under the exact t27 contract: the word 3-grams are the space-joined
  * windows `words[i..i+2]`, `n_repeat`/`rep_chars` count keep-first
  * repeats and their character mass, `gram_chars` the total gram
  * character mass. Fewer than 3 words → all zeros.
  *
  * Why this exists (r10 bench profile): [[DupGramStats]] removed the
  * O(g²) repeat scan, but the t27 cell was still dominated by
  * MATERIALIZING the gram array itself — `transform(sequence, i ->
  * concat_ws(' ', slice(ws, i, 3)))` allocates a sliced array and a
  * joined string per position, costs ~2.5 s/pass at sf0.1, and the
  * CodegenFallback HOF consumers pay it again. This expression builds
  * each gram with one `UTF8String.concatWs` over three array slots —
  * no intermediate array, no HOF, whole profile in one loop.
  * `DupGramProfileSpec` pins it against plain-Scala truth and against
  * the [[DupGramStats]]-over-grams3 composition; the DuckDB oracle
  * keeps its independent quadratic list form.
  *
  * Input contract: ARRAY<STRING> of WORDS with no null elements (null
  * would corrupt gram identity — throw, per the house validation rule).
  */
case class DupGramProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dup_gram_profile expects ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dup_gram_profile"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    // validate EVERY element up front (not just windowed ones): a <3-word
    // array must still throw on nulls, per the documented contract
    var v = 0
    while (v < n) {
      if (xs.isNullAt(v))
        throw new IllegalArgumentException(
          s"dup_gram_profile: null word at index $v (input must be null-free)")
      v += 1
    }
    val g = if (n < 3) 0 else n - 2
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[UTF8String](Math.max(16, g * 2))
    var rep = 0L
    var repChars = 0L
    var gramChars = 0L
    var i = 0
    while (i < g) {
      val gram = UTF8String.concatWs(sep,
        xs.getUTF8String(i), xs.getUTF8String(i + 1), xs.getUTF8String(i + 2))
      val nc = gram.numChars().toLong
      gramChars += nc
      if (!seen.add(gram)) { rep += 1L; repChars += nc }
      i += 1
    }
    new GenericArrayData(Array(g.toLong, rep, gramChars, repChars))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val sep = ctx.freshName("sep")
      val gram = ctx.freshName("gram")
      val nc = ctx.freshName("nc")
      val seen = ctx.freshName("seen")
      val rep = ctx.freshName("rep")
      val repChars = ctx.freshName("repChars")
      val gramChars = ctx.freshName("gramChars")
      s"""
         |int $n = $a.numElements();
         |for (int $v = 0; $v < $n; $v++) {
         |  if ($a.isNullAt($v)) {
         |    throw new IllegalArgumentException(
         |      "dup_gram_profile: null word at index " + $v + " (input must be null-free)");
         |  }
         |}
         |int $g = ($n < 3) ? 0 : $n - 2;
         |UTF8String $sep = UTF8String.fromString(" ");
         |java.util.HashSet $seen = new java.util.HashSet(Math.max(16, $g * 2));
         |long $rep = 0L;
         |long $repChars = 0L;
         |long $gramChars = 0L;
         |for (int $i = 0; $i < $g; $i++) {
         |  UTF8String $gram = UTF8String.concatWs($sep,
         |    $a.getUTF8String($i), $a.getUTF8String($i + 1), $a.getUTF8String($i + 2));
         |  long $nc = (long) $gram.numChars();
         |  $gramChars += $nc;
         |  if (!$seen.add($gram)) { $rep += 1L; $repChars += $nc; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{(long) $g, $rep, $gramChars, $repChars});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
