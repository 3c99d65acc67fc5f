package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash expressions for document
  * fingerprinting (the t04 hot path).
  *
  * The interpreted composition walked the string with
  * `aggregate(transform(sequence(1, length(t)), …))` — O(n) SUBSTRING
  * allocations per document and no codegen. These expressions iterate
  * code points in a tight generated loop; [[PolyHashMin]] additionally
  * replaces the O(n·w) per-window refold with the O(n) rolling update
  * h' = ((h − c_out·31^{w−1})·31 + c_in) mod M, which is the same ring
  * homomorphism as the stepwise fold — values are IDENTICAL to the
  * oracle's `list_reduce` per-window folds, bit for bit.
  *
  * Semantics match `ascii(substring(t, i, 1))`: one term per Unicode
  * CODE POINT (not UTF-16 unit, not byte).
  */
object PolyHash {
  val Base = 31L
  val Mod = 1000000007L

  /** Full-string poly hash: fold (a·31 + cp) mod M over code points. */
  def full(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Minimum poly hash over all `w`-code-point windows; -1 marks "no
    * window" (caller maps it to null). */
  def minWindow(s: UTF8String, w: Int): Long = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < w) return -1L
    val cps = new Array[Int](n)
    var i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    var pw = 1L
    var k = 0
    while (k < w - 1) { pw = (pw * Base) % Mod; k += 1 }
    var h = 0L
    k = 0
    while (k < w) { h = (h * Base + cps(k)) % Mod; k += 1 }
    var min = h
    var t = w
    while (t < n) {
      h = (((h - (cps(t - w) * pw) % Mod + Mod) % Mod) * Base + cps(t)) % Mod
      if (h < min) min = h
      t += 1
    }
    min
  }
}

/** `poly_hash(str)`: full-document polynomial fingerprint. */
case class PolyHashFull(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"poly_hash expects STRING, got ${child.dataType}")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.full(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.full($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `poly_hash_min(str, w)`: winnowing-style minimum over all w-char
  * rolling windows; null when the document is shorter than w. */
case class PolyHashMin(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash_min expects (STRING, const INT), got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    val w = right.eval(input)
    if (s == null || w == null) null
    else {
      val m = PolyHash.minWindow(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])
      if (m < 0) null else m
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w) => {
      val m = ctx.freshName("m")
      s"""
         |long $m = graft.functions.PolyHash.minWindow($s, $w);
         |if ($m < 0) { ${ev.isNull} = true; } else { ${ev.value} = $m; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
