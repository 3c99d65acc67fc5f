package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: the 120-bit md5 hashes of every sliding
  * `width`-word window of a words array, ONE generated pass, emitted as
  * an INTERLEAVED `ARRAY<BIGINT>` of length 2·g — `[hi_0, lo_0, hi_1,
  * lo_1, …]` where for window i:
  *
  *   hi_i == value of md5 hex digits 1..15  (== gram_hashes60)
  *   lo_i == value of md5 hex digits 16..30
  *
  * i.e. two independent 60-bit halves of the same digest, mirrored by
  * the oracle's `oMd5ValAt(g, 1, 15)` / `oMd5ValAt(g, 16, 15)` digit
  * folds. 15 hex digits is the widest half both engines decode exactly:
  * 16 digits (a full 64-bit word) overflows DuckDB's signed-BIGINT
  * digit fold, so the cross-engine sketch is 2×60 = 120 bits rather
  * than a literal 128 (the r12 verdict's "two BIGITs, the simhash60
  * pattern" — keyspace per 30-bit band is 2^30 ≈ 1.07B either way).
  *
  * Why (r12 verdict #1): d09's 60-bit sketch banded 4×15-bit gave
  * 32,768 values per band and a MEASURED ~quadratic collision-mass
  * growth (collision rows 103× on 10× docs, collisions-per-true-pair
  * 531→939 — bench/r12_d09_proportionality.json). The 120-bit sketch
  * bands 4×30-bit: the common-word-correlated collision class that
  * dominated the 15-bit keyspace collapses.
  *
  * One digest per window feeds both halves — widening costs no extra
  * hashing over gram_hashes60, only the 8-byte lo extraction.
  *
  * Input contract: ARRAY<STRING> of words, null-free (throw on null,
  * house rule); width is a positive literal. Fewer than `width` words →
  * empty array.
  */
case class GramHashes120(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        right match {
          case Literal(w: Int, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "gram_hashes120 width must be a positive INT literal")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes120 expects (ARRAY<STRING>, INT), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "gram_hashes120"

  @transient private lazy val width: Int =
    right.asInstanceOf[Literal].value.asInstanceOf[Int]

  override def nullSafeEval(ws: Any, w: Any): Any = {
    val xs = ws.asInstanceOf[ArrayData]
    GramHashes120.hashWindows(xs, width)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |${ev.value} = graft.functions.GramHashes120.hashWindows($a, $width);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramHashes120 {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val SPACE = Array[Byte](' ')

  /** Shared by interpreted eval and generated code. */
  def hashWindows(xs: ArrayData, width: Int): GenericArrayData = {
    val n = xs.numElements()
    val g = if (n < width) 0 else n - width + 1
    val md = tlMd.get()
    val out = new Array[Long](2 * g)
    val wb = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j))
        throw new IllegalArgumentException(
          s"gram_hashes120: null word at index $j (input must be null-free)")
      wb(j) = xs.getUTF8String(j).getBytes
      j += 1
    }
    var i = 0
    while (i < g) {
      md.reset()
      var k = i
      while (k < i + width) {
        if (k > i) md.update(SPACE)
        md.update(wb(k))
        k += 1
      }
      val dg = md.digest()
      // hi: hex digits 1..15 == first 8 bytes big-endian >>> 4
      var hi = 0L
      var b = 0
      while (b < 8) { hi = (hi << 8) | (dg(b) & 0xffL); b += 1 }
      // lo: hex digits 16..30 == bytes 7..14 big-endian, top nibble
      // (hex digit 15, already in hi) masked off
      var lo = 0L
      b = 7
      while (b < 15) { lo = (lo << 8) | (dg(b) & 0xffL); b += 1 }
      out(2 * i) = hi >>> 4
      out(2 * i + 1) = lo & 0x0fffffffffffffffL
      i += 1
    }
    new GenericArrayData(out)
  }
}
