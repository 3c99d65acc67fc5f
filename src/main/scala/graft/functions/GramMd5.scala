package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}

/** Native Catalyst expression: the 16-byte md5 digest of every sliding
  * `width`-word window of a words array, ONE generated pass, emitted as
  * `ARRAY<BINARY>` — `gram_md5(ws, w)[i] == unhex(md5(concat_ws(" ",
  * slice(ws, i+1, w))))` element for element.
  *
  * Why (r14 bench profile, guide §1.2 "per-task work"): the shared
  * word-8-gram store build (d08/d11/d12/d13/d15 family — `gram8Exploded`)
  * ran `transform(sequence(...), i -> unhex(md5(concat_ws(" ",
  * slice(ws, i, 8)))))`. `transform` is a higher-order function, which
  * Catalyst evaluates INTERPRETED (CodegenFallback), and each element
  * paid: a fresh `slice` array copy, a `concat_ws` UTF8String build,
  * an md5 → 32-char HEX STRING render, and an `unhex` parse straight
  * back to the 16 bytes the digest started as. One fused pass updates a
  * thread-local MessageDigest incrementally from the pre-fetched word
  * byte arrays (no join buffer, no hex round-trip) and allocates only
  * the output array. Same move as [[GramHashes120]]/[[MinhashSig16]];
  * the store build was the dominant cost of every d08-family cell.
  *
  * Cross-engine contract unchanged: md5 over the UTF-8 bytes of the
  * words joined by single spaces — exactly what both the HOF form and
  * the DuckDB oracle (`unhex(md5(array_to_string(ws[i:i+w-1], ' ')))`)
  * compute. GramMd5Spec pins bit-identity against the HOF form on the
  * real corpus.
  *
  * Input contract: ARRAY<STRING> of words, null-free (throw on null,
  * house rule); width is a positive INT literal. Fewer than `width`
  * words → empty array (the HOF form's `when(size < w, array())` arm —
  * callers can drop that wrapper).
  */
case class GramMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        right match {
          case Literal(w: Int, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "gram_md5 width must be a positive INT literal")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_md5 expects (ARRAY<STRING>, INT), got $other")
    }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "gram_md5"

  @transient private lazy val width: Int =
    right.asInstanceOf[Literal].value.asInstanceOf[Int]

  override def nullSafeEval(ws: Any, w: Any): Any =
    GramMd5.digestWindows(ws.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |${ev.value} = graft.functions.GramMd5.digestWindows($a, $width);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramMd5 {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val SPACE = Array[Byte](' ')

  /** Shared by interpreted eval and generated code. */
  def digestWindows(xs: ArrayData, width: Int): GenericArrayData = {
    val n = xs.numElements()
    val g = if (n < width) 0 else n - width + 1
    val md = tlMd.get()
    val out = new Array[Any](g)
    val wb = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j))
        throw new IllegalArgumentException(
          s"gram_md5: null word at index $j (input must be null-free)")
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
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }
}
