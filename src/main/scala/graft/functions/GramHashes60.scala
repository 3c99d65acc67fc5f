package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 60-bit md5 hashes of every sliding
  * `width`-word window of a words array, in ONE generated pass.
  *
  * `gram_hashes60(ws, w)[i] == conv(substring(md5(concat_ws(' ',
  * slice(ws, i+1, w))), 1, 15), 16, 10)` — the house gram-hash rule the
  * DuckDB oracle mirrors — but computed by feeding the window's words
  * (and single-space joints) straight into one reused MD5 digest: no
  * sliced array, no joined gram string, no hex round-trip. The 60-bit
  * value is the digest's first 15 hex digits, i.e. its first 8 bytes
  * as a big-endian long shifted right by 4.
  *
  * Why (r10 bench profile, after the t27 lesson): the corpus-gram tier
  * (t21/t23/t29/t15) spent most of its time materializing gram STRINGS
  * just to hash them — `transform(sequence, i -> concat_ws(slice))`
  * plus `md5` cost ~2.5 s/pass at sf0.1 before any aggregation.
  * `GramHashes60Spec` pins native ≡ the declarative md5Val pipeline on
  * real corpus text.
  *
  * Input contract: ARRAY<STRING> of words, null-free (throw on null,
  * house rule); width is a positive literal. Fewer than `width` words →
  * empty array.
  */
case class GramHashes60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        right match {
          case Literal(w: Int, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "gram_hashes60 width must be a positive INT literal")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes60 expects (ARRAY<STRING>, INT), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "gram_hashes60"

  @transient private lazy val width: Int =
    right.asInstanceOf[Literal].value.asInstanceOf[Int]

  override def nullSafeEval(ws: Any, w: Any): Any = {
    val xs = ws.asInstanceOf[ArrayData]
    GramHashes60.hashWindows(xs, width)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      s"""
         |${ev.value} = graft.functions.GramHashes60.hashWindows($a, $width);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramHashes60 {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val SPACE = Array[Byte](' ')

  /** Shared by interpreted eval and generated code. */
  def hashWindows(xs: ArrayData, width: Int): GenericArrayData = {
    val n = xs.numElements()
    val g = if (n < width) 0 else n - width + 1
    val md = tlMd.get()
    val out = new Array[Long](g)
    // pre-fetch the byte images once per word, not once per window
    val wb = new Array[Array[Byte]](n)
    var j = 0
    while (j < n) {
      if (xs.isNullAt(j))
        throw new IllegalArgumentException(
          s"gram_hashes60: null word at index $j (input must be null-free)")
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
      // first 15 hex digits == first 8 bytes big-endian >>> 4
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (dg(b) & 0xffL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }
}
