package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the complete per-word profile the house
  * quality-score recipe needs, in ONE generated pass over the words
  * array.
  *
  * Returns ARRAY<BIGINT> `[n, sum_len, stop_hits, n_sym, n_complex]`:
  *  - `n`        — word count (`size(ws)`)
  *  - `sum_len`  — Σ numChars (`transform(ws, length)` + sum fold)
  *  - `stop_hits`— words in the house stopword set
  *                 {the, a, of, and, to} (`filter(ws, isin(...))`)
  *  - `n_sym`    — words containing any char outside [a-z0-9]
  *                 (`filter(ws, rlike("[^a-z0-9]"))`; scanned at the
  *                 BYTE level — UTF-8 continuation bytes are ≥ 0x80,
  *                 so a multibyte char is "symbol" under both forms)
  *  - `n_complex`— words with ≥ 7 chars (`filter(ws, length >= 7)`)
  *
  * Why (r11 bench profile): the t02 quality recipe — reused by ~10
  * operators across the t/p/m/s tiers — paid two or three interpreted
  * `filter()`/`transform()` HOF passes per document. The counts are
  * integers, so every consumer's derived arithmetic is bit-identical.
  * `WordProfileSpec` pins native ≡ the declarative HOFs on corpus text.
  *
  * Input contract: ARRAY<STRING>, null-free (throw, house rule).
  */
case class WordProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_profile expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_profile"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WordProfile.profileWords(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordProfile.profileWords($a);")
}

object WordProfile {
  private val Stopwords: Array[UTF8String] =
    Array("the", "a", "of", "and", "to").map(UTF8String.fromString)

  /** Static worker shared by eval and codegen (named distinctly from
    * any class member — the r10 Janino static-forwarder lesson). */
  def profileWords(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    var sumLen = 0L
    var stopHits = 0L
    var nSym = 0L
    var nComplex = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"word_profile: null word at index $i (input must be null-free)")
      val w = xs.getUTF8String(i)
      val chars = w.numChars()
      sumLen += chars
      if (chars >= 7) nComplex += 1
      var s = 0
      var isStop = false
      while (s < Stopwords.length && !isStop) {
        if (w.equals(Stopwords(s))) isStop = true
        s += 1
      }
      if (isStop) stopHits += 1
      val nb = w.numBytes()
      var b = 0
      var sym = false
      while (b < nb && !sym) {
        val c = w.getByte(b)
        // anything outside ASCII [a-z] / [0-9] — including every byte
        // of a multibyte char — matches [^a-z0-9]
        if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))) sym = true
        b += 1
      }
      if (sym) nSym += 1
      i += 1
    }
    new GenericArrayData(Array(n.toLong, sumLen, stopHits, nSym, nComplex))
  }
}
