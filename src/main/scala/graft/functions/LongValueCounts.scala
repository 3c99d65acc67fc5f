package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** `long_value_counts(arr)` → ARRAY<STRUCT<v BIGINT, c INT>>: the
  * distinct values of a BIGINT array with their occurrence counts,
  * ordered by value ascending (a total order, so downstream explodes
  * are deterministic).
  *
  * Why (r11 bench profile): t18's term-frequency step was
  * `transform(array_distinct(wsh), w -> struct(w, size(filter(wsh,
  * x -> x = w))))` — an interpreted O(distinct × n) rescan per
  * document. This is the textbook one-pass hashmap, per row.
  * CodegenFallback: the output is a struct array (no codegen value
  * writer worth hand-rolling) and the loop is compiled Scala either
  * way. Input must be null-free (throw, house rule); null row → null.
  */
case class LongValueCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_value_counts expects ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("c", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "long_value_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = new java.util.TreeMap[Long, Int]()
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"long_value_counts: null element at index $i (input must be null-free)")
      m.merge(xs.getLong(i), 1, Integer.sum _)
      i += 1
    }
    val out = new Array[Any](m.size)
    var k = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }
}
