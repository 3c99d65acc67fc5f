package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string column as a native Catalyst
  * aggregate — the mergeable heavy-hitter / frequency sketch
  * (Cormode & Muthukrishnan 2005). Completes graft's native-extension
  * trio: scalar Expressions (CosineSimilarity/PolyHash/Int8Dot),
  * whole-plan operators (AsOfJoin/IntervalJoin), and now a
  * TypedImperativeAggregate whose partial states merge by elementwise
  * addition — the property that makes it shuffle exactly
  * depth×width longs per partition regardless of corpus size, and
  * makes the final sketch INDEPENDENT of partitioning (adds commute),
  * so estimates are deterministic under any cluster layout.
  *
  * State layout: depth rows × width counters + one total-count slot,
  * flat long array. Row hashes are MurmurHash3 string hashes seeded by
  * the row index — pure JVM functions, identical on every executor.
  */
object CountMin {
  val Depth = 4
  val Width = 4096

  /** Counter slot for word w in hash row r (0-based flat index). */
  def slot(r: Int, word: String): Int =
    r * Width + ((MurmurHash3.stringHash(word, r) & 0x7fffffff) % Width)
}

case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import CountMin._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_agg needs a STRING column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "cms_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < Depth) { buf(slot(r, w)) += 1; r += 1 }
      buf(Depth * Width) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
}

/** Point estimate from a materialized sketch array: min over the depth
  * rows of the word's counter — the CMS upper-bound estimate (always
  * ≥ the true count; total count rides in the last slot). Runs on the
  * handful of candidate rows AFTER aggregation, so eval-only (no
  * codegen) costs nothing in the hot path. */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import CountMin._

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (ARRAY<BIGINT>, STRING), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(sketch: Any, word: Any): Any = {
    val arr = sketch.asInstanceOf[ArrayData]
    val w = word.asInstanceOf[UTF8String].toString
    var est = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = arr.getLong(slot(r, w))
      if (c < est) est = c
      r += 1
    }
    est
  }
}
