package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass exact covariance state over quantized 64-dim vectors as a
  * native Catalyst aggregate (the CountMinAgg house pattern): each input
  * row's ARRAY<BIGINT> folds into ONE flat Long buffer holding the row
  * count, the 64 per-dim sums, and all 2080 upper-triangle product sums.
  * Partial states merge by elementwise addition, so the shuffle carries
  * exactly 2145 longs per partition regardless of corpus size and the
  * result is independent of partitioning (integer adds commute).
  *
  * This replaces s20's declarative pair explode (r10 verdict "What's
  * wrong #2"): the explode multiplied every vector row ×2080 structs
  * before partial aggregation — bounded shuffle but pure CPU waste.
  * Here the per-row work is the same 2080 multiply-adds with ZERO row
  * amplification, no flatten/struct allocation, and the per-dim sums
  * ride in the same buffer, so the old plan's two broadcast joins
  * against a second scan disappear too.
  *
  * Buffer layout (0-based): slot 0 = n; slots 1..64 = Σx_i; slot
  * 65 + offset(i,j) = Σx_i·x_j for 1 ≤ i ≤ j ≤ 64 in (i asc, j asc)
  * order. Input contract: ARRAY<BIGINT> of length exactly 64 with no
  * null elements (throw, per the house validation rule); null rows are
  * skipped like any SQL aggregate.
  */
object CovTriangle {
  val Dims = 64
  val Pairs: Int = Dims * (Dims + 1) / 2 // 2080
  val BufLen: Int = 1 + Dims + Pairs // 2145

  /** 0-based buffer slot of the Σx_i·x_j cell, 1-based i ≤ j. */
  def slot(i: Int, j: Int): Int =
    1 + Dims + (i - 1) * Dims - (i - 1) * i / 2 + (j - 1)
}

case class CovTriangleAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import CovTriangle._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_triangle_agg needs ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovTriangleAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): CovTriangleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovTriangleAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "cov_triangle_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](BufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() != Dims)
        throw new IllegalArgumentException(
          s"cov_triangle_agg: expected $Dims dims, got ${arr.numElements()}")
      val x = new Array[Long](Dims)
      var i = 0
      while (i < Dims) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"cov_triangle_agg: null element at index $i (input must be null-free)")
        x(i) = arr.getLong(i)
        i += 1
      }
      buf(0) += 1L
      var k = 1 + Dims
      i = 0
      while (i < Dims) {
        val xi = x(i)
        buf(1 + i) += xi
        var j = i
        while (j < Dims) { buf(k) += xi * x(j); k += 1; j += 1 }
        i += 1
      }
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
