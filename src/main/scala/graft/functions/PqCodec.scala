package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization codec pair for the s09/s11/s31 family.
  *
  * The declarative encode was an `aggregate(cb, struct(s,k), ...)` HOF
  * whose lambda body re-evaluated an 8-term fold of `element_at`s per
  * codebook entry per chunk — 8 chunks × |cb| interpreted struct
  * allocations and ~640 interpreted adds PER VECTOR, the dominant cost
  * of the three slowest sf1 bench cells (s09 9.6 s, s11 9.9 s, s31
  * 17.8 s). These expressions run the identical arithmetic as one JVM
  * loop (CodegenFallback: the input types are nested arrays/structs,
  * and the work is in compiled Scala either way). `PqCodecSpec` pins
  * both bit-equal to the declarative folds on real vectors.
  *
  * Shared contract (matches the declarative form exactly):
  *  - 64-dim DOUBLE vectors, 8 chunks × 8 sub-dims;
  *  - chunk distance = LEFT fold `acc + dv*dv` from 0.0 in sub-dim
  *    order (the FP order the DuckDB oracle's list_reduce mirrors);
  *  - [[PqEncode]] scans the codebook in ARRAY ORDER keeping the
  *    (dist, code) minimum with the `dist < s || (dist == s && code < k)`
  *    total order, seeded (1e30, 99) — bit-identical to the HOF fold;
  *  - [[PqDistTable]] emits per-chunk distance tables over the codebook
  *    sorted by code ascending (the declarative `array_sort(cb)` — codes
  *    are distinct, so struct sort order is code order).
  *
  * Inputs must be null-free (throw, house rule); a null row is null.
  */
object PqCodec {
  val Dims = 64
  val Chunks = 8
  val SubDim = 8

  /** (codes, cvs) decoded from the codebook ArrayData, in array order. */
  def readCodebook(cb: ArrayData): (Array[Long], Array[Array[Double]]) = {
    val n = cb.numElements()
    val codes = new Array[Long](n)
    val cvs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      if (cb.isNullAt(i))
        throw new IllegalArgumentException(
          s"pq codec: null codebook entry at index $i")
      val row = cb.getStruct(i, 2)
      codes(i) = row.getLong(0)
      val cvArr = row.getArray(1)
      if (cvArr.numElements() != Dims)
        throw new IllegalArgumentException(
          s"pq codec: centroid $i has ${cvArr.numElements()} dims, expected $Dims")
      cvs(i) = cvArr.toDoubleArray()
      i += 1
    }
    (codes, cvs)
  }

  def readVector(v: ArrayData): Array[Double] = {
    if (v.numElements() != Dims)
      throw new IllegalArgumentException(
        s"pq codec: expected $Dims dims, got ${v.numElements()}")
    v.toDoubleArray()
  }

  /** Chunk distance with the declarative fold's exact FP order. */
  def chunkDist(x: Array[Double], cv: Array[Double], c: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < SubDim) {
      val dv = x(c * SubDim + j) - cv(c * SubDim + j)
      acc += dv * dv
      j += 1
    }
    acc
  }
}

/** `pq_encode(v, cb)` → ARRAY<BIGINT> of 8 code ids. */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import PqCodec._

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(f1, f2)), _))
          if f1.dataType == LongType &&
            (f2.dataType == ArrayType(DoubleType, true) ||
              f2.dataType == ArrayType(DoubleType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs (ARRAY<DOUBLE>, ARRAY<STRUCT<code BIGINT, cv ARRAY<DOUBLE>>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(vIn: Any, cbIn: Any): Any = {
    val x = readVector(vIn.asInstanceOf[ArrayData])
    val (codes, cvs) = readCodebook(cbIn.asInstanceOf[ArrayData])
    val out = new Array[Long](Chunks)
    var c = 0
    while (c < Chunks) {
      var bestS = 1e30
      var bestK = 99L
      var i = 0
      while (i < codes.length) {
        val dist = chunkDist(x, cvs(i), c)
        if (dist < bestS || (dist == bestS && codes(i) < bestK)) {
          bestS = dist
          bestK = codes(i)
        }
        i += 1
      }
      out(c) = bestK
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_dist_table(v, cb)` → ARRAY<ARRAY<DOUBLE>>: 8 per-chunk distance
  * tables over the codebook sorted by code ascending. */
case class PqDistTable(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import PqCodec._

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(f1, f2)), _))
          if f1.dataType == LongType &&
            (f2.dataType == ArrayType(DoubleType, true) ||
              f2.dataType == ArrayType(DoubleType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_dist_table needs (ARRAY<DOUBLE>, ARRAY<STRUCT<code BIGINT, cv ARRAY<DOUBLE>>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_table"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDistTable =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(vIn: Any, cbIn: Any): Any = {
    val x = readVector(vIn.asInstanceOf[ArrayData])
    val (codes, cvs) = readCodebook(cbIn.asInstanceOf[ArrayData])
    val order = codes.indices.sortBy(codes(_)).toArray
    val tables = new Array[Any](Chunks)
    var c = 0
    while (c < Chunks) {
      val t = new Array[Double](codes.length)
      var r = 0
      while (r < order.length) {
        t(r) = chunkDist(x, cvs(order(r)), c)
        r += 1
      }
      tables(c) = new GenericArrayData(t)
      c += 1
    }
    new GenericArrayData(tables)
  }
}
