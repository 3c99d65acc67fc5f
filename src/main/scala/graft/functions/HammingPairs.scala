package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native pair generator for LSH band buckets: given one bucket's
  * members as `ARRAY<STRUCT<id BIGINT, sketch BIGINT>>` and a foldable
  * `max_hamming INT`, emits `(a_id, b_id, hamming)` for every member
  * pair with `bit_count(sketch_a ^ sketch_b) <= max_hamming`, ids
  * ordered so `a_id < b_id`.
  *
  * Two-word sketches (the r13 120-bit simhash, [[SimHash120]]) pass a
  * three-field struct `STRUCT<id, sketch_hi, sketch_lo>`; hamming is
  * then `bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)` — the same
  * in-loop verify over the wider sketch.
  *
  * Replaces the banded self-join at the near-dup verify sites
  * (d09 / m18 / m19 / m22). The self-join and this generator do the
  * same O(|bucket|²) hamming evaluations on the same worker (equal
  * band keys land in one task either way), but the join pays full
  * join machinery per CANDIDATE — a joined-row construction plus a
  * codegen'd predicate over copied rows, ~28M times at sf1 where true
  * pairs are ~30k — while this loop pays two array reads, one xor and
  * one popcount per candidate, and only SURVIVORS materialize rows.
  * It also halves the shuffle: one groupBy exchange of the band rows
  * instead of two sorted join sides.
  *
  * Emission is lazy (an iterator over the triangle), so a skewed
  * bucket never materializes its candidate set; memory is O(|bucket|)
  * for the collected members — the same row set the self-join's
  * sort buffer held for the equal-key run.
  *
  * Null members or null struct fields reject loudly (house rule:
  * sketch pipelines fail fast rather than silently dropping pairs).
  */
case class HammingPairs(members: Expression, maxHamming: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(members, maxHamming)

  override def prettyName: String = "hamming_pairs"

  private lazy val maxHam: Int = {
    require(maxHamming.foldable, "hamming_pairs: max_hamming must be foldable")
    maxHamming.eval(null).asInstanceOf[Int]
  }

  override def checkInputDataTypes(): TypeCheckResult = members.dataType match {
    case ArrayType(StructType(fs), _)
        if (fs.length == 2 || fs.length == 3) && fs.forall(_.dataType == LongType) =>
      if (maxHamming.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hamming_pairs: max_hamming must be INT, got ${maxHamming.dataType}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hamming_pairs expects ARRAY<STRUCT<BIGINT, BIGINT[, BIGINT]>>, got $other")
  }

  private lazy val twoWord: Boolean =
    members.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].length == 3

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = members.eval(input)
    if (arr == null) return Iterator.empty
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    if (n < 2) return Iterator.empty
    // unpack once: the triangle loop reads each member n-1 times
    val nf = if (twoWord) 3 else 2
    val ids = new Array[Long](n)
    val sks = new Array[Long](n)
    val sk2 = if (twoWord) new Array[Long](n) else null
    var k = 0
    while (k < n) {
      val row = data.getStruct(k, nf)
      require(row != null && !row.isNullAt(0) && !row.isNullAt(1) &&
        (nf == 2 || !row.isNullAt(2)),
        "hamming_pairs: null member or null id/sketch in bucket")
      ids(k) = row.getLong(0)
      sks(k) = row.getLong(1)
      if (nf == 3) sk2(k) = row.getLong(2)
      k += 1
    }
    val maxH = maxHam
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = null
      private def advance(): Unit = {
        while (nextRow == null && i < n - 1) {
          val ham = java.lang.Long.bitCount(sks(i) ^ sks(j)) +
            (if (sk2 == null) 0 else java.lang.Long.bitCount(sk2(i) ^ sk2(j)))
          if (ham <= maxH) {
            val lo = math.min(ids(i), ids(j))
            val hi = math.max(ids(i), ids(j))
            nextRow = InternalRow(lo, hi, ham)
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
        }
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): InternalRow = {
        advance()
        val r = nextRow; nextRow = null; r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(members = newChildren(0), maxHamming = newChildren(1))
}

/** Native pair generator over one value array: given `ARRAY<BIGINT>`,
  * emits `(a, b)` for every index pair i < j, ordered a = min, b = max.
  *
  * The co-occurrence workhorse (q50 baskets): replaces the interpreted
  * nested-`transform` pair explode, which materialized an
  * array-of-struct of the whole triangle per group through a
  * CodegenFallback HOF before the explode could even start. Here the
  * triangle is walked lazily — a pair exists only for the instant the
  * consumer reads it. Null elements reject loudly. */
case class ValuePairs(values: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(values)

  override def prettyName: String = "value_pairs"

  override def checkInputDataTypes(): TypeCheckResult = values.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"value_pairs expects ARRAY<BIGINT>, got $other")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = values.eval(input)
    if (arr == null) return Iterator.empty
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    if (n < 2) return Iterator.empty
    val vs = new Array[Long](n)
    var k = 0
    while (k < n) {
      require(!data.isNullAt(k), "value_pairs: null element")
      vs(k) = data.getLong(k)
      k += 1
    }
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val lo = math.min(vs(i), vs(j))
        val hi = math.max(vs(i), vs(j))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        InternalRow(lo, hi)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(values = newChildren(0))
}
