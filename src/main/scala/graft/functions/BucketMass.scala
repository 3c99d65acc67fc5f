package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: both DSIR mass sums of a document's
  * hashed-feature buckets against two dense count tables, in ONE
  * generated pass.
  *
  * `bucket_mass2(bks, tm, cm) == [Σ tm[bks[i]+1], Σ cm[bks[i]+1]]`
  * (1-based table indexing, matching `element_at`). Replaces t11's two
  * interpreted `aggregate()` HOFs — the CodegenFallback class whose
  * per-element lambda interpretation made t11 the one dishonest cell
  * of the r12 sf1 sweep (11.3 s; r12 verdict #3) — with two array
  * reads and two adds per bigram instance.
  *
  * The count tables ride in as columns (1-row broadcast frames
  * cross-joined upstream, the t11 shape: both tables are bounded at
  * 4096 slots no matter the corpus, so the scoring pass stays entirely
  * map-side). All values are BIGINTs — the sums are exact, so the
  * downstream ratio division is the query's single IEEE op and the
  * oracle mirror is bit-exact.
  *
  * Input contract: three ARRAY<BIGINT>, null-free; every bucket id must
  * index inside both tables (throw on out-of-range, house fail-fast
  * rule — a mis-hashed bucket silently scoring 0 would bias the
  * importance weights). `BucketMassSpec` pins native ≡ the declarative
  * aggregate() fold on corpus text.
  */
case class BucketMass2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bucket_mass2 expects (ARRAY<BIGINT>, ARRAY<BIGINT>, ARRAY<BIGINT>), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "bucket_mass2"

  override def nullSafeEval(bks: Any, tm: Any, cm: Any): Any =
    BucketMass2.mass(bks.asInstanceOf[ArrayData],
      tm.asInstanceOf[ArrayData], cm.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, t, c) => {
      s"""
         |${ev.value} = graft.functions.BucketMass2.mass($b, $t, $c);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BucketMass2 {
  /** Shared by interpreted eval and generated code. */
  def mass(bks: ArrayData, tm: ArrayData, cm: ArrayData): GenericArrayData = {
    val n = bks.numElements()
    val nt = tm.numElements()
    val nc = cm.numElements()
    var tMass = 0L
    var cMass = 0L
    var i = 0
    while (i < n) {
      if (bks.isNullAt(i))
        throw new IllegalArgumentException(
          s"bucket_mass2: null bucket id at index $i (input must be null-free)")
      val b = bks.getLong(i)
      if (b < 0 || b >= nt || b >= nc)
        throw new IllegalArgumentException(
          s"bucket_mass2: bucket id $b outside table range [0, ${math.min(nt, nc)})")
      val bi = b.toInt
      if (tm.isNullAt(bi) || cm.isNullAt(bi))
        throw new IllegalArgumentException(
          s"bucket_mass2: null table entry at bucket $b")
      tMass += tm.getLong(bi)
      cMass += cm.getLong(bi)
      i += 1
    }
    new GenericArrayData(Array(tMass, cMass))
  }
}
