package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, If, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Declarative aggregate: the lexicographic minimum of (ord: DOUBLE,
  * sel: BIGINT) pairs, returned as STRUCT<ord, sel> — the argmin shape
  * `row_number() OVER (PARTITION BY k ORDER BY ord, sel) = 1` computes
  * when only (ord, sel) survive into the output.
  *
  * Why not the window (guide §2.3 "aggregate before you shuffle"): a
  * rank-1 window needs a FULL map-side sort of every input row on the
  * whole ordering tuple even with WindowGroupLimit bounding the
  * exchange; and `min(struct(...))`'s aggregation buffer is a struct —
  * not an UnsafeRow-mutable type — so Spark plans it as SortAggregate,
  * which re-introduces the sort. This aggregate buffers two PRIMITIVE
  * fields (double, long), so HashAggregateExec applies: the per-task
  * work is one hash probe + compare per row, partial aggregation
  * map-side, and the exchange carries one row per (task, group).
  *
  * Contract: inputs must be non-null (rows with a NULL ord or sel are
  * IGNORED — the conditional keeps the buffer — unlike the window's
  * NULLS FIRST; the q57 unit-price/suppkey inputs are non-null by
  * construction). Ties on ord resolve to the smallest sel, matching
  * the window's ORDER BY ord, sel tie-break. Doubles compare with
  * IEEE `<` — no NaNs in the fed data. An empty group cannot occur
  * under groupBy (no row, no group).
  */
case class ArgminDoubleLong(ord: Expression, sel: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord, sel)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("sel", LongType, nullable = false)))
  override def prettyName: String = "argmin_dl"

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, sel.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"argmin_dl expects (DOUBLE, BIGINT), got $other")
    }

  private lazy val bOrd =
    AttributeReference("argmin_ord", DoubleType, nullable = false)()
  private lazy val bSel =
    AttributeReference("argmin_sel", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bOrd, bSel)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.PositiveInfinity), Literal(Long.MaxValue))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(LessThan(ord, bOrd),
      And(EqualTo(ord, bOrd), LessThan(sel, bSel)))
    Seq(If(better, ord, bOrd), If(better, sel, bSel))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = Or(LessThan(bOrd.right, bOrd.left),
      And(EqualTo(bOrd.right, bOrd.left), LessThan(bSel.right, bSel.left)))
    Seq(If(better, bOrd.right, bOrd.left), If(better, bSel.right, bSel.left))
  }

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("ord"), bOrd, Literal("sel"), bSel))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), sel = newChildren(1))
}
