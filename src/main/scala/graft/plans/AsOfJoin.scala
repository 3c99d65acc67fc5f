package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DataType

/** Event-time AS-OF join as a first-class Catalyst operator — the
  * SURVEY §2.5 custom-operator tier (c): a logical node, a planner
  * Strategy, and a physical merge operator, registered through
  * `SparkSessionExtensions` / `experimental.extraStrategies`.
  *
  * Semantics: left join; each left row picks the LAST right row with an
  * equal key whose order tuple is `<=` the left row's order tuple
  * (lexicographic; pass a unique tiebreaker column to make the match
  * deterministic under time ties). Unmatched left rows keep nulls on
  * the right — the same contract as the window-composition q21 twin.
  * Null keys group together (a null-key left row can match a null-key
  * right row) — window-partitioning semantics, matching the q21
  * composition, NOT SQL join equality where null != null.
  *
  * 100 TB shape: both sides hash-cluster on the key and sort within
  * partitions — one shuffle each, then a single-pass two-pointer merge
  * with O(1) state per partition (one buffered right row + one best
  * match). No range-join pair blowup, no per-key buffering, skew
  * bounded by the largest single key like any sort-merge join.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lo, ro) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro) :: Nil
    case _ => Nil
  }
}

/** Sorted two-pointer merge per co-partition: children are required to
  * be clustered on the join key and sorted by (key, order-tuple), which
  * EnsureRequirements satisfies with one exchange + sort per side. */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression])
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ------------------------------------------------------------------
  // Whole-stage codegen: the same two-pointer merge as doExecute, but
  // emitted into the parent's generated loop — no per-row virtual
  // calls, no JoinedRow, no interpreted comparator dispatch. Like
  // SortMergeJoinExec this node is a two-input codegen stage root:
  // inputRDDs feeds both (sorted, co-partitioned) children directly.
  // ------------------------------------------------------------------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows reference the reused left-row buffer and the bestRow
  // snapshot; downstream buffering operators must copy
  override def needCopyResult: Boolean = true

  /** Member (value, isNull, type) triple per expression, persisted
    * across produce-loop iterations. */
  private def declareSideVars(ctx: CodegenContext, prefix: String,
      exprs: Seq[Expression]): Seq[(String, String, DataType)] =
    exprs.map { e =>
      val v = ctx.addMutableState(CodeGenerator.javaType(e.dataType), prefix)
      val n = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, s"${prefix}Null")
      (v, n, e.dataType)
    }

  /** Code evaluating `exprs` against `row` (bound to `attrs`) and
    * storing results into the member triples. */
  private def genAssign(ctx: CodegenContext, row: String, exprs: Seq[Expression],
      attrs: Seq[Attribute], vars: Seq[(String, String, DataType)]): String = {
    ctx.INPUT_ROW = row
    ctx.currentVars = null
    exprs.zip(vars).map { case (e, (v, n, _)) =>
      val ev = BindReferences.bindReference(e, attrs).genCode(ctx)
      s"""
         |${ev.code}
         |$n = ${ev.isNull};
         |$v = ${ev.value};
       """.stripMargin
    }.mkString("\n")
  }

  /** Lexicographic compare of two member-var tuples, nulls-first per
    * column (RowOrdering natural ascending semantics — null == null,
    * so null keys group together like the interpreted path). */
  private def genCompareFn(ctx: CodegenContext, name: String,
      a: Seq[(String, String, DataType)], b: Seq[(String, String, DataType)]): String = {
    val body = a.zip(b).zipWithIndex.map { case (((av, an, dt), (bv, bn, _)), i) =>
      s"""
         |if ($an || $bn) {
         |  if ($an && !$bn) return -1;
         |  if (!$an && $bn) return 1;
         |} else {
         |  int comp$i = ${ctx.genComp(dt, av, bv)};
         |  if (comp$i != 0) return comp$i;
         |}
       """.stripMargin
    }.mkString("\n")
    ctx.addNewFunction(name,
      s"""
         |private int $name() {
         |  $body
         |  return 0;
         |}
       """.stripMargin)
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];")
    val rightRow = ctx.addMutableState("InternalRow", "asofRightRow")
    val bestRow = ctx.addMutableState("InternalRow", "asofBestRow")
    val initialized = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofInit")

    val rKeyVars = declareSideVars(ctx, "rKey", rightKeys)
    val rOrdVars = declareSideVars(ctx, "rOrd", rightOrder)
    val lKeyVars = declareSideVars(ctx, "lKey", leftKeys)
    val lOrdVars = declareSideVars(ctx, "lOrd", leftOrder)
    val bKeyVars = declareSideVars(ctx, "bKey", rightKeys)

    // advance the right lookahead: extracted key/ord member vars point
    // into the (reused) right-row buffer and stay valid exactly as long
    // as rightRow itself — until the next advance, same contract as the
    // interpreted path
    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  if ($rightInput.hasNext()) {
         |    $rightRow = (InternalRow) $rightInput.next();
         |    ${genAssign(ctx, rightRow, rightKeys, right.output, rKeyVars)}
         |    ${genAssign(ctx, rightRow, rightOrder, right.output, rOrdVars)}
         |  } else {
         |    $rightRow = null;
         |  }
         |}
       """.stripMargin)

    val compareKeys = genCompareFn(ctx, "asofCompareKeys", rKeyVars, lKeyVars)
    val compareOrds = genCompareFn(ctx, "asofCompareOrds", rOrdVars, lOrdVars)

    // best-match check re-derives the snapshot's key from bestRow (a
    // private copy, safe across advances) instead of caching possibly
    // buffer-backed key objects
    val bestKeyCmp = genCompareFn(ctx, "asofCompareBestKey", bKeyVars, lKeyVars)
    val bestMatches = ctx.addNewFunction("asofBestMatches",
      s"""
         |private boolean asofBestMatches() {
         |  if ($bestRow == null) return false;
         |  ${genAssign(ctx, bestRow, rightKeys, right.output, bKeyVars)}
         |  return $bestKeyCmp() == 0;
         |}
       """.stripMargin)

    val leftRow = ctx.freshName("asofLeftRow")
    val lAssign = genAssign(ctx, leftRow, leftKeys, left.output, lKeyVars) + "\n" +
      genAssign(ctx, leftRow, leftOrder, left.output, lOrdVars)

    // output columns: left side straight from the left row; right side
    // guarded by the match flag (nulls when unmatched)
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftOutVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matched = ctx.freshName("asofMatched")
    val rightOutVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val dt = a.dataType
      val jt = CodeGenerator.javaType(dt)
      val c = code"""
        |boolean $isNull = true;
        |$jt $value = ${CodeGenerator.defaultValue(dt)};
        |if ($matched) {
        |  $isNull = $bestRow.isNullAt($i);
        |  if (!$isNull) { $value = ${CodeGenerator.getValue(bestRow, dt, i.toString)}; }
        |}
       """.stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, dt))
    }

    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")
    val c = ctx.freshName("asofCmp")

    s"""
       |if (!$initialized) {
       |  $initialized = true;
       |  $advanceRight();
       |}
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  $lAssign
       |  int $c = ($rightRow == null) ? 1 : $compareKeys();
       |  while ($rightRow != null && ($c < 0 || ($c == 0 && $compareOrds() <= 0))) {
       |    if ($c == 0) { $bestRow = (InternalRow) $rightRow.copy(); }
       |    $advanceRight();
       |    $c = ($rightRow == null) ? 1 : $compareKeys();
       |  }
       |  boolean $matched = $bestMatches();
       |  $numOutputRows.add(1);
       |  if ($matched) $numMatched.add(1);
       |  ${consume(ctx, leftOutVars ++ rightOutVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val ordTypes = leftOrder.map(_.dataType)
    val (lk, rk, lo, ro) = (leftKeys, rightKeys, leftOrder, rightOrder)
    val out = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lk, leftOut)
        val lOrdProj = UnsafeProjection.create(lo, leftOut)
        val rKeyProj = UnsafeProjection.create(rk, rightOut)
        val rOrdProj = UnsafeProjection.create(ro, rightOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val ordOrd = RowOrdering.createNaturalAscendingOrdering(ordTypes)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightOut.size)
        // bind against `out` (right side marked nullable), not the raw
        // child attrs — otherwise the projection codegen skips the null
        // check on non-nullable right columns and unmatched rows read
        // garbage zeros instead of nulls
        val resultProj = UnsafeProjection.create(out, out)

        new Iterator[InternalRow] {
          // lookahead right row: the iterator (and each projection)
          // reuses ONE buffer, so the raw row/key/ord are valid only
          // until the next advance — rows are snapshotted lazily, ONLY
          // when they become the running best (skipped rows cost zero
          // copies)
          private var rRaw: InternalRow = _
          private var rKey: UnsafeRow = _
          private var rOrd: UnsafeRow = _
          private var best: InternalRow = _
          private var bestKey: UnsafeRow = _

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rRaw = rIter.next()
              rKey = rKeyProj(rRaw)
              rOrd = rOrdProj(rRaw)
            } else { rRaw = null; rKey = null; rOrd = null }

          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lOrdRow = lOrdProj(l)
            var c = if (rRaw == null) 1 else keyOrd.compare(rKey, lKey)
            while (rRaw != null &&
                (c < 0 || (c == 0 && ordOrd.compare(rOrd, lOrdRow) <= 0))) {
              if (c == 0) { best = rRaw.copy(); bestKey = rKey.copy() }
              advanceRight()
              c = if (rRaw == null) 1 else keyOrd.compare(rKey, lKey)
            }
            val matched = best != null && keyOrd.compare(bestKey, lKey) == 0
            numOutputRows += 1
            if (matched) numMatched += 1
            resultProj(joined(l, if (matched) best else nullRight))
          }
        }
    }
  }
}

object AsOfJoin {

  /** Install the planner strategy into a live session (idempotent).
    * [[graft.GraftExtensions]] injects the same strategy at session
    * build time for `spark.sql.extensions` users. */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }

  /** AS-OF join `left` to `right` on equal `on` columns, matching the
    * latest right row whose `rightOrderCols` tuple is <= the left row's
    * `leftOrderCols` tuple. Right columns come back `rightPrefix`ed
    * (fresh attributes, so self-joins on one base table are safe). */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftOrderCols: Seq[String], rightOrderCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val r2 = right.toDF(right.columns.map(rightPrefix + _): _*)
    val lplan = left.queryExecution.analyzed
    val rplan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column $n in [${p.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinPlan(lplan, rplan,
      on.map(attr(lplan, _)), on.map(n => attr(rplan, rightPrefix + n)),
      leftOrderCols.map(attr(lplan, _)),
      rightOrderCols.map(n => attr(rplan, rightPrefix + n)))
    GraftSqlBridge.ofRows(spark, node)
  }
}
