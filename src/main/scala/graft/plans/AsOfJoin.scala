package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

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
  extends BinaryExecNode {

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
