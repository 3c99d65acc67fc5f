package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Event-time INTERVAL (range) join as a first-class Catalyst operator —
  * the second plan-tier custom operator after [[AsOfJoinPlan]], proving
  * the tier is systematic rather than a one-off.
  *
  * Semantics: inner join; each left row (a point `pt`, epoch-micros
  * LONG) matches every right row (an interval `[lo, hi)`, LONGs) that
  * contains it. Multi-match emits one row per containing interval —
  * the same contract as q38's declarative bin-trick twin, and of the
  * naive `ON pt >= lo AND pt < hi` theta join.
  *
  * 100 TB shape: the point side NEVER moves — it requires no
  * distribution at all, so events stream map-side with zero exchanges;
  * the (small) interval side rides ONE IdentityBroadcastMode exchange.
  * Each task sorts its broadcast copy of the intervals by `lo` once,
  * precomputes the maximum interval length L, and probes each point by
  * binary search + a bounded backward sweep: any interval containing
  * `pt` has `lo ∈ (pt − L, pt]`, so the sweep visits only candidates —
  * O(log W + k) per point vs the BroadcastNestedLoopJoin's O(W). The
  * q38 bin-trick is the declarative composition of the same idea; this
  * operator removes the bin-explosion and pad-slop filter entirely.
  */
final case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] into [[IntervalJoinExec]]. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, pt, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), pt, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Broadcast interval sweep: the left (point) side keeps its
  * partitioning untouched; EnsureRequirements inserts exactly one
  * IdentityBroadcastMode exchange under the right (interval) side. */
final case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression)
  extends BinaryExecNode {

  require(point.dataType == LongType && lo.dataType == LongType &&
    hi.dataType == LongType,
    "interval join bounds must be epoch-micros LONGs")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numIntervals" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of broadcast intervals"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val leftOut = left.output
    val rightOut = right.output
    val (ptE, loE, hiE) = (point, lo, hi)
    val out = output
    val numOutputRows = longMetric("numOutputRows")
    val numIntervals = longMetric("numIntervals")

    left.execute().mapPartitions({ lIter =>
      val boundsProj = UnsafeProjection.create(Seq(loE, hiE), rightOut)
      val ptProj = UnsafeProjection.create(Seq(ptE), leftOut)
      // each task sorts ITS copy of the broadcast intervals once; rows
      // are copied out of the broadcast array so sorting never mutates
      // the shared value
      val intervals = broadcastRows.value.map { r =>
        val b = boundsProj(r)
        (b.getLong(0), b.getLong(1), r.copy())
      }.filter(iv => iv._2 > iv._1).sortBy(_._1)
      // task-local SQLMetric values merge by ADDITION on the driver —
      // setting in every task would report intervals × left partitions.
      // One task owns the metric (every task sees the same broadcast).
      if (org.apache.spark.TaskContext.getPartitionId() == 0)
        numIntervals.set(intervals.length)
      val loArr = intervals.map(_._1)
      val maxLen = if (intervals.isEmpty) 0L
        else intervals.map(iv => iv._2 - iv._1).max
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(out, out)

      lIter.flatMap { l =>
        val pt = ptProj(l).getLong(0)
        // last interval with lo <= pt (binary search on the sorted lo)
        var t = java.util.Arrays.binarySearch(loArr, pt)
        if (t < 0) t = -t - 2
        else { // land on the LAST equal lo
          while (t + 1 < loArr.length && loArr(t + 1) == pt) t += 1
        }
        // bounded backward sweep: a containing interval has lo > pt - L
        val matches = scala.collection.mutable.ArrayBuffer[InternalRow]()
        var j = t
        while (j >= 0 && loArr(j) > pt - maxLen) {
          val (ivLo, ivHi, row) = intervals(j)
          if (ivLo <= pt && pt < ivHi) matches += row
          j -= 1
        }
        numOutputRows.add(matches.length)
        // emit in ascending-lo order (deterministic output order)
        matches.reverseIterator.map(r => resultProj(joined(l, r)))
      }
    }, preservesPartitioning = true)
  }
}

object IntervalJoin {

  /** Install the planner strategy into a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(IntervalJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ IntervalJoinStrategy
  }

  /** Interval-join `left` (point column `ptCol`, LONG) to `right`
    * (interval columns `loCol`/`hiCol`, LONGs, half-open [lo, hi)).
    * Right columns come back `rightPrefix`ed (fresh attributes, so
    * self-derived interval tables are safe). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      rightPrefix: String = "w_"): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val r2 = right.toDF(right.columns.map(rightPrefix + _): _*)
    val lplan = left.queryExecution.analyzed
    val rplan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"intervalJoin: no column $n in [${p.output.map(_.name).mkString(", ")}]"))
    val node = IntervalJoinPlan(lplan, rplan,
      attr(lplan, ptCol), attr(rplan, rightPrefix + loCol),
      attr(rplan, rightPrefix + hiCol))
    GraftSqlBridge.ofRows(spark, node)
  }
}
