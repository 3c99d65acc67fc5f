package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** argmin_dl replaces q57's rank-1 window: the contract is exact
  * agreement with `row_number() OVER (ORDER BY ord, sel) = 1` on
  * non-null inputs, including ties on the double ordering key. */
class ArgminDoubleLongSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("argmindl-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("argmin equals the rank-1 window on real lineitem unit prices (incl. ties)") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey"),
        (col("l_extendedprice") / col("l_quantity")).as("up"),
        col("l_suppkey"))
    val w = Window.partitionBy(col("l_partkey")).orderBy(col("up"), col("l_suppkey"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("up"), col("l_suppkey"))
    val viaAgg = li.groupBy(col("l_partkey"))
      .agg(GraftFunctions.argminDL(col("up"), col("l_suppkey")).as("m"))
      .select(col("l_partkey"), col("m.ord").as("up"), col("m.sel").as("l_suppkey"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    // non-degenerate: groups with >1 member exist
    assert(li.groupBy("l_partkey").count().filter(col("count") > 1).count() > 0)
  }

  test("ties on ord resolve to the smallest sel; merge across partitions agrees") {
    import spark.implicits._
    // 8 input partitions force non-trivial partial/merge paths
    val df = Seq(
      (1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L), (1L, 7.0, 1L),
      (2L, 2.0, 9L), (2L, 1.0, 99L), (3L, 4.0, 4L))
      .toDF("k", "ord", "sel").repartition(8)
    val got = df.groupBy("k")
      .agg(GraftFunctions.argminDL(col("ord"), col("sel")).as("m"))
      .select(col("k"), col("m.ord"), col("m.sel"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === Set((1L, 5.0, 10L), (2L, 1.0, 99L), (3L, 4.0, 4L)))
  }

  test("the aggregate plans as HashAggregate (primitive buffer), not SortAggregate") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 1L)).toDF("k", "ord", "sel")
    val p = df.groupBy("k")
      .agg(GraftFunctions.argminDL(col("ord"), col("sel")).as("m"))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }
}
