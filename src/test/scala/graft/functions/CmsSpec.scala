package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}
import graft.operators.OpUtils.words

/** Contracts of the native Count-Min aggregate: the sketch is a pure
  * function of the multiset (partitioning-invariant — the property that
  * makes its estimates deterministic on a cluster), every estimate
  * upper-bounds the true count, and the error stays inside the
  * structural CMS envelope on the fixed corpus. */
class CmsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("cms-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def wordsDf = {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).select(explode(words(col("text"))).as("word"))
  }

  test("sketch is identical under any partitioning (merge is elementwise add)") {
    val one = wordsDf.repartition(1)
      .agg(call_function("cms_agg", col("word"))).head.getSeq[Long](0)
    val many = wordsDf.repartition(7)
      .agg(call_function("cms_agg", col("word"))).head.getSeq[Long](0)
    assert(one == many)
    assert(one.length == CountMin.Depth * CountMin.Width + 1)
  }

  test("estimates upper-bound exact counts and stay inside the CMS envelope") {
    val exact = wordsDf.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = wordsDf.agg(call_function("cms_agg", col("word")))
      .head.getSeq[Long](0).toArray
    val total = sk(CountMin.Depth * CountMin.Width)
    assert(total == exact.values.sum)
    val slack = 4.0 * total / CountMin.Width // far outside e/W w.h.p.
    exact.foreach { case (w, n) =>
      val est = (0 until CountMin.Depth).map(r => sk(CountMin.slot(r, w))).min
      assert(est >= n, s"$w: est $est < exact $n")
      assert(est <= n + slack, s"$w: est $est way past exact $n")
    }
  }
}
