package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, SparkEntry, Tables}

/** q34 is approximate by design (HLL++ sketches are engine-specific,
  * so its driver check is rows-only) — the accuracy contract is
  * asserted here instead: every per-type estimate within 3× the
  * configured 2% relative standard deviation of the exact count. */
class EventsSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("sketch-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.01"

  test("q34: HLL++ estimates within 3x the 2% rsd of exact distinct counts") {
    val approx = SparkEntry.queries("q34_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (t, e) =>
      val a = approx(t)
      val relErr = math.abs(a - e).toDouble / e
      assert(relErr <= 0.06, s"$t: approx $a vs exact $e (relErr $relErr)")
    }
  }
}
