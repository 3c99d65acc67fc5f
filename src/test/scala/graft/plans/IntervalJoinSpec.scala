package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, SparkEntry}

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("interval-spec", "4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("sweep semantics match the naive theta join on constructed edges") {
    import spark.implicits._
    // intervals: overlapping pair, duplicate lo, zero-length (dropped),
    // and a detached singleton
    val wins = Seq(
      (1L, 10L, 30L), (2L, 20L, 40L), // overlap on [20, 30)
      (3L, 20L, 25L),                 // duplicate lo = 20
      (4L, 50L, 50L),                 // empty [50, 50) — matches nothing
      (5L, 100L, 101L))               // narrowest possible
      .toDF("win_id", "lo", "hi")
    // points: below all, at an inclusive lo, inside the overlap, at an
    // exclusive hi, between intervals, at the singleton, above all
    val pts = Seq(9L, 10L, 22L, 40L, 45L, 100L, 101L, 200L)
      .toDF("pt").withColumnRenamed("pt", "us")

    val got = IntervalJoin.intervalJoin(pts, wins, "us", "lo", "hi")
      .select("us", "w_win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = pts.join(wins,
        pts("us") >= wins("lo") && pts("us") < wins("hi"))
      .select("us", "win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got === want)
    assert(got === Set(
      (10L, 1L),             // inclusive lo
      (22L, 1L), (22L, 2L), (22L, 3L), // triple overlap incl. duplicate lo
      (100L, 5L)))           // narrowest interval; 40 excluded (hi open)
  }

  test("physical plan: IntervalJoinExec — identity broadcast, point side unexchanged") {
    val df = SparkEntry.queries("q46_interval_native")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p)
    // the event (point) side reaches the operator with no exchange at
    // all: every hash exchange in the plan sits above the join (the
    // rollup) or under the window-table derivation, never between the
    // events scan and IntervalJoin
    val lines = p.split("\n")
    val joinIdx = lines.indexWhere(_.contains("IntervalJoin"))
    val eventsScanIdx = lines.lastIndexWhere(_.contains("Scan parquet"))
    assert(joinIdx >= 0 && eventsScanIdx > joinIdx)
  }

  test("property: random interval sets — sweep equals the naive theta join") {
    import spark.implicits._
    // 8 seeded random worlds: clustered lo values (forced collisions),
    // lengths including 0 (empty) and long overlapping spans, points
    // drawn to land on lo/hi boundaries as well as between intervals
    (0 until 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919 + 13)
      val wins = (0 until 40).map { i =>
        val lo = rnd.nextInt(200) * 5L // coarse grid -> duplicate los
        val len = rnd.nextInt(4) match {
          case 0 => 0L                  // empty interval, matches nothing
          case 1 => 1L + rnd.nextInt(5) // narrow
          case _ => 20L + rnd.nextInt(300) // long, overlaps neighbors
        }
        (i.toLong, lo, lo + len)
      }.toDF("win_id", "lo", "hi")
      val pts = (0 until 300).map { _ =>
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(200) * 5L        // exactly on some lo
          case 1 => rnd.nextInt(200) * 5L - 1    // just below a lo
          case _ => rnd.nextInt(1200).toLong - 50 // anywhere incl. outside
        }
      }.toDF("us")

      val got = IntervalJoin.intervalJoin(pts, wins, "us", "lo", "hi")
        .groupBy(col("us"), col("w_win_id")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = pts.join(wins, pts("us") >= wins("lo") && pts("us") < wins("hi"))
        .groupBy(col("us"), col("win_id")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"seed $seed: sweep diverges from the naive join")
    }
  }

  test("native operator agrees with the q38 bin-trick composition row-for-row") {
    // sf0.01: the smallest SF whose events actually contain error-spike
    // windows (sf0.001 has no 5-min bin with >= 3 errors — both twins
    // return empty there, which proves nothing)
    val sf01 = "/root/testdata/sf0.01"
    val native = SparkEntry.queries("q46_interval_native")(spark, sf01).collect().toSeq
    val twin = SparkEntry.queries("q38_interval_join")(spark, sf01).collect().toSeq
    assert(native.nonEmpty)
    assert(native === twin)
  }
}
