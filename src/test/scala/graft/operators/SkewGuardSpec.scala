package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The banded bucket-generate's collect_list has no spill, so one viral
  * band key would materialize an unbounded member array in a single
  * aggregation buffer (r12 verdict #6). [[DedupOps.bandedPairs120]]
  * excludes buckets over MaxBandBucket before collecting — this spec
  * constructs a hot bucket bigger than the cap and checks (a) the query
  * completes without walking the ~2.4B-pair triangle the unguarded
  * collect would have built, (b) pairs from the hot content are gone,
  * (c) normal buckets are untouched.
  */
class SkewGuardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("skew-guard-spec", "4").getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  test("over-cap band buckets are excluded; normal buckets still pair") {
    assert(DedupOps.MaxBandBucket === (1L << 16))
    val n = DedupOps.MaxBandBucket + 10 // one viral sketch, > cap in EVERY band
    val viral = spark.range(n).select(col("id").as("doc_id"),
      lit(0x123456789ABCDEFL).as("sh_hi"), lit(0x0FEDCBA987654321L).as("sh_lo"))
    // a normal near-dup cluster far away in id space: 5 equal sketches
    // plus one at hamming 2 (one flipped bit per half)
    val base = 0x0AAAAAAAAAAAAAAAL
    val cluster = spark.range(5).select((col("id") + 9000000L).as("doc_id"),
        lit(base).as("sh_hi"), lit(base).as("sh_lo"))
      .union(spark.range(1).select(lit(9000100L).as("doc_id"),
        lit(base ^ 1L).as("sh_hi"), lit(base ^ 2L).as("sh_lo")))
    val pairs = DedupOps.bandedPairs120(viral.union(cluster), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // hot content emits NOTHING (would be (2^16+10 choose 2) pairs)
    assert(!pairs.exists { case (a, b, _) => a < 9000000L || b < 9000000L })
    // the normal cluster is untouched: C(5,2) at hamming 0 — and the
    // hamming-2 outlier (one flip per half) pairs with all five: the
    // hi-high and lo-high bands are intact
    val equalPairs = pairs.count { case (_, _, h) => h == 0 }
    val nearPairs = pairs.count { case (_, _, h) => h == 2 }
    assert(equalPairs === 10, pairs)
    assert(nearPairs === 5, pairs)
    assert(pairs.size === 15, pairs)
  }

  test("the hot-key frame is aggregate-bounded and broadcasts into a left_anti") {
    val sh = spark.range(10).select(col("id").as("doc_id"),
      lit(1L).as("sh_hi"), lit(2L).as("sh_lo"))
    val p = DedupOps.bandedPairs120(sh, 3).queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p)
    assert(p.split("\n").exists(l => l.contains("Broadcast") && l.contains("LeftAnti")), p)
  }
}
