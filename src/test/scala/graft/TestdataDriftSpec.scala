package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Guard against driver-side testdata regeneration silently changing the
  * on-disk encoding of `events.ts` (r6 post-mortem: a regeneration moved
  * it from TIMESTAMP(NANOS) to µs isAdjustedToUTC=false, every
  * `unix_micros(ts)` call site failed analysis, and the whole round's
  * BENCH artifact died as rc=1/parsed:null). This spec reads the
  * DRIVER'S parquet — not SfGen output — through [[Tables.events]] and
  * drives one `unix_micros` query end-to-end, so the next encoding drift
  * fails `sbt test` with a named cause instead of nuking the round.
  */
class TestdataDriftSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("testdata-drift", "4").getOrCreate()
  val sfDir = "/root/testdata/sf0.001"

  test("driver events.ts normalizes to TimestampType through Tables.events") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"Tables.events left ts as ${ev.schema("ts").dataType} — new driver encoding?")
  }

  test("a unix_micros query analyzes and runs on the driver's events parquet") {
    val ev = Tables.events(spark, sfDir)
    // the exact pattern all five events queries (q18/q19/q21/q31/q33) use
    val out = ev.withColumn("us", unix_micros(col("ts")))
      .agg(min("us").as("lo"), max("us").as("hi"), count(lit(1)).as("n"))
      .collect()(0)
    assert(out.getLong(2) > 0, "driver events table is empty")
    // all driver generations put events inside 2024-01 (SfGen parity tests
    // pin the same month); a wildly-off epoch means a unit/timezone drift
    val jan2024us = 1704067200000000L
    assert(out.getLong(0) >= jan2024us && out.getLong(1) < jan2024us + 40L * 86400 * 1000000,
      s"events.ts epoch range [${out.getLong(0)}, ${out.getLong(1)}] outside 2024-01 window — unit or timezone drift")
  }

  test("q40 key contract: events.ts is never NULL and epoch-micros is non-negative") {
    // q40_latest_compaction orders by max(struct(us, event_id)) while
    // its oracle keeps the lpad-20 string arg_max key; the two agree
    // only while us >= 0 (a negative us breaks lexicographic-vs-numeric
    // equivalence) and ts is NOT NULL (max_by skipped NULL keys, while
    // max(struct) would rank a NULL us lowest but still eligible). This
    // asserts the data contract the equivalence note in EventsOps
    // relies on, so a testdata regeneration that violates it fails here
    // by name instead of surfacing as a cross-engine hash mismatch.
    // (us > 2^63-1 cannot occur: a long is at most 19 digits, inside
    // the oracle's 20-char pad.)
    val ev = Tables.events(spark, sfDir)
    val bad = ev.filter(col("ts").isNull ||
      unix_micros(col("ts")) < 0).count()
    assert(bad === 0L, s"$bad events rows violate the q40 (us, event_id) key contract")
  }
}
