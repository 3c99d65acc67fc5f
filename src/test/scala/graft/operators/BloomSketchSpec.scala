package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The d18 Bloom contract, asserted per-row (the query ships only the
  * two aggregate booleans): every exact duplicate must be a bloom hit
  * (no false negatives — the property the shuffle-free fast path is
  * built on), and the false-positive rate among genuinely-new docs must
  * sit near the 8-bits/key design point, far under the 5% bound. */
class BloomSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("bloom-sketch-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("bloom probe has zero false negatives and a small measured FP rate") {
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.OpUtils.md5Val

    // load the filter AT its design point (100k items into 800k bits =
    // 8 bits/key) so the measured FP rate is the design-point rate, not
    // the ~0 of an underfilled filter
    val n = 100000
    val oldKeys = spark.range(n)
      .select(md5Val(concat(lit("corpus:"), col("id").cast("string")), 15).as("k"))
    val bf = oldKeys.agg(expr("graft_bloom_agg(k, 100000L, 800000L)").as("bf"))
      .head().getAs[Array[Byte]](0)

    // probe set: the first n/2 corpus keys (must ALL hit) + n fresh keys
    val probes = spark.range(n / 2)
      .select(md5Val(concat(lit("corpus:"), col("id").cast("string")), 15).as("k"),
        lit(true).as("known"))
      .unionAll(spark.range(n)
        .select(md5Val(concat(lit("fresh:"), col("id").cast("string")), 15).as("k"),
          lit(false).as("known")))
      .withColumn("hit",
        graft.functions.GraftFunctions.bloomMightContain(lit(bf), col("k")))

    val rows = probes.groupBy(col("known"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap

    // no false negatives: every known key hits
    assert(rows(true)._2 === rows(true)._1, s"bloom dropped known keys: $rows")
    // measured FP rate near the 8-bits/key design point (~2%), under 5%
    val fpRate = rows(false)._2.toDouble / rows(false)._1
    assert(fpRate < 0.05, s"FP rate $fpRate out of contract")
    assert(fpRate > 0.0 || rows(false)._1 < 1000,
      "suspiciously perfect filter — probe likely broken")
  }

  test("d18's aggregate contract holds at sf0.001 too") {
    val r = graft.SparkEntry.queries("d18_bloom_prefilter")(spark, sf).head()
    assert(r.getBoolean(2), "false negative in d18")
    assert(r.getBoolean(3), "FP bound violated in d18")
    assert(r.getLong(0) > 0)
  }
}
