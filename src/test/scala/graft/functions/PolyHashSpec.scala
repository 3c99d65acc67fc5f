package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class PolyHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("polyhash-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  // the interpreted composition the native expressions replace — the
  // equality oracle for the rolling-update rewrite
  private val hofFull =
    "aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1))), " +
      "CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % 1000000007)"
  private val hofMin8 =
    "array_min(transform(sequence(1, length(t) - 7), i -> " +
      "aggregate(transform(sequence(0, 7), k -> ascii(substring(t, i + k, 1))), " +
      "CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % 1000000007)))"

  test("equal to the interpreted folds on random multi-script strings") {
    // mixed ASCII + CJK so code-point semantics (not bytes/UTF-16) are
    // what is actually tested
    val df = spark.range(500).select(concat(
      lit("doc 文档 "), conv(xxhash64(col("id")).cast("string"), 10, 16),
      lit(" 端到端 tail"), pmod(col("id"), lit(97)).cast("string")).as("t"))
    val diffs = df.select(
      (GraftFunctions.polyHash(col("t")) - expr(hofFull)).as("df"),
      (GraftFunctions.polyHashMin(col("t"), lit(8)) - expr(hofMin8)).as("dm"))
      .filter(col("df") =!= 0L || col("dm") =!= 0L)
      .count()
    assert(diffs === 0L)
  }

  test("short strings: min-window is null below w, full hash still defined") {
    val r = spark.sql(
      "SELECT poly_hash('abc'), poly_hash_min('abc', 8), poly_hash_min('abcdefgh', 8)").head()
    assert(!r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(!r.isNullAt(2))
  }

  test("known value: poly_hash('ab') = (0*31+97)*31+98 mod p") {
    val r = spark.sql("SELECT poly_hash('ab')").head().getLong(0)
    assert(r === (97L * 31 + 98) % 1000000007L)
  }

  test("survives whole-stage codegen over a real scan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("t", trim(col("text")))
    val native = docs.select(GraftFunctions.polyHash(col("t")).as("h"))
    val hof = docs.select(expr(hofFull).as("h"))
    assert(native.exceptAll(hof).count() === 0 && hof.exceptAll(native).count() === 0)
  }
}
