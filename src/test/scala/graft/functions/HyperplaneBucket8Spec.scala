package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native hyperplane_bucket8 expression replaced s02/d10's unrolled
  * ~512-node declarative bucket fold — which, instantiated on both
  * sides of d10's self-join, pushed the stage's generated method past
  * janino's 64 KB limit so the whole stage fell back to interpreted
  * execution. The unrolled form stays in the repo as the independent
  * truth these tests check the native expression against — buckets
  * must be BIT-identical (the DuckDB oracle mirrors the same fold
  * order).
  */
class HyperplaneBucket8Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("hyper8-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** 64-dim pseudo-random vectors, deterministic, sign-mixed. */
  private def vecs(n: Int) = spark.range(n).select(
    col("id"),
    transform(sequence(lit(1), lit(64)),
      i => (pmod(xxhash64(col("id"), i), lit(2001)) - 1000).cast("double") / 250)
      .as("v"))

  test("native expression is bitwise-equal to the unrolled declarative fold") {
    val bad = vecs(500)
      .select(call_function("hyperplane_bucket8", col("v")).as("n"),
        graft.operators.SimilarityOps.bucketColUnrolled(col("v")).as("u"))
      .filter(not(col("n") === col("u")))
      .count()
    assert(bad === 0L)
  }

  test("real embeddings: native equals unrolled on the corpus the operators read") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val bad = e.select(
        call_function("hyperplane_bucket8", col("v")).as("n"),
        graft.operators.SimilarityOps.bucketColUnrolled(col("v")).as("u"))
      .filter(not(col("n") === col("u")))
      .count()
    assert(bad === 0L)
  }

  test("edge cases: null vector is bucket 0; null element lands in bucket 0; short vector throws") {
    import spark.implicits._
    // r13 ADVICE #1: a NULL array must match the replaced fold
    // bit-for-bit — when(null > 0).otherwise(0) yields 0, never null
    val nullVec = Seq((1L, null: Array[java.lang.Double]))
      .toDF("id", "v").select(call_function("hyperplane_bucket8",
        col("v").cast("array<double>")).as("b"))
    val row = nullVec.collect().head
    assert(!row.isNullAt(0) && row.getInt(0) === 0)

    val withNullElem = spark.range(1).select(
      concat(array((1 to 63).map(i => lit(i.toDouble)): _*),
        array(lit(null).cast("double"))).as("v"))
      .select(call_function("hyperplane_bucket8", col("v")).as("b"))
    assert(withNullElem.collect().head.getInt(0) === 0)

    val short = spark.range(1).select(
      array((1 to 10).map(i => lit(i.toDouble)): _*).as("v"))
      .select(call_function("hyperplane_bucket8", col("v")))
    val ex = intercept[Exception] { short.collect() }
    assert(ex.getMessage != null)
  }
}
