package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** gram_hashes60 feeds the corpus-gram tier (t21/t23/t29/t15): the
  * 60-bit md5 of every sliding window, computed without materializing
  * gram strings. Equality with the declarative md5Val pipeline is the
  * load-bearing contract — the DuckDB oracle computes THAT form. */
class GramHashes60Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("gramhashes60-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("native hashes equal the declarative md5Val-over-grams3 pipeline on corpus text") {
    import graft.operators.OpUtils.{grams3, md5Val, words}
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ws", words(col("text")))
      .select(
        GraftFunctions.gramHashes60(col("ws"), 3).as("nh"),
        transform(grams3(col("ws")), g => md5Val(g, 15)).as("dh"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("width generalizes; short arrays yield empty; width 1 hashes single words") {
    import graft.operators.OpUtils.md5Val
    val df = spark.sql("SELECT array('alpha', 'beta', 'gamma', 'delta') AS ws")
    val r8 = df.select(GraftFunctions.gramHashes60(col("ws"), 8)).head()
    assert(r8.getSeq[Long](0).isEmpty)
    val r1 = df.select(GraftFunctions.gramHashes60(col("ws"), 1).as("nh"),
      transform(col("ws"), w => md5Val(w, 15)).as("dh")).head()
    assert(r1.getSeq[Long](0) === r1.getSeq[Long](1))
    val r2 = df.select(GraftFunctions.gramHashes60(col("ws"), 2).as("nh"),
      transform(sequence(lit(1), lit(3)),
        i => md5Val(concat_ws(" ", slice(col("ws"), i, lit(2))), 15)).as("dh")).head()
    assert(r2.getSeq[Long](0) === r2.getSeq[Long](1))
  }

  test("null word throws; null array yields null; non-literal width fails analysis") {
    val ex = intercept[Exception] {
      spark.sql("SELECT gram_hashes60(array('a', CAST(NULL AS STRING), 'c'), 1)").head()
    }
    assert(ex.getMessage != null)
    assert(spark.sql(
      "SELECT gram_hashes60(CAST(NULL AS ARRAY<STRING>), 3)").head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT gram_hashes60(array('a'), CAST(NULL AS INT))").head()
    }
  }
}
