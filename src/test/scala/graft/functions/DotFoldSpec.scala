package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** dot_fold carries the similarity tier's norm/dot hot paths (s14,
  * s17's brute-force truth pass). Bitwise equality with the
  * declarative aggregate(zip_with) left fold is the load-bearing
  * contract — the DuckDB oracle's oDot mirrors THAT fold order. */
class DotFoldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("dotfold-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("native dot equals the declarative HOF fold bitwise on corpus vectors") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = e.as("a").join(e.as("b"), col("a.vec_id") % 97 === col("b.vec_id") % 97 &&
        col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        GraftFunctions.dotFold(col("a.v"), col("b.v")).as("nat"),
        hofDot(col("a.v"), col("b.v")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null array yields null; length mismatch throws") {
    assert(spark.sql(
      "SELECT dot_fold(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT dot_fold(array(1.0d, 2.0d), array(1.0d))").head()
    }
  }
}
