package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native sign_mask60 expression is s16/s31's tier-0 binary sketch.
  * Pinned against the independent declarative 60-step fold — the exact
  * form it replaced and the same rule the DuckDB oracle computes — plus
  * the eval/codegen identity and the input contract. */
class SignMask60Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("signmask60-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** The replaced declarative form — independent truth, oracle-identical. */
  private val declarative = expr(
    "aggregate(sequence(1, 60), CAST(0 AS BIGINT), " +
      "(acc, i) -> acc + IF(element_at(v, i) > 0.0D, " +
      "shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))")

  test("native expression equals the declarative 60-step fold on real embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val bad = e
      .select(GraftFunctions.signMask60(col("v")).as("n"), declarative.as("u"))
      .filter(col("n") =!= col("u"))
      .count()
    assert(bad === 0L)
  }

  test("interpreted eval agrees with codegen; mask fits in 60 bits") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rows = spark.range(40).select(
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i.cast("double"))).as("v"))
      .select(col("v"), GraftFunctions.signMask60(col("v")).as("m")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      val interp = SignMask60(
        Literal(new GenericArrayData(v), ArrayType(DoubleType)))
        .eval(null).asInstanceOf[Long]
      assert(interp === r.getLong(1))
      assert((r.getLong(1) >>> 60) === 0L)
    }
  }

  test("short input is rejected loudly (the ANSI element_at contract)") {
    val ex = intercept[Exception] {
      spark.sql("SELECT sign_mask60(CAST(array(1.0, -2.0) AS ARRAY<DOUBLE>))").head()
    }
    assert(ex.getMessage != null)
  }
}
