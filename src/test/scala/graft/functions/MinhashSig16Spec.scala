package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** minhash_sig16 is the d03-family signature build (d02/d03/d12/d13/
  * d15/d22/d33/d34 share the persisted store it feeds). Equality with
  * the declarative 16×(transform+array_min) pipeline is the
  * load-bearing contract — the DuckDB oracle computes THAT form. */
class MinhashSig16Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("minhashsig16-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("native signature equals the declarative HOF pipeline on corpus gram values") {
    import graft.operators.OpUtils.{minhashSigFromGvs, words}
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("gvs", transform(
        GraftFunctions.gramHashes60(words(col("text")), 3),
        h => pmod(h, lit(1L << 30))))
      .select(
        GraftFunctions.minhashSig16(col("gvs")).as("ns"),
        minhashSigFromGvs(col("gvs")).as("ds"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Any](0) === r.getSeq[Any](1))
    }
  }

  test("empty array yields the 16-null signature; null array yields null; null element throws") {
    val e = spark.sql(
      "SELECT minhash_sig16(CAST(array() AS ARRAY<BIGINT>))").head()
    val sig = e.getSeq[Any](0)
    assert(sig.length === graft.operators.OpUtils.MinhashK)
    assert(sig.forall(_ == null))
    assert(spark.sql(
      "SELECT minhash_sig16(CAST(NULL AS ARRAY<BIGINT>))").head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT minhash_sig16(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)))").head()
    }
  }
}
