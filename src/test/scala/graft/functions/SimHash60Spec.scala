package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native simhash60 expression is d09's sketch (r8 verdict fix:
  * 60-bit sketch → 4×15-bit bands → sparse buckets at any corpus
  * size). These tests pin it against the independent declarative
  * 60-pass majority fold — the same rule the DuckDB oracle computes —
  * and check the validation contract.
  */
class SimHash60Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("simhash60-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** Declarative majority fold — independent truth, oracle-identical. */
  private val declarative = expr(
    """aggregate(
      |  transform(sequence(0, 59), j ->
      |    IF(aggregate(hs, 0,
      |         (acc, x) -> acc + IF((shiftright(x, j) & 1) = 1, 1, -1)) > 0,
      |       shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
      |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin)

  test("native expression equals the declarative 60-pass fold on corpus text") {
    import graft.operators.OpUtils.{md5Val, words}
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("hs", transform(words(col("text")), w => md5Val(w, 15)))
    val bad = docs
      .select(GraftFunctions.simHash60(col("hs")).as("n"), declarative.as("u"))
      .filter(col("n") =!= col("u"))
      .count()
    assert(bad === 0L)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val rows = spark.range(40).select(
      transform(sequence(lit(1), pmod(col("id"), lit(7)).cast("int") + 1),
        i => pmod(xxhash64(col("id"), i), lit(1L << 60))).as("hs"))
      .select(col("hs"), GraftFunctions.simHash60(col("hs")).as("s")).collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0).toArray
      val interp = SimHash60(
        Literal(new GenericArrayData(hs), ArrayType(LongType)))
        .eval(null).asInstanceOf[Long]
      assert(interp === r.getLong(1))
    }
  }

  test("empty array folds to 0; null input yields null; sketch fits in 60 bits") {
    val r = spark.sql("SELECT simhash60(CAST(array() AS ARRAY<BIGINT>))").head()
    assert(r.getLong(0) === 0L)
    val n = spark.sql("SELECT simhash60(CAST(NULL AS ARRAY<BIGINT>))").head()
    assert(n.isNullAt(0))
    val s = spark.sql(
      "SELECT simhash60(transform(sequence(1, 9), i -> xxhash64(i)))").head().getLong(0)
    assert(s >= 0L && s < (1L << 60))
  }

  test("null elements are rejected loudly, not silently voted as zero") {
    val e = intercept[Exception] {
      spark.sql("SELECT simhash60(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)))").head()
    }
    assert(e.getMessage.contains("simhash60") ||
      Option(e.getCause).exists(_.getMessage.contains("simhash60")), e.getMessage)
  }

  test("mips_buckets rejects wrong-length and null-element inputs (r8 ADVICE)") {
    val short = intercept[Exception] {
      spark.sql("SELECT mips_buckets(transform(sequence(1, 10), i -> CAST(i AS DOUBLE)))").head()
    }
    assert(short.getMessage.contains("mips_buckets") ||
      Option(short.getCause).exists(_.getMessage.contains("mips_buckets")), short.getMessage)
    val nul = intercept[Exception] {
      spark.sql(
        """SELECT mips_buckets(transform(sequence(1, 65),
          |  i -> IF(i = 7, CAST(NULL AS DOUBLE), CAST(i AS DOUBLE))))""".stripMargin).head()
    }
    assert(nul.getMessage.contains("mips_buckets") ||
      Option(nul.getCause).exists(_.getMessage.contains("mips_buckets")), nul.getMessage)
  }
}
