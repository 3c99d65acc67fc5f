package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native mips_buckets expression replaced s17's unrolled
  * ~5,200-node declarative bucket tree (r7 verdict: 42-61 s of plan
  * compile cold). The unrolled form stays in the repo as the
  * independent truth these tests check the native expression against —
  * buckets must be BIT-identical (the DuckDB oracle mirrors the same
  * fold order).
  */
class MipsBucketsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("mips-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** 65-dim pseudo-random augmented vectors, deterministic. */
  private def vecs(n: Int) = spark.range(n).select(
    col("id"),
    transform(sequence(lit(1), lit(65)),
      i => (pmod(xxhash64(col("id"), i), lit(2001)) - 1000).cast("double") / 250)
      .as("va"))

  test("native expression is bitwise-equal to the unrolled declarative fold") {
    val unrolledBuckets = transform(
      graft.operators.SimilarityOps.mipsTableBuckets(col("va")),
      tb => tb.getField("bucket"))
    val bad = vecs(200)
      .select(GraftFunctions.mipsBuckets(col("va")).as("n"), unrolledBuckets.as("u"))
      .filter(not(col("n") === col("u")))
      .count()
    assert(bad === 0L)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rows = vecs(50).select(col("va"),
      GraftFunctions.mipsBuckets(col("va")).as("b")).collect()
    rows.foreach { r =>
      val va = r.getSeq[Double](0).toArray
      val interp = MipsBuckets(
        Literal(new GenericArrayData(va), ArrayType(DoubleType)))
        .eval(null).asInstanceOf[ArrayData].toIntArray()
      assert(interp.toSeq === r.getSeq[Int](1))
    }
  }

  test("sign tensor matches the oracle md5 recipe dimensions") {
    assert(MipsBuckets.signs.length === 16 * 5 * 65)
    // not degenerate: both signs present in every table
    (0 until 16).foreach { t =>
      val slice = MipsBuckets.signs.slice(t * 325, (t + 1) * 325)
      assert(slice.exists(identity) && slice.exists(!_), s"table $t degenerate")
    }
  }

  test("usable from SQL; null yields null") {
    val r = spark.sql(
      "SELECT mips_buckets(transform(sequence(1, 65), i -> CAST(i AS DOUBLE)))").head()
    assert(r.getSeq[Int](0).length === 16)
    val n = spark.sql("SELECT mips_buckets(CAST(NULL AS ARRAY<DOUBLE>))").head()
    assert(n.isNullAt(0))
  }
}
