package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("cosine-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  private def foldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("bitwise-equal to the interpreted fold on random vectors") {
    import spark.implicits._
    val df = spark.range(2000).select(
      transform(sequence(lit(1), lit(64)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) - 500).cast("double") / 100).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => (pmod(xxhash64(col("id"), i, lit(7)), lit(1000)) - 500).cast("double") / 100).as("b"))
    val diff = df.select(
      (GraftFunctions.cosineSim(col("a"), col("b")) - foldCosine(col("a"), col("b"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff === 0L)
    val _ = spark.implicits // silence
  }

  test("usable from SQL and survives codegen") {
    spark.range(10).selectExpr("sequence(1, 4) s")
      .select(transform(col("s"), x => x.cast("double")).as("v"))
      .createOrReplaceTempView("cosvecs")
    val r = spark.sql("SELECT cosine_sim(v, v) c FROM cosvecs").collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("null inputs yield null") {
    val r = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").head()
    assert(r.isNullAt(0))
  }
}
