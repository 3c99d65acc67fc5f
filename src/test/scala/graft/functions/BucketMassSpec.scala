package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native bucket_mass2 expression is t11's scoring pass (r12
  * verdict #3: the two interpreted aggregate() HOFs doubled the sf1
  * cell). Pins native ≡ the declarative fold on real corpus bigrams
  * and the fail-fast contract.
  */
class BucketMassSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("bucket-mass-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("native equals the declarative aggregate() folds on corpus bigram buckets") {
    import graft.operators.OpUtils.{md5Val, words}
    // t11's exact feature pipeline at sf0.001: hashed word bigrams
    val bg = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ws", words(col("text")))
      .withColumn("bks",
        when(size(col("ws")) < 2, array().cast("array<bigint>"))
          .otherwise(transform(sequence(lit(1), size(col("ws")) - 1),
            i => pmod(md5Val(concat_ws(" ", slice(col("ws"), i, lit(2))), 15), lit(4096L)))))
    // two deterministic 4096-long tables (values vary by slot)
    val tm = transform(sequence(lit(0L), lit(4095L)), i => pmod(i * 7L + 3L, lit(1000L)))
    val cm = transform(sequence(lit(0L), lit(4095L)), i => pmod(i * 13L + 1L, lit(997L)) + 1L)
    val bad = bg
      .withColumn("tm", tm).withColumn("cm", cm)
      .withColumn("mm", GraftFunctions.bucketMass2(col("bks"), col("tm"), col("cm")))
      .withColumn("t_decl", aggregate(col("bks"), lit(0L),
        (acc, b) => acc + element_at(col("tm"), (b + 1).cast("int"))))
      .withColumn("c_decl", aggregate(col("bks"), lit(0L),
        (acc, b) => acc + element_at(col("cm"), (b + 1).cast("int"))))
      .filter(element_at(col("mm"), 1) =!= col("t_decl") ||
        element_at(col("mm"), 2) =!= col("c_decl"))
      .count()
    assert(bad === 0L)
  }

  test("empty buckets give [0, 0]; null input gives null") {
    val r = spark.sql(
      """SELECT bucket_mass2(CAST(array() AS ARRAY<BIGINT>),
        |  transform(sequence(0, 9), i -> CAST(i AS BIGINT)),
        |  transform(sequence(0, 9), i -> CAST(i AS BIGINT)))""".stripMargin).head()
    assert(r.getSeq[Long](0) === Seq(0L, 0L))
    val n = spark.sql(
      """SELECT bucket_mass2(CAST(NULL AS ARRAY<BIGINT>),
        |  array(CAST(1 AS BIGINT)), array(CAST(1 AS BIGINT)))""".stripMargin).head()
    assert(n.isNullAt(0))
  }

  test("out-of-range bucket ids and null elements reject loudly") {
    val oob = intercept[Exception] {
      spark.sql(
        """SELECT bucket_mass2(array(CAST(10 AS BIGINT)),
          |  transform(sequence(0, 9), i -> CAST(i AS BIGINT)),
          |  transform(sequence(0, 9), i -> CAST(i AS BIGINT)))""".stripMargin).head()
    }
    assert(oob.getMessage.contains("bucket_mass2") ||
      Option(oob.getCause).exists(_.getMessage.contains("bucket_mass2")), oob.getMessage)
    val nul = intercept[Exception] {
      spark.sql(
        """SELECT bucket_mass2(array(CAST(NULL AS BIGINT)),
          |  array(CAST(1 AS BIGINT)), array(CAST(1 AS BIGINT)))""".stripMargin).head()
    }
    assert(nul.getMessage != null)
  }
}
