package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** Pins [[PqEncode]]/[[PqDistTable]] — the s09/s11/s31 native codec —
  * against the retired declarative aggregate-HOF folds, bit-equal. */
class PqCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("pq-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def chunkDist(v: Column, cv: Column, c: Int): Column =
    (1 to 8).foldLeft(lit(0.0)) { (acc, j) =>
      val dv = element_at(v, c * 8 + j) - element_at(cv, c * 8 + j)
      acc + dv * dv
    }

  test("native codec is bit-equal to the declarative folds on real vectors") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cb = e.groupBy(col("label"))
      .agg(array((1 to 64).map(dim =>
        sum(round(element_at(col("v"), dim) * lit(1e7)).cast("decimal(28,0)"))
          .cast("double") / lit(1e7) / count(lit(1))): _*).as("cv"))
      .select(col("label").cast("long").as("code"), col("cv"))
      .agg(collect_list(struct(col("code"), col("cv"))).as("cb"))
    val both = e.crossJoin(broadcast(cb))
      .select(col("vec_id"),
        call_function("pq_encode", col("v"), col("cb")).as("nat_codes"),
        array((0 until 8).map { c =>
          aggregate(col("cb"),
            struct(lit(1e30).as("s"), lit(99L).as("k")),
            (acc, x) => {
              val dist = chunkDist(col("v"), x.getField("cv"), c)
              when(dist < acc.getField("s") ||
                  (dist === acc.getField("s") &&
                    x.getField("code") < acc.getField("k")),
                struct(dist.as("s"), x.getField("code").as("k")))
                .otherwise(acc)
            }).getField("k")
        }: _*).as("hof_codes"),
        call_function("pq_dist_table", col("v"), col("cb")).as("nat_tab"),
        array((0 until 8).map { c =>
          transform(array_sort(col("cb")),
            x => chunkDist(col("v"), x.getField("cv"), c))
        }: _*).as("hof_tab"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"codes at vec ${r.getLong(0)}")
      val nt = r.getSeq[scala.collection.Seq[Double]](3)
      val ht = r.getSeq[scala.collection.Seq[Double]](4)
      assert(nt.size === 8 && ht.size === 8)
      nt.zip(ht).zipWithIndex.foreach { case ((a, b), c) =>
        assert(a.size === b.size, s"chunk $c size")
        a.zip(b).foreach { case (x, y) =>
          assert(java.lang.Double.doubleToLongBits(x) ===
            java.lang.Double.doubleToLongBits(y),
            s"vec ${r.getLong(0)} chunk $c: $x vs $y")
        }
      }
    }
  }

  test("dim mismatch and null codebook entries throw; null vector is null") {
    GraftFunctions.register(spark)
    val bad = intercept[Exception] {
      spark.sql(
        """SELECT pq_encode(CAST(array(1.0) AS ARRAY<DOUBLE>),
          |  array(struct(CAST(0 AS BIGINT) AS code,
          |    CAST(array(1.0) AS ARRAY<DOUBLE>) AS cv)))""".stripMargin).head()
    }
    assert(bad.getMessage != null)
    val nul = spark.sql(
      """SELECT pq_encode(CAST(NULL AS ARRAY<DOUBLE>),
        |  array(struct(CAST(0 AS BIGINT) AS code,
        |    transform(sequence(1, 64), i -> CAST(i AS DOUBLE)) AS cv)))""".stripMargin)
      .head()
    assert(nul.isNullAt(0))
  }
}
