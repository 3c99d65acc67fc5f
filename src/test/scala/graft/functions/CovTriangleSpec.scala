package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, SparkEntry, Tables}

/** Pins [[CovTriangleAgg]] — s20's one-pass covariance state — against
  * the retired declarative pair-explode formulation, bit-equal. */
class CovTriangleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("cov-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("slot layout covers [65, 2145) exactly once, in (i asc, j asc) order") {
    val slots = for (i <- 1 to 64; j <- i to 64) yield CovTriangle.slot(i, j)
    assert(slots === (CovTriangle.Dims + 1 until CovTriangle.BufLen))
  }

  test("s20 native plan is bit-equal to the declarative explode formulation") {
    val native = SparkEntry.queries("s20_embedding_covariance")(spark, sf)
    // the r10 formulation, verbatim: posexplode dim sums + struct-pair
    // explode into partial agg + two broadcast joins
    val q = Tables.embeddings(spark, sf).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("q"))
    val ds = q.select(posexplode(col("q")).as(Seq("i0", "qi")))
      .groupBy((col("i0") + 1).cast("long").as("i"))
      .agg(sum(col("qi")).as("s"))
    val pairs = q.select(explode(flatten(transform(
        sequence(lit(1), lit(64)), i => transform(sequence(i, lit(64)),
          j => struct(i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at(col("q"), i) * element_at(col("q"), j)).as("p"))))))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("e.p")).as("spq"))
    val legacy = pairs
      .join(broadcast(ds.select(col("i").as("ii"), col("s").as("si"))),
        col("i") === col("ii"))
      .join(broadcast(ds.select(col("i").as("jj"), col("s").as("sj"))),
        col("j") === col("jj"))
      .select(col("i"), col("j"), col("n"),
        ((col("n") * col("spq") - col("si") * col("sj")).cast("double") /
          (col("n") * col("n")) / lit(4096)).as("cov"))
      .orderBy(col("i"), col("j"))
    val a = native.collect()
    val b = legacy.collect()
    assert(a.length === 2080 && b.length === 2080)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) === y.getLong(0) && x.getLong(1) === y.getLong(1))
      assert(x.getLong(2) === y.getLong(2), s"n at (${x.getLong(0)},${x.getLong(1)})")
      // bit-equal doubles: the arithmetic is the identical expression
      assert(java.lang.Double.doubleToLongBits(x.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(y.getDouble(3)),
        s"cov at (${x.getLong(0)},${x.getLong(1)}): ${x.getDouble(3)} vs ${y.getDouble(3)}")
    }
  }

  test("dim-count mismatch and null elements throw; null rows are skipped") {
    GraftFunctions.register(spark)
    val bad = intercept[Exception] {
      spark.sql("SELECT cov_triangle_agg(q) FROM (SELECT array(1L, 2L) AS q)").head()
    }
    assert(bad.getMessage != null)
    val withNullRow = spark.sql(
      """SELECT cov_triangle_agg(q) AS b FROM (
        |  SELECT transform(sequence(1, 64), x -> CAST(x AS BIGINT)) AS q
        |  UNION ALL SELECT CAST(NULL AS ARRAY<BIGINT>))""".stripMargin)
      .head().getSeq[Long](0)
    assert(withNullRow.head === 1L) // null row skipped, one row counted
    assert(withNullRow(1) === 1L && withNullRow(64) === 64L)
    assert(withNullRow(CovTriangle.slot(1, 1)) === 1L)
    assert(withNullRow(CovTriangle.slot(64, 64)) === 64L * 64L)
  }
}
