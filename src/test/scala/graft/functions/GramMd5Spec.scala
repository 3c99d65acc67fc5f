package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** gram_md5 is the d08-family shared 8-gram store build (d08/d11/d12/
  * d13/d15 read the store it feeds). Bit-identity with the interpreted
  * transform/slice/concat_ws/md5/unhex HOF pipeline is the load-bearing
  * contract — the DuckDB oracle computes THAT form
  * (unhex(md5(array_to_string(ws[i:i+7], ' ')))). */
class GramMd5Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("grammd5-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("native window digests equal the declarative HOF pipeline on the corpus") {
    import graft.operators.OpUtils.words
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ws", words(col("text")))
      .select(
        GraftFunctions.gramMd5(col("ws"), 8).as("nat"),
        when(size(col("ws")) < 8, array().cast("array<binary>"))
          .otherwise(transform(sequence(lit(1), size(col("ws")) - 7),
            i => unhex(md5(concat_ws(" ", slice(col("ws"), i, lit(8))))))).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    var nonEmpty = 0
    rows.foreach { r =>
      val nat = r.getSeq[Array[Byte]](0)
      val hof = r.getSeq[Array[Byte]](1)
      assert(nat.length === hof.length)
      nat.zip(hof).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b))
      }
      if (nat.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 0, "corpus must exercise the non-empty window path")
  }

  test("short array yields empty; null array yields null; null element throws") {
    assert(spark.sql("SELECT gram_md5(array('a','b'), 8)").head()
      .getSeq[Any](0).isEmpty)
    assert(spark.sql("SELECT gram_md5(CAST(NULL AS ARRAY<STRING>), 8)")
      .head().isNullAt(0))
    intercept[Exception] {
      spark.sql(
        "SELECT gram_md5(array('a', CAST(NULL AS STRING), 'c', 'd', 'e', 'f', 'g', 'h'), 8)"
      ).head()
    }
  }

  test("single window matches jvm md5 of the joined words") {
    val got = spark.sql("SELECT gram_md5(array('a','bb','c','d','e','f','g','hh'), 8)")
      .head().getSeq[Array[Byte]](0)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("a bb c d e f g hh".getBytes("UTF-8"))
    assert(got.length === 1)
    assert(java.util.Arrays.equals(got.head, want))
  }
}
