package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, Tables}

/** Pins [[WordProfile]] against the declarative HOF forms it replaced
  * across the t/p/m/s quality-recipe sites. */
class WordProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("wp-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("native profile equals the declarative HOF quartet on corpus text") {
    GraftFunctions.register(spark)
    val ws = split(trim(col("text")), " +")
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"),
        GraftFunctions.wordProfile(ws).as("wp"),
        size(ws).cast("long").as("n"),
        aggregate(transform(ws, w => length(w)), lit(0), (a, b) => a + b)
          .cast("long").as("sum_len"),
        size(filter(ws, w => w.isin("the", "a", "of", "and", "to")))
          .cast("long").as("stop_hits"),
        size(filter(ws, w => w.rlike("[^a-z0-9]"))).cast("long").as("n_sym"),
        size(filter(ws, w => length(w) >= 7)).cast("long").as("n_complex"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wp = r.getSeq[Long](1)
      assert(wp === Seq(r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)), s"doc ${r.getLong(0)}")
    }
  }

  test("multibyte words count as symbols (the rlike contract) and stopwords match exactly") {
    GraftFunctions.register(spark)
    val wp = spark.sql(
      "SELECT word_profile(array('the', '的', 'abc123', 'a', 'longword'))")
      .head().getSeq[Long](0)
    // n=5; sum_len=1+1+6+1+8+3(the)=... the(3)+的(1)+abc123(6)+a(1)+longword(8)=19
    assert(wp === Seq(5L, 19L, 2L, 1L, 1L))
    val ex = intercept[Exception] {
      spark.sql("SELECT word_profile(array('a', CAST(NULL AS STRING)))").head()
    }
    assert(ex.getMessage != null)
    assert(spark.sql("SELECT word_profile(CAST(NULL AS ARRAY<STRING>))")
      .head().isNullAt(0))
  }
}
