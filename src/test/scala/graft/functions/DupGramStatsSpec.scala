package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native dup_gram_stats expression is t27's repeat counter (r10:
  * one hash-set pass replaces the O(g²) exists-over-slice HOF that was
  * round 9's slowest timed cell). These tests pin it against the
  * independent declarative form — the same keep-first rule the DuckDB
  * oracle computes — and check the validation contract.
  */
class DupGramStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("dupgramstats-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** Independent keep-first truth in plain Scala — the oracle's rule
    * (position i repeats iff its gram equals an earlier gram), written
    * without Catalyst so a codegen bug can't cancel out. Counts chars
    * as codepoints to match Spark/DuckDB `length`. */
  private def truth(gs: Seq[String]): (Long, Long) = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    var n = 0L; var c = 0L
    gs.foreach { g =>
      if (!seen.add(g)) { n += 1; c += g.codePointCount(0, g.length) }
    }
    (n, c)
  }

  test("native expression equals the keep-first rule on corpus text") {
    import graft.operators.OpUtils.{grams3, words}
    // collect (gs, native) and re-derive the truth driver-side — the
    // declarative HOF twin re-evaluates the inlined gs inside every
    // lambda step (CollapseProject), which is cubic and took minutes
    // even at sf0.001; plain Scala is the stronger independent check
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("gs", grams3(words(col("text"))))
      .select(col("gs"), GraftFunctions.dupGramStats(col("gs")).as("st"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = truth(r.getSeq[String](0))
      assert(r.getSeq[Long](1) === Seq(n, c))
    }
  }

  test("interpreted eval agrees with codegen and hand-computed cases") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def interp(gs: Seq[String]): (Long, Long) = {
      val arr = new GenericArrayData(gs.map(UTF8String.fromString).toArray[Any])
      val out = DupGramStats(Literal(arr, ArrayType(StringType)))
        .eval(null).asInstanceOf[ArrayData]
      (out.getLong(0), out.getLong(1))
    }
    // keep-first: "a b" repeats twice (6 chars), "b c" once (3 chars)
    assert(interp(Seq("a b", "b c", "a b", "b c", "a b")) === ((3L, 9L)))
    assert(interp(Seq.empty) === ((0L, 0L)))
    assert(interp(Seq("solo gram x")) === ((0L, 0L)))
    // char length is numChars, not bytes (multi-byte safe)
    assert(interp(Seq("é ü ö", "é ü ö")) === ((1L, 5L)))
    // codegen path: run through a projection and compare
    val rows = spark.range(60).select(
      transform(sequence(lit(1), pmod(col("id"), lit(9)).cast("int") + 1),
        i => concat(lit("g"), pmod(xxhash64(col("id"), i), lit(4)))).as("gs"))
      .select(col("gs"), GraftFunctions.dupGramStats(col("gs")).as("st")).collect()
    rows.foreach { r =>
      val gs = r.getSeq[String](0)
      val (n, c) = interp(gs)
      assert(r.getSeq[Long](1) === Seq(n, c), s"gs=$gs")
    }
  }

  test("null element throws; null input yields null; wrong type fails analysis") {
    val ex = intercept[Exception] {
      spark.sql("SELECT dup_gram_stats(array('a', CAST(NULL AS STRING)))").head()
    }
    assert(ex.getMessage != null)
    assert(spark.sql("SELECT dup_gram_stats(CAST(NULL AS ARRAY<STRING>))").head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT dup_gram_stats(array(1, 2))").head()
    }
  }
}
