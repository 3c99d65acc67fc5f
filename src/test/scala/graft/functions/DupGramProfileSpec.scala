package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** dup_gram_profile computes t27's whole per-doc repeat profile in one
  * generated pass over the WORDS array (no gram-array materialization).
  * Pinned against plain-Scala truth, against the DupGramStats-over-
  * grams3 composition it replaced, and on the validation contract. */
class DupGramProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("dupgramprofile-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** Independent truth in plain Scala — the oracle's gram rule. */
  private def truth(ws: Seq[String]): (Long, Long, Long, Long) = {
    val grams = if (ws.size < 3) Seq.empty
      else ws.sliding(3).map(_.mkString(" ")).toSeq
    val seen = scala.collection.mutable.HashSet.empty[String]
    var rep = 0L; var repChars = 0L; var gramChars = 0L
    grams.foreach { g =>
      val nc = g.codePointCount(0, g.length).toLong
      gramChars += nc
      if (!seen.add(g)) { rep += 1; repChars += nc }
    }
    (grams.size.toLong, rep, gramChars, repChars)
  }

  test("native profile equals plain-Scala truth and the grams3+dup_gram_stats composition on corpus text") {
    import graft.operators.OpUtils.{grams3, words}
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ws", words(col("text")))
      .select(col("ws"),
        GraftFunctions.dupGramProfile(col("ws")).as("m"),
        GraftFunctions.dupGramStats(grams3(col("ws"))).as("st"),
        size(grams3(col("ws"))).cast("long").as("g"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, rep, gramChars, repChars) = truth(r.getSeq[String](0))
      assert(r.getSeq[Long](1) === Seq(g, rep, gramChars, repChars))
      // composition twin: same repeat stats as the two-step pipeline
      assert(r.getSeq[Long](2) === Seq(rep, repChars))
      assert(r.getLong(3) === g)
    }
  }

  test("interpreted eval agrees with codegen on short synthetic word lists") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def interp(ws: Seq[String]): Seq[Long] = {
      val arr = new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
      val out = DupGramProfile(Literal(arr, ArrayType(StringType)))
        .eval(null).asInstanceOf[ArrayData]
      (0 until 4).map(out.getLong)
    }
    assert(interp(Seq.empty) === Seq(0L, 0L, 0L, 0L))
    assert(interp(Seq("a", "b")) === Seq(0L, 0L, 0L, 0L))
    // "a b c" ×2 from 5 words a b c a b c? windows: abc bca cab abc — one repeat
    assert(interp(Seq("a", "b", "c", "a", "b", "c")) ===
      Seq(4L, 1L, 20L, 5L))
    val rows = spark.range(60).select(
      transform(sequence(lit(1), pmod(col("id"), lit(11)).cast("int") + 1),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(3)))).as("ws"))
      .select(col("ws"), GraftFunctions.dupGramProfile(col("ws")).as("m")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === interp(r.getSeq[String](0)), s"ws=${r.getSeq[String](0)}")
    }
  }

  test("null word throws; null input yields null") {
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT dup_gram_profile(array('a', CAST(NULL AS STRING), 'c'))").head()
    }
    assert(ex.getMessage != null)
    assert(spark.sql(
      "SELECT dup_gram_profile(CAST(NULL AS ARRAY<STRING>))").head().isNullAt(0))
    // r10 ADVICE: sub-window arrays (<3 words) must ALSO throw on null
    // elements — the validation pass runs over all n, not just windows
    val exShort = intercept[Exception] {
      spark.sql(
        "SELECT dup_gram_profile(array('a', CAST(NULL AS STRING)))").head()
    }
    assert(exShort.getMessage != null)
  }
}
