package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The 120-bit sketch tier (r12 verdict #1: the 60-bit sketch's
  * 4×15-bit bands have a MEASURED ~quadratic collision mass; 4×30-bit
  * bands need a 120-bit sketch). These tests pin gram_hashes120 and
  * simhash120 against independent declarative forms — the same rules
  * the DuckDB oracle computes — plus the two-word hamming_pairs
  * variant against the banded self-join on real corpus sketches.
  */
class SimHash120Spec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("simhash120-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("gram_hashes120 halves equal the declarative md5 hex folds on corpus text") {
    import graft.operators.OpUtils.words
    val d = docs
      .withColumn("ws", words(col("text")))
      .withColumn("h120", GraftFunctions.gramHashes120(col("ws"), 1))
      // declarative truth: hi = hex 1..15 (== gram_hashes60), lo = hex 16..30
      .withColumn("hi_decl", GraftFunctions.gramHashes60(col("ws"), 1))
      .withColumn("lo_decl", transform(col("ws"),
        w => conv(substring(md5(w), 16, 15), 16, 10).cast("long")))
    val bad = d.select(
        size(col("h120")).as("n2"), size(col("ws")).as("n"),
        filter(transform(sequence(lit(1), size(col("ws"))), i =>
          element_at(col("h120"), i * 2 - 1) === element_at(col("hi_decl"), i) &&
            element_at(col("h120"), i * 2) === element_at(col("lo_decl"), i)),
          ok => !ok).as("mismatches"))
      .filter(col("n2") =!= col("n") * 2 || size(col("mismatches")) > 0)
      .count()
    assert(bad === 0L)
  }

  test("gram_hashes120 windows of width 3 hash the joined 3-gram, both halves") {
    val d = docs.limit(50)
      .withColumn("ws", graft.operators.OpUtils.words(col("text")))
      .filter(size(col("ws")) >= 3)
      .withColumn("h120", GraftFunctions.gramHashes120(col("ws"), 3))
      .withColumn("grams", graft.operators.OpUtils.grams3(col("ws")))
      .withColumn("hi_decl", transform(col("grams"),
        g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")))
      .withColumn("lo_decl", transform(col("grams"),
        g => conv(substring(md5(g), 16, 15), 16, 10).cast("long")))
    val bad = d.select(
        filter(transform(sequence(lit(1), size(col("grams"))), i =>
          element_at(col("h120"), i * 2 - 1) === element_at(col("hi_decl"), i) &&
            element_at(col("h120"), i * 2) === element_at(col("lo_decl"), i)),
          ok => !ok).as("mismatches"))
      .filter(size(col("mismatches")) > 0)
      .count()
    assert(bad === 0L)
  }

  test("simhash120 equals two independent declarative 60-pass folds on corpus text") {
    import graft.operators.OpUtils.words
    def fold(hsCol: String) = expr(
      s"""aggregate(
         |  transform(sequence(0, 59), j ->
         |    IF(aggregate($hsCol, 0,
         |         (acc, x) -> acc + IF((shiftright(x, j) & 1) = 1, 1, -1)) > 0,
         |       shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin)
    val d = docs
      .withColumn("ws", words(col("text")))
      .withColumn("sk", GraftFunctions.simHash120(
        GraftFunctions.gramHashes120(col("ws"), 1)))
      .withColumn("hs_hi", transform(col("ws"),
        w => conv(substring(md5(w), 1, 15), 16, 10).cast("long")))
      .withColumn("hs_lo", transform(col("ws"),
        w => conv(substring(md5(w), 16, 15), 16, 10).cast("long")))
    val bad = d
      .select(col("sk"), fold("hs_hi").as("hi_decl"), fold("hs_lo").as("lo_decl"))
      .filter(element_at(col("sk"), 1) =!= col("hi_decl") ||
        element_at(col("sk"), 2) =!= col("lo_decl"))
      .count()
    assert(bad === 0L)
  }

  test("empty array folds to [0, 0]; null yields null; odd length rejects loudly") {
    val r = spark.sql("SELECT simhash120(CAST(array() AS ARRAY<BIGINT>))").head()
    assert(r.getSeq[Long](0) === Seq(0L, 0L))
    val n = spark.sql("SELECT simhash120(CAST(NULL AS ARRAY<BIGINT>))").head()
    assert(n.isNullAt(0))
    val odd = intercept[Exception] {
      spark.sql("SELECT simhash120(array(CAST(1 AS BIGINT)))").head()
    }
    assert(odd.getMessage.contains("simhash120") ||
      Option(odd.getCause).exists(_.getMessage.contains("simhash120")), odd.getMessage)
    val nul = intercept[Exception] {
      spark.sql("SELECT simhash120(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)))").head()
    }
    assert(nul.getMessage != null)
  }

  /** d09's r13 pipeline at sf0.001, parameterized by pair strategy:
    * two-word generator vs the banded self-join the oracle computes. */
  private def pairs120(viaGenerator: Boolean): Set[(Long, Long, Int)] = {
    import graft.operators.OpUtils.words
    val sh = docs
      .withColumn("sk", GraftFunctions.simHash120(
        GraftFunctions.gramHashes120(words(col("text")), 1)))
      .select(col("doc_id"),
        element_at(col("sk"), 1).as("sh_hi"), element_at(col("sk"), 2).as("sh_lo"))
    val bands = sh.select(col("doc_id"), col("sh_hi"), col("sh_lo"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key", expr(
        "(CASE WHEN band < 2 THEN shiftright(sh_hi, band * 30) " +
          "ELSE shiftright(sh_lo, (band - 2) * 30) END) & 1073741823"))
    val p =
      if (viaGenerator)
        bands.groupBy(col("band"), col("key"))
          .agg(collect_list(struct(col("doc_id"), col("sh_hi"), col("sh_lo"))).as("members"))
          .select(GraftFunctions.hammingPairs(col("members"), 3)
            .as(Seq("a_id", "b_id", "hamming")))
      else
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            (expr("bit_count(a.sh_hi ^ b.sh_hi)") +
              expr("bit_count(a.sh_lo ^ b.sh_lo)")).as("hamming"))
          .filter(col("hamming") <= 3)
    p.distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("two-word hamming_pairs equals the banded self-join on 120-bit corpus sketches") {
    val viaJoin = pairs120(viaGenerator = false)
    val viaGen = pairs120(viaGenerator = true)
    assert(viaGen.nonEmpty) // the fixture corpus HAS exact-dup near-pairs
    assert(viaGen === viaJoin)
  }

  test("two-word hamming sums both halves: [id, hi, lo] structs") {
    val rows = Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 0L, 0xFL))
    val df = spark.createDataFrame(rows).toDF("id", "hi", "lo")
      .groupBy().agg(collect_list(struct(col("id"), col("hi"), col("lo"))).as("m"))
    val got = df.select(GraftFunctions.hammingPairs(col("m"), 2)
        .as(Seq("a", "b", "h")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // ham(1,2) = 1 + 1 = 2; ham(1,3) = 0 + 4 = 4; ham(2,3) = 1 + 3 = 4
    assert(got === Set((1L, 2L, 2)))
  }
}
