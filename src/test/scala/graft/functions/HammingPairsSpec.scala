package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The native hamming_pairs generator is the band-bucket candidate
  * triangle at the near-dup verify sites (d09/m22) — these tests pin
  * it against the independent banded SELF-JOIN form (the shape the
  * DuckDB oracle still computes) on real corpus sketches, and check
  * the validation contract.
  */
class HammingPairsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("hamming-pairs-spec", "4").getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** d09's exact pipeline at sf0.001, parameterized by pair strategy. */
  private def d09Pairs(viaGenerator: Boolean): Set[(Long, Long, Int)] = {
    import graft.operators.OpUtils.words
    val sh = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("hs", GraftFunctions.gramHashes60(words(col("text")), 1))
      .withColumn("simhash", GraftFunctions.simHash60(col("hs")))
      .select(col("doc_id"), col("simhash"))
    val bands = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key", expr("shiftright(simhash, band * 15) & 32767"))
    val pairs =
      if (viaGenerator)
        bands.groupBy(col("band"), col("key"))
          .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
          .select(GraftFunctions.hammingPairs(col("members"), 3)
            .as(Seq("a_id", "b_id", "hamming")))
      else
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
          .filter(col("hamming") <= 3)
    pairs.distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("generator pairs equal the banded self-join pairs on corpus sketches") {
    val viaJoin = d09Pairs(viaGenerator = false)
    val viaGen = d09Pairs(viaGenerator = true)
    assert(viaGen.nonEmpty) // the fixture corpus HAS near-dups
    assert(viaGen === viaJoin)
  }

  test("triangle is exact on a dense bucket: all-equal sketches emit n*(n-1)/2 ordered pairs") {
    val n = 9
    val rows = spark.range(n).select(
      lit(0L).as("band"), lit(7L).as("key"), col("id"), lit(42L).as("sk"))
    val got = rows.groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("id"), col("sk"))).as("m"))
      .select(GraftFunctions.hammingPairs(col("m"), 0)
        .as(Seq("a_id", "b_id", "hamming")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for { i <- 0 until n; j <- (i + 1) until n }
      yield (i.toLong, j.toLong, 0)).toSet
    assert(got === want)
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("max_hamming is a real filter and the emitted hamming is bit_count(xor)") {
    val rows = Seq((1L, 0L), (2L, 3L), (3L, 0xFFL)) // ham(1,2)=2, others 8/6
    val df = spark.createDataFrame(rows).toDF("id", "sk")
      .groupBy().agg(collect_list(struct(col("id"), col("sk"))).as("m"))
    val got = df.select(GraftFunctions.hammingPairs(col("m"), 2)
        .as(Seq("a", "b", "h")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 2)))
  }

  test("value_pairs equals the nested-transform pair explode on real baskets") {
    val ps = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val viaGen = ps
      .select(GraftFunctions.valuePairs(col("ps")).as(Seq("pk1", "pk2")))
      .groupBy(col("pk1"), col("pk2")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaHof = ps.filter(size(col("ps")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("ps")) - 1),
        i => transform(sequence(i + 1, size(col("ps"))),
          j => struct(element_at(col("ps"), i).as("pk1"),
            element_at(col("ps"), j).as("pk2")))))).as("p"))
      .groupBy(col("p.pk1").as("pk1"), col("p.pk2").as("pk2"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaGen.nonEmpty)
    assert(viaGen === viaHof)
  }

  test("singleton and empty buckets emit nothing; null member rejects loudly") {
    val one = spark.sql(
      "SELECT hamming_pairs(array(struct(CAST(1 AS BIGINT), CAST(2 AS BIGINT))), 60)")
    assert(one.count() === 0L)
    val empty = spark.sql(
      "SELECT hamming_pairs(CAST(array() AS ARRAY<STRUCT<a: BIGINT, b: BIGINT>>), 60)")
    assert(empty.count() === 0L)
    val err = intercept[Exception] {
      spark.sql(
        """SELECT hamming_pairs(array(
          |  struct(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
          |  struct(CAST(2 AS BIGINT), CAST(0 AS BIGINT))), 60)""".stripMargin)
        .collect()
    }
    assert(err.getMessage != null)
  }
}
