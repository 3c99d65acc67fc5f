package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Codegen canary (r13 verdict #6): the s02/d10 hyperplane stage ran
  * INTERPRETED for multiple rounds because janino's "Code grows beyond
  * 64 KB" only surfaced as a log line while the plan silently fell back.
  * This spec runs the historically fallback-prone cells (plus the
  * native-expression-heavy ones) with `spark.sql.codegen.fallback=false`,
  * under which a whole-stage compile failure THROWS — so a silently
  * interpreted stage fails the suite, not just the sweep gate (Sweep
  * applies the same conf across all 223 queries at sf1 every gate; this
  * is the fast in-suite tier of the same canary).
  */
class CodegenCanarySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("codegen-canary-spec", "4").getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }
  private val sf = "/root/testdata/sf0.001"

  // s02/d10: the r13 janino-64KB fallback site (fixed by the native
  // hyperplane_bucket8); s17: the ~5,200-node MIPS tree class (r8);
  // t11: the interpreted-HOF class (r12); d09/m22: the banded
  // bucket-generate + native sketch pipeline; q50: value_pairs
  // generator; d16: the embedding near-dup chain over s02's buckets
  private val cells = Seq("s02_ann_lsh", "d10_embedding_neardup_lsh",
    "s17_mips_lsh", "t11_dsir_weights", "d09_simhash_band_pairs",
    "m22_caption_image_swap", "q50_basket_pairs", "d16_semantic_dedup")

  test("historically fallback-prone cells compile every generated stage") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      cells.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        // noop sink: materialize every column through the real plan
        fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
