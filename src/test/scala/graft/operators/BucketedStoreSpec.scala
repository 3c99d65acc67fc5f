package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** SCALE.md's dedup sections describe the 100 TB layout as "signatures
  * written once to a bucketed table, LSH queries run against it" (the
  * per-(session, dir) caches are the session-local analogue). This spec
  * proves the mechanism rather than asserting it in prose: a signature
  * store bucketed by doc_id joins by doc_id with ZERO shuffle exchanges
  * — the join cost at 100 TB is a co-located per-bucket merge, not a
  * re-shuffle of the store.
  */
class BucketedStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("bucketed-store-spec", "4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("bucketed signature store joins by id with zero exchanges") {
    import graft.Tables
    // the d02 signature shape: (doc_id, minhash signature)
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        OpUtils.minhashSigFromGvs(OpUtils.gramVals(
          OpUtils.grams3(OpUtils.words(col("text"))))).as("sig"))

    spark.sql("DROP TABLE IF EXISTS sig_store")
    sigs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"${System.getProperty("java.io.tmpdir")}/graft_sig_store")
      .mode("overwrite").saveAsTable("sig_store")

    // force a real join (no broadcast) and a static plan (no AQE
    // re-planning) so the exchange count is deterministic
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val t = spark.table("sig_store")
      // the pair-verification shape: two id-keyed probes of the store
      val joined = t.as("a").join(t.as("b"), "doc_id")
        .select(col("doc_id"), col("a.sig").as("sa"), col("b.sig").as("sb"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed store re-shuffled on its own bucket key:\n$p")
      assert(p.contains("Bucketed: true"), s"scan did not use bucketing:\n$p")
      // correctness: the co-located join returns every store row
      assert(joined.count() === t.count())
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS sig_store")
    }
  }
}
