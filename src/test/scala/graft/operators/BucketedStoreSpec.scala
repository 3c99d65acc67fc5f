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

  test("stale-pid bucketed warehouse dirs are reclaimed; live and foreign dirs survive") {
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files.createTempDirectory("graft_bkt_reclaim").toFile
    val whPath = new Path(tmp.getAbsolutePath)
    val fs = whPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirTag = "aabbccddeeff"
    val myPid = ProcessHandle.current().pid()
    // pid 1 is init — alive but not us; MAX-ish pid is certainly dead
    val deadPid = 2147483647L
    val dirs = Seq(
      s"graft_bkt_orders_${dirTag}_$deadPid",      // stale → reclaimed
      s"graft_bkt_lineitem_${dirTag}_$deadPid",    // stale → reclaimed
      s"graft_bkt_orders_${dirTag}_$myPid",        // ours → kept
      s"graft_bkt_orders_${dirTag}_1",             // alive pid → kept
      s"graft_bkt_orders_ffffffffffff_$deadPid",   // other data dir → kept
      "unrelated_table")                           // not ours → kept
    dirs.foreach(n => fs.mkdirs(new Path(whPath, n)))
    Relational.reclaimStaleBuckets(fs, whPath, dirTag)
    val left = fs.listStatus(whPath).map(_.getPath.getName).toSet
    assert(!left.contains(dirs(0)) && !left.contains(dirs(1)),
      s"dead-pid dirs not reclaimed: $left")
    assert(left == dirs.drop(2).toSet, s"sweep touched a dir it must not: $left")
    fs.delete(whPath, true)
  }
}
