package graft

/** Phase-level decomposition of the clusterLabels consumers (r15
  * diagnosis for d24/d28, the two largest analytics bench cells):
  * times (a) the verified candidate-pair pipeline, (b) the transitive
  * closure (edge distinct + two doubling self-joins + min label), and
  * (c)/(d) the full d24/d28 cells.
  * Usage: runMain graft.D24Probe [sfDir] [reps]
  */
object D24Probe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get("graft-d24-probe")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm the shared signature/gram stores once, like Bench does
    mat(SparkEntry.queries("d03_minhash_lsh_pairs")(spark, d))
    (1 to reps).foreach { i =>
      val a = t { mat(graft.operators.DedupOps.probeCandidatePairs(spark, d)) }
      val b = t { mat(graft.operators.DedupOps.probeClusterLabels(spark, d)) }
      val c = t { mat(SparkEntry.queries("d24_soft_dedup_weights")(spark, d)) }
      val e = t { mat(SparkEntry.queries("d28_cluster_keeper")(spark, d)) }
      System.err.println(
        f"d24 probe rep $i: pairs $a%.2f s, labels $b%.2f s, d24 $c%.2f s, d28 $e%.2f s")
    }
    spark.stop()
  }
}
