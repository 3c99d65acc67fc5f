package graft
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("plans")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume", "q16_order_count_distribution", "d03_minhash_lsh_pairs")) {
      println(s"===== $name =====")
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      // summarize: shuffles, broadcasts, scans with pushed filters
      plan.split("\n").filter(l => l.contains("Exchange") || l.contains("Broadcast") ||
        l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("WholeStageCodegen"))
        .take(20).foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
