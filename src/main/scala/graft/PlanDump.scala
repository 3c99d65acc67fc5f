package graft

/** Dev utility: print the executed plan of named queries (comma-separated
  * in arg 0) against a data dir (arg 1, default sf0.001) — the loop used
  * to author PlanSpec guards from real plan shapes instead of guesses. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val d = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-plandump")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
