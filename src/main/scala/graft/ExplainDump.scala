package graft

/** Plan-evidence dumper for the optimization rounds:
  * `runMain graft.ExplainDump <sfDir> <outDir> [query...]` writes each
  * named SparkEntry query's `.explain("formatted")` output to
  * `<outDir>/<query>.txt` (all queries when none are named). The judge
  * reads these committed files (plans/r14/...) to check plan-shape
  * claims (Exchange count, join strategy, PushedFilters/ReadSchema)
  * without running Spark.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <sfDir> <outDir> [query...]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.get("graft-explain")
    try {
      val names =
        if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
      names.foreach { name =>
        val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
        // queryExecution.explainString is the same text explain() prints
        val txt = fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
        System.err.println(s"EXPLAIN $name -> $outDir/$name.txt")
      }
    } finally spark.stop()
  }
}
