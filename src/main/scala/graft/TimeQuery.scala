package graft

/** Ad-hoc single-query timer: `runMain graft.TimeQuery <sfDir> <name>...`
  * runs each named SparkEntry query 3× via a noop-sink write to
  * materialize, like Bench (count() lets Catalyst prune the very columns
  * being benchmarked — it misread t27 by 28×) and prints min/all
  * seconds — the per-operator feedback loop for optimization work
  * without paying a full Bench sweep. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <queryName>...")
    val sfDir = args(0)
    val spark = GraftSession.builder("graft-timequery", "32").getOrCreate()
    // codegen canary (r13 verdict #6, same as Sweep): a generated stage
    // that fails to compile must throw here, not silently interpret —
    // a timing of an interpreted stage is a lie about the plan
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      args.drop(1).foreach { name =>
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query: $name"))
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          // noop sink like Bench: count() lets Catalyst PRUNE the very
          // columns being benchmarked (it misread t27 by 28×)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"TIME $name min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    } finally spark.stop()
  }
}
