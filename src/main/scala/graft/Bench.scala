package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line with per-query wall seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")

    val names = SparkEntry.benchQueries
    val fns = SparkEntry.queries
    // Warm-up: JVM/codegen/parquet footer caches on the smallest query,
    // so the measured numbers reflect steady-state execution.
    try fns(names.head)(spark, sfDir).count() catch { case _: Throwable => () }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
