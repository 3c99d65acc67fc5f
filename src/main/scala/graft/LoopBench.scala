package graft

/** Standalone transport-loop bench: the get_simple serve+read loop in
  * isolation, without the query battery's cached stores resident in the
  * same JVM. Usage:
  *   sbt "runMain graft.LoopBench [rows] [reps]"
  * Prints one line per rep and a min summary to stderr; the final stdout
  * line is {"metric":"arrows_http_loop","rows":N,"value":minSec}.
  * Exists because a degraded loop cell in the full Bench artifact has two
  * candidate causes — box noise vs interference from the query battery's
  * session state — and only an isolated rerun separates them (r7: the
  * full-bench 100M cell read 14.5-25 s while this isolated loop read the
  * r5/r6-parity figure on the same box minutes later).
  */
object LoopBench {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(100000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get("graft-loop-bench")

    def loop(): (Double, Long) = {
      var batches = 0L
      val t0 = System.nanoTime()
      val server = new graft.server.ArrowHttpServer(spark)
      server.register("bench", graft.datagen.Generators.flightBench(spark, rows))
      server.start()
      try {
        val df = spark.read.format("arrows")
          .option("url", s"${server.baseUrl}/q/bench").load()
        val n = df.count()
        require(n == rows, s"loop read $n rows, expected $rows")
        val parts = graft.sources.ArrowsTableProvider
          .probeSplits(s"${server.baseUrl}/q/bench")
        batches = parts.map { u =>
          val oc = java.net.URI.create(u.replace("/files/", "/offsets/"))
            .toURL.openConnection()
          oc.setConnectTimeout(30000); oc.setReadTimeout(180000)
          val oj = new String(oc.getInputStream.readAllBytes(), "UTF-8")
          "\\[(\\d+),(\\d+)\\]".r.findAllMatchIn(oj).size.toLong
        }.sum
      } finally server.stop()
      ((System.nanoTime() - t0) / 1e9, batches)
    }

    val trials = (1 to reps).map { i =>
      val (s, b) = loop()
      System.err.println(f"loopbench rep $i: $b batches, $s%.2f s")
      (s, b)
    }
    val best = trials.minBy(_._1)
    System.err.println(
      f"loopbench: ${best._2} record batches received, ${best._1}%.2f seconds elapsed (min of $reps)")
    println(s"""{"metric":"arrows_http_loop","rows":$rows,"value":${f"${best._1}%.3f"}}""")
    spark.stop()
  }
}
