package graft

/** Phase-level decomposition of the get_simple serve+read loop (r14
  * optimization diagnosis): times (a) the spill write, (b) the /qsplit
  * DSv2 read+count, (c) the /offsets probe, separately — LoopBench
  * times them as one figure, which cannot name the regressing phase.
  * Usage: runMain graft.LoopProbe [rows] [reps]
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(100000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.get("graft-loop-probe")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val server = new graft.server.ArrowHttpServer(spark)
      server.register("bench", graft.datagen.Generators.flightBench(spark, rows))
      server.start()
      try {
        // (a) spill: the first /qsplit request triggers ensureSpilled
        val tSpill = t {
          val js = new String(java.net.URI.create(s"${server.baseUrl}/qsplit/bench")
            .toURL.openStream().readAllBytes(), "UTF-8")
          require(js.contains("arrow_stream_files"), "qsplit failed")
        }
        // (b) DSv2 parallel read + count (spill now warm)
        val tRead = t {
          val n = spark.read.format("arrows")
            .option("url", s"${server.baseUrl}/q/bench").load().count()
          require(n == rows, s"read $n rows")
        }
        // (c) offsets probe over every part (server parses each part once)
        val tOff = t {
          val parts = graft.sources.ArrowsTableProvider
            .probeSplits(s"${server.baseUrl}/q/bench")
          val nb = parts.map { u =>
            val oj = new String(java.net.URI.create(u.replace("/files/", "/offsets/"))
              .toURL.openStream().readAllBytes(), "UTF-8")
            "\\[(\\d+),(\\d+)\\]".r.findAllMatchIn(oj).size.toLong
          }.sum
          System.err.println(s"probe: $nb batches")
        }
        // (d) second read, everything warm
        val tRead2 = t {
          val n = spark.read.format("arrows")
            .option("url", s"${server.baseUrl}/q/bench").load().count()
          require(n == rows, s"read $n rows")
        }
        println(f"LOOPPROBE rep $i spill=$tSpill%.2f read=$tRead%.2f offsets=$tOff%.2f read2=$tRead2%.2f")
      } finally server.stop()
    }
    spark.stop()
  }
}
