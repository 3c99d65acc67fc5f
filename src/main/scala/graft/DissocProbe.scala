package graft

/** Dissoc channel decomposition probe (the r12 "decomposition" method):
  * times each stage of the single-pair loop in isolation — raw meta
  * channel drain, raw body channel drain, reassemble-to-null, and the
  * full spark.read — so a regression names its stage. Dev tool, not a
  * gate stage. Usage: runMain graft.DissocProbe [rows] */
object DissocProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.get("graft-dissoc-probe")
    val server = new graft.server.ArrowHttpServer(spark)
    server.register("dprobe", graft.datagen.Generators.flightBench(spark, rows))
    server.start()
    try {
      val base = server.baseUrl
      // warm spill
      spark.read.format("arrows").option("dissoc", s"$base/dissoc/info/dprobe")
        .option("dissocfanout", "false").load().count()

      def drain(url: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val in = java.net.URI.create(url).toURL.openStream()
        val buf = new Array[Byte](1 << 16)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) { total += n; n = in.read(buf) }
        in.close()
        ((System.nanoTime() - t0) / 1e9, total)
      }
      (1 to 3).foreach { i =>
        val (ms, mb) = drain(s"$base/dissoc/meta/dprobe")
        System.err.println(f"probe meta  rep $i: $ms%.3f s, $mb bytes")
      }
      (1 to 3).foreach { i =>
        val (bs, bb) = drain(s"$base/dissoc/data/dprobe")
        System.err.println(f"probe body  rep $i: $bs%.3f s, $bb bytes")
      }
      // both channels concurrently + reassemble into a null sink
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val in = graft.sources.ArrowsTableProvider
          .openDissoc(s"$base/dissoc/info/dprobe")
        val buf = new Array[Byte](1 << 16)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) { total += n; n = in.read(buf) }
        in.close()
        System.err.println(
          f"probe reasm rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $total bytes")
      }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = spark.read.format("arrows")
          .option("dissoc", s"$base/dissoc/info/dprobe")
          .option("dissocfanout", "false").load().count()
        require(n == rows)
        System.err.println(
          f"probe spark rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } finally { server.stop(); spark.stop() }
  }
}
