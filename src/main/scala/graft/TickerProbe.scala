package graft

/** Phase-level decomposition of the ticker compressed loop (r15
  * optimization diagnosis): the benched cell is one serial
  * serve(zstd+dict) → decode figure, which cannot name the dominant
  * phase. Times, per rep: (a) identity serve drained raw (query exec +
  * dict encode + socket), (b) zstd serve drained raw (adds compression),
  * (c) zstd serve + zstd decode drained (adds client decompress),
  * (d) the full benched loop (adds Arrow decode).
  * Usage: runMain graft.TickerProbe [rows] [reps]
  */
object TickerProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(42000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.get("graft-ticker-probe")
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val server = new graft.server.ArrowHttpServer(spark)
    server.registerDict("ticker",
      graft.datagen.Generators.ticker(spark, rows), Seq("ticker"))
    server.start()
    def open(accept: String): java.io.InputStream = {
      val conn = java.net.URI.create(s"${server.baseUrl}/q/ticker").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(30000); conn.setReadTimeout(180000)
      conn.setRequestProperty("Connection", "close")
      if (accept.nonEmpty) conn.setRequestProperty("Accept-Encoding", accept)
      conn.getInputStream
    }
    def drain(in: java.io.InputStream): Long = {
      val buf = new Array[Byte](1 << 16)
      var total = 0L
      val t0 = System.nanoTime()
      var lastReport = t0
      var n = in.read(buf)
      while (n != -1) {
        total += n
        val now = System.nanoTime()
        if (now - lastReport > 2e9.toLong) {
          System.err.println(f"    drain progress: $total B at ${(now - t0) / 1e9}%.1f s")
          lastReport = now
        }
        n = in.read(buf)
      }
      in.close(); total
    }
    try (1 to reps).foreach { i =>
      var rawBytes = 0L; var zBytes = 0L
      val a = t { rawBytes = drain(open("")) }
      val b = t { zBytes = drain(open("zstd")) }
      val c = t { drain(new com.github.luben.zstd.ZstdInputStream(
        new java.io.BufferedInputStream(open("zstd"), 1 << 16))) }
      val d = t {
        val in = new com.github.luben.zstd.ZstdInputStream(
          new java.io.BufferedInputStream(open("zstd"), 1 << 16))
        val alloc = graft.arrow.ArrowBridge.newAllocator("ticker-probe")
        val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
        var n = 0L
        while (reader.loadNextBatch()) n += reader.getVectorSchemaRoot.getRowCount
        reader.close(); alloc.close()
        require(n == rows, s"read $n rows")
      }
      System.err.println(f"ticker probe rep $i: identity_drain $a%.2f s " +
        f"($rawBytes B), zstd_drain $b%.2f s ($zBytes B), " +
        f"zstd_decode_drain $c%.2f s, full_loop $d%.2f s")
    } finally { server.stop(); spark.stop() }
  }
}
