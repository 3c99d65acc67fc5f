package graft

/** Standalone dissociated-loop bench: the dual-channel serve+read loop
  * in isolation (LoopBench's purpose, for the dissoc path). Usage:
  *   sbt "runMain graft.DissocBench [rows] [reps] [fanout]"
  * Server startup + spill registration happen once OUTSIDE the timed
  * region (Bench's r11 rule); each rep times discovery → concurrent
  * meta/body fetch → bounded reassembly → count through the public
  * spark.read path. The final stdout line is one JSON metric. */
object DissocBench {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val fanout = args.lift(2).exists(_.toBoolean)
    val spark = GraftSession.get("graft-dissoc-bench")
    val server = new graft.server.ArrowHttpServer(spark)
    server.register("dbench", graft.datagen.Generators.flightBench(spark, rows))
    server.start()
    try {
      // warm the spill (rep timings should measure the read path only)
      val warm = spark.read.format("arrows")
        .option("dissoc", s"${server.baseUrl}/dissoc/info/dbench")
        .option("dissocfanout", fanout.toString).load().count()
      require(warm == rows, s"warm read $warm rows, expected $rows")
      val trials = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        // stall watchdog (dev diagnosis): a rep that exceeds 10 s dumps
        // every dissoc/http thread stack once, so an intermittent hang
        // names its parked frame instead of vanishing into a min-of-reps
        val done = new java.util.concurrent.atomic.AtomicBoolean(false)
        val dog = new Thread(() => {
          val slept =
            try { Thread.sleep(10000); true }
            catch { case _: InterruptedException => false }
          if (slept) {
            if (!done.get()) {
              System.err.println(s"== WATCHDOG rep $i stalled >10s; thread dump ==")
              import scala.jdk.CollectionConverters._
              Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
                val n = t.getName
                if (n.contains("dissoc") || n.contains("arrow-http") ||
                    n.contains("HTTP") || n.contains("Keep-Alive") || st.exists(
                      f => f.getClassName.contains("httpserver") ||
                        f.getClassName.contains("HttpURLConnection") ||
                        f.getClassName.contains("Dissociated"))) {
                  System.err.println(s"-- $n (${t.getState})")
                  st.take(12).foreach(f => System.err.println(s"   at $f"))
                }
              }
            }
          }
        }, "dissoc-watchdog")
        dog.setDaemon(true)
        dog.start()
        val n = spark.read.format("arrows")
          .option("dissoc", s"${server.baseUrl}/dissoc/info/dbench")
          .option("dissocfanout", fanout.toString).load().count()
        done.set(true)
        dog.interrupt()
        require(n == rows, s"rep $i read $n rows, expected $rows")
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"dissocbench rep $i: $s%.3f s")
        s
      }
      println(f"""{"metric":"dissoc_loop","rows":$rows,"fanout":$fanout,""" +
        f""""value":${trials.min}%.3f,"unit":"sec"}""")
    } finally { server.stop(); spark.stop() }
  }
}
