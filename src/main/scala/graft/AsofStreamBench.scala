package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Scale study for the STREAMING as-of join (verdict r5 ask #5): the
  * operator's 100 TB claim is "state ∝ horizon × rate, independent of
  * stream length" — the watermarked time-range join must evict view
  * state older than the horizon no matter how long the stream runs.
  * This sweep measures that claim instead of asserting it: a
  * rate × horizon grid, each cell replaying a fixed event-time span
  * through [[streaming.EventStreams.asofStream]] in micro-batches, then
  * reading the state-store rows and bytes from the final
  * StreamingQueryProgress (the same numbers the state store reports on
  * a real cluster).
  *
  * If eviction works, state rows grow with horizon × rate and stay
  * FLAT as the replayed span grows; if it leaked, state would grow
  * with total events. Cells double the horizon and quadruple the rate
  * so both factors are separable in the artifact.
  *
  * Usage: runMain graft.AsofStreamBench [eventsPerHour:horizonMin[:spanHours] ...]
  *   default grid: 100000:30 100000:120 400000:30 400000:120 100000:30:8
  *   (the last cell DOUBLES the replayed span at fixed rate × horizon:
  *   state must stay flat while n_events doubles, or eviction leaks)
  * Prints one JSON line per cell:
  *   {"events_per_hour":N,"horizon_min":M,"span_hours":H,"n_events":K,
  *    "wall_sec":S,"events_per_sec":T,"state_rows_total":R,
  *    "state_mem_bytes":B,"ops":[{"name":..,"rows":..,"mem":..},..]}
  */
object AsofStreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-asof-stream-bench")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val grid: Seq[(Long, Int, Long)] =
      (if (args.nonEmpty) args.toSeq
       else Seq("100000:30", "100000:120", "400000:30", "400000:120", "100000:30:8"))
        .map { s =>
          val p = s.split(":")
          (p(0).toLong, p(1).toInt, if (p.length > 2) p(2).toLong else 4L)
        }

    val users = 5000L
    val chunks = 16 // micro-batches; watermark advances between them

    grid.foreach { case (perHour, horizonMin, spanHours) =>
      val n = perHour * spanHours
      val spanUs = spanHours * 3600L * 1000000L
      val base = 1700000000000000L
      val input = MemoryStream[streaming.EventStreams.Event]
      val ckpt = java.nio.file.Files.createTempDirectory("asof-stream-bench").toString
      val query = streaming.EventStreams
        .asofStream(input.toDF(), s"$horizonMin minutes")
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt)
        .start()
      val t0 = System.nanoTime()
      val per = n / chunks
      (0L until chunks).foreach { c =>
        val events = (c * per until (c + 1) * per).map { i =>
          // every 10th event a purchase: the join probes views 9:1
          val et = if (i % 10 == 9) "purchase" else "view"
          streaming.EventStreams.Event(i, base + i * spanUs / n, i % users, et, 1.0)
        }
        input.addData(events)
        query.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val ops = query.lastProgress.stateOperators
      query.stop()
      def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
      val opsJson = ops.map(o =>
        s"""{"name":"${o.operatorName}","rows":${o.numRowsTotal},"mem":${o.memoryUsedBytes}}""")
        .mkString("[", ",", "]")
      println(
        s"""{"events_per_hour":$perHour,"horizon_min":$horizonMin,"span_hours":$spanHours,"n_events":$n,""" +
        s""""wall_sec":${ms(wall)},"events_per_sec":${(n / wall).toLong},""" +
        s""""state_rows_total":${ops.map(_.numRowsTotal).sum},""" +
        s""""state_mem_bytes":${ops.map(_.memoryUsedBytes).sum},"ops":$opsJson}""")
    }
    spark.stop()
  }
}
