package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scale study for the as-of join twins (verdict r3 ask #3): q21 (the
  * union + per-user window composition) vs q31 (the native
  * [[graft.plans.AsOfJoin]] merge operator) at growing event counts and
  * key densities, with PEAK EXECUTION MEMORY and shuffle spill measured
  * per query via a task-metrics listener — the native operator's claim
  * is O(1) merge state per partition vs the window's per-key frame
  * buffer, so memory is the honest axis alongside wall time.
  *
  * Grids both axes the claim depends on:
  *   - rows: does the crossover appear as the sort dominates?
  *   - users (key density): a HOT-KEY shape (few users, ~500k
  *     events/user) is where WindowExec's per-partition row buffer
  *     widens and the merge's O(1) state should separate.
  *
  * Usage: runMain graft.AsofScaleBench [rows:users ...]
  *   default grid: 1000000:15000 10000000:150000 10000000:20
  * Prints one JSON line per cell on stdout:
  *   {"rows":N,"users":U,"q21":{"sec":S,"peak_mem":B,"spill":B},
  *    "q31":{...},"rows_out_equal":true}
  */
object AsofScaleBench {

  /** Max per-task peak execution memory + total bytes spilled observed
    * between reset() and read — the two signals that distinguish a
    * buffering operator from a streaming one. */
  private final class MemListener extends SparkListener {
    @volatile var peak = 0L
    @volatile var spilled = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) synchronized {
        peak = math.max(peak, m.peakExecutionMemory)
        spilled += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }
    def reset(): Unit = synchronized { peak = 0L; spilled = 0L }
  }

  def main(args: Array[String]): Unit = {
    val grid: Seq[(Long, Long)] =
      (if (args.nonEmpty) args.toSeq
       else Seq("1000000:15000", "10000000:150000", "10000000:20"))
        .map { s => val Array(r, u) = s.split(":"); (r.toLong, u.toLong) }

    val spark = GraftSession.get("graft-asof-scale")
    val listener = new MemListener
    spark.sparkContext.addSparkListener(listener)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    grid.foreach { case (rows, users) =>
      val dir = s"/root/repo/data/asof-scale/r${rows}_u$users"
      val eventsPath = s"$dir/events.parquet"
      // _SUCCESS, not the dir: a partial write must regenerate
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$eventsPath/_SUCCESS")))
        graft.datagen.SfGen.events(spark, rows, users, 32)
          .write.mode("overwrite").parquet(eventsPath)

      // noop sink, NOT count(): count() lets Catalyst prune every column
      // it doesn't need, which deletes q21's whole window operator (the
      // thing under test) while q31's opaque custom join survives — the
      // comparison is only fair if both sides compute full-width output.
      def mat(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()

      def run(name: String): (Double, Long, Long, Long) = {
        val fn = SparkEntry.queries(name)
        mat(fn(spark, dir)) // warm: codegen + footer caches, untimed
        val n = fn(spark, dir).count() // row count for the equality probe
        // drain BEFORE reset too: task-end events from the warm-up and
        // count() jobs above are delivered asynchronously and would
        // otherwise be attributed to the timed run (spill especially —
        // it accumulates)
        org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark)
        listener.reset()
        val sec = timed { mat(fn(spark, dir)) }
        // listener events land asynchronously; drain before reading
        org.apache.spark.sql.GraftSqlBridge.drainListenerBus(spark)
        (sec, listener.peak, listener.spilled, n)
      }

      val (s21, p21, sp21, n21) = run("q21_asof_join")
      val (s31, p31, sp31, n31) = run("q31_asof_native")
      def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
      println(
        s"""{"rows":$rows,"users":$users,""" +
        s""""q21":{"sec":${ms(s21)},"peak_mem":$p21,"spill":$sp21},""" +
        s""""q31":{"sec":${ms(s31)},"peak_mem":$p31,"spill":$sp31},""" +
        s""""rows_out_equal":${n21 == n31}}""")
    }
    spark.stop()
  }
}
