package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale study for the interval-join triplet: the NAIVE theta join
  * (BroadcastNestedLoopJoin — O(points × windows) comparisons), the
  * declarative BIN-TRICK equi-join (q38's shape), and the NATIVE
  * [[graft.plans.IntervalJoin]] broadcast sweep (q46) at growing point
  * counts and window counts. The native operator's claim is O(log W + k)
  * per point with the point side unshuffled; the bin trick pays the
  * window explode + the pad-slop filter; the naive plan pays the full
  * cross product. All three must agree on output cardinality.
  *
  * Usage: runMain graft.IntervalScaleBench [rows:windows ...]
  *   default grid: 1000000:100 10000000:1000 10000000:10000
  * The naive cell is skipped (sec = -1) when rows × windows > 2e9 —
  * past that it is minutes-to-hours by construction, which is the point.
  * Prints one JSON line per cell:
  *   {"rows":N,"windows":W,"naive":{"sec":S},"bins":{"sec":S},
  *    "native":{"sec":S},"rows_out_equal":true}
  */
object IntervalScaleBench {

  def main(args: Array[String]): Unit = {
    val grid: Seq[(Long, Long)] =
      (if (args.nonEmpty) args.toSeq
       else Seq("1000000:100", "10000000:1000", "10000000:10000"))
        .map { s => val Array(r, w) = s.split(":"); (r.toLong, w.toLong) }

    val spark = GraftSession.get("graft-interval-scale")
    import spark.implicits._

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    grid.foreach { case (rows, nWins) =>
      // points spread over 30 days of epoch-micros
      val spanUs = 30L * 86400 * 1000000
      val t0 = 1704067200000000L
      // SfGen emits ts as TIMESTAMP_NTZ (driver-parquet parity); cast to
      // TimestampType under the UTC session tz first (the Tables.events
      // normalization) before unix_micros
      val pts = graft.datagen.SfGen.events(spark, rows, rows / 64 + 1, 32)
        .select(unix_micros(col("ts").cast("timestamp")).as("us"),
          col("user_id"), col("event_type"))
        .persist()
      pts.count() // materialize: generation cost stays out of every cell

      // windows: evenly spaced, ~25% coverage, every 7th doubled in
      // length so lengths vary (exercises the max-length sweep bound);
      // adjacent long windows overlap their successors
      val step = spanUs / nWins
      val baseLen = step / 4
      val wins = spark.range(0, nWins).select(
        col("id").as("win_id"),
        (lit(t0) + col("id") * step).as("lo"),
        (lit(t0) + col("id") * step +
          when(col("id") % 7 === 0, baseLen * 6).otherwise(baseLen)).as("hi"))
        .persist()
      wins.count()

      def rollup(joined: DataFrame, winCol: String): DataFrame =
        joined.groupBy(col(winCol)).agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("u"))

      val naiveDf = rollup(
        pts.join(wins, col("us") >= col("lo") && col("us") < col("hi")), "win_id")

      val binUs = math.max(baseLen, 1L)
      val winBins = wins.select(col("win_id"), col("lo"), col("hi"),
        explode(sequence(expr(s"lo div $binUs"), expr(s"(hi - 1) div $binUs"))).as("bin"))
      val binsDf = rollup(
        pts.withColumn("bin", expr(s"us div $binUs"))
          .join(winBins, Seq("bin"))
          .filter(col("us") >= col("lo") && col("us") < col("hi")), "win_id")

      val nativeDf = rollup(
        graft.plans.IntervalJoin.intervalJoin(pts, wins, "us", "lo", "hi"),
        "w_win_id")

      def run(df: DataFrame): (Double, Long) = {
        mat(df) // warm untimed
        // sum over empty input is NULL — coalesce so a zero-row variant
        // reports 0 instead of NPE-crashing the bench cell (r7 ADVICE)
        val n = df.agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
        (timed(mat(df)), n)
      }

      val runNaive = rows * nWins <= 2000000000L
      val (sN, nN) = if (runNaive) run(naiveDf) else (-1.0, -1L)
      val (sB, nB) = run(binsDf)
      val (sV, nV) = run(nativeDf)
      def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
      val equal = nB == nV && (!runNaive || nN == nB)
      println(
        s"""{"rows":$rows,"windows":$nWins,""" +
        s""""naive":{"sec":${ms(sN)}},"bins":{"sec":${ms(sB)}},""" +
        s""""native":{"sec":${ms(sV)}},"rows_out_equal":$equal}""")
      pts.unpersist(); wins.unpersist()
    }
    spark.stop()
  }
}
