package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, SparkEntry}

/** The q19 (lag composition) vs q47 (native session_window) pairing:
  * same 30-minute-gap sessionization, same boundary contract. A
  * plausible reading of session_window — half-open [start, start+gap),
  * so an event at exactly prev+gap starts fresh — is WRONG: the
  * constructed test below shows the native operator merges the
  * exactly-gap event, i.e. both operators implement `> gap starts new`.
  * That makes q47 a true twin of q19 (one contract, two operators), and
  * this spec is what pins the boundary so a Spark-version behavior
  * change fails loudly here instead of silently skewing sessions.
  */
class SessionContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("session-contract", "4").getOrCreate()
  val sfDir = "/root/testdata/sf0.001"

  test("q47 native sessions equal q19 composed sessions row-for-row") {
    val composed = SparkEntry.queries("q19_sessionization")(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = SparkEntry.queries("q47_session_native")(spark, sfDir)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native.nonEmpty)
    assert(native === composed)
  }

  test("both operators keep an exactly-gap event in-session (constructed)") {
    import spark.implicits._
    val gapUs = 1800000000L
    // e2 exactly one gap after e1 (merges), e3 one gap + 1µs after e2
    // (splits) — the two boundary cases a µs off from each other
    val df = Seq((1L, 0L), (2L, gapUs), (3L, 2 * gapUs + 1))
      .toDF("event_id", "us")
      .withColumn("user_id", lit(7L))
      .withColumn("ts", timestamp_micros(col("us")))

    val nativeSessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(nativeSessions === Seq(1L, 2L)) // exactly-gap merges; +1µs splits

    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val composedSessions = df
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1)
          .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_idx", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_idx")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(2)).sorted.toSeq
    assert(composedSessions === nativeSessions) // one contract, two operators
  }

  test("property: random worlds — native sessions equal a by-hand gap fold") {
    import spark.implicits._
    val gapUs = 100000000L // 100 s gap
    (0 until 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919 + 3)
      // coarse 20 s grid: inter-event gaps hit EXACTLY the 100 s gap
      // often, so the boundary contract is exercised, not dodged
      val events = (0 until 200).map(i =>
        (i.toLong, 1L + rnd.nextInt(5), rnd.nextInt(40) * 20000000L))

      val native = events.toDF("event_id", "user_id", "us")
        .withColumn("ts", timestamp_micros(col("us")))
        .groupBy(col("user_id"), session_window(col("ts"), "100 seconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq

      // independent reference: per-user sorted fold, > gap starts new
      val want = events.groupBy(_._2).toSeq.flatMap { case (u, es) =>
        val ts = es.map(_._3).sorted
        val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        ts.foreach { t =>
          if (sessions.nonEmpty && t - sessions.last._2 <= gapUs)
            sessions(sessions.length - 1) = (sessions.last._1, t)
          else sessions += ((t, t))
        }
        // recount events per [start, last] span
        sessions.map { case (s0, s1) =>
          (u, s0, ts.count(t => t >= s0 && t <= s1).toLong)
        }
      }.sorted
      assert(native === want, s"seed $seed")
    }
  }
}
