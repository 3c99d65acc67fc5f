package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's flagship smoke surface, guarded locally: `entry` must
  * compute q01 at sf0.001, serve it over the HTTP server as an Arrow
  * IPC stream, read it back through the arrows source, and return a
  * non-empty frame. Nothing else exercises this exact composition, so
  * a regression here would only surface in the driver's round report.
  */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("entry-smoke", "4").getOrCreate()

  test("entry: q01 served and read back via the arrows source, rows > 0") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty, "entry returned an empty frame")
    // q01's shape: one row per (returnflag, linestatus) group
    assert(df.columns.contains("l_returnflag"), df.columns.mkString(","))
    assert(rows.length >= 4, s"unexpectedly few q01 groups: ${rows.length}")
  }
}
