package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions install path: a session built with ONLY the
  * extensions conf (no programmatic register call) must expose the
  * native functions in SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("functions resolve in a session configured via spark.sql.extensions") {
    // extensions only apply to a NEWLY built session: retire any shared
    // suite session first (suites run sequentially under Test/fork, and
    // later suites rebuild through GraftSession.getOrCreate)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, " +
          "poly_hash('ab') p, poly_hash_min('abcdefgh', 8) m").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getLong(1) === (97L * 31 + 98) % 1000000007L)
      assert(!r.isNullAt(2))
    } finally spark.stop()
  }
}
