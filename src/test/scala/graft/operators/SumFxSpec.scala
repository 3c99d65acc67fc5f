package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** r15 (r14 verdict #1): the fixed-point money sums must be exact far
  * past the point where a single long sum wraps 2^63 — the sf ≤ 1
  * oracle gates can never exercise that, so this spec feeds synthetic
  * groups whose TRUE sum exceeds 2^63 through [[Relational.sumFx]] and
  * checks the exact value against a DECIMAL ground truth computed over
  * the same rows. Also pins the signed-input identity q70's profit sum
  * relies on (arithmetic shift + mask recombine exactly for negative
  * longs too).
  */
class SumFxSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("sumfx-spec", "4").getOrCreate()

  private def truth(rows: Seq[Long]): BigDecimal =
    rows.map(BigDecimal(_)).sum

  private def cascade(rows: Seq[Long]): BigDecimal = {
    import spark.implicits._
    val df = rows.toDF("x")
    val out = df.agg(Relational.sumFx(col("x")).as("s")).head()
    BigDecimal(out.getDecimal(0))
  }

  test("group summing past 2^63 recombines to the exact value") {
    // 10 rows of 4.5e18: true sum 4.5e19 ≈ 4.9 × 2^63 — a plain
    // sum(long) wraps several times over
    val rows = Seq.fill(10)(4500000000000000000L)
    assert(truth(rows) > BigDecimal(Long.MaxValue))
    assert(cascade(rows) === truth(rows))
    // and the 2^63 cliff is REAL: under ANSI (the session default) the
    // single-buffer long sum THROWS at this magnitude — i.e. without
    // the cascade these queries would fail outright at scale (and wrap
    // silently with ANSI off)
    import spark.implicits._
    val e = intercept[Exception] {
      rows.toDF("x").agg(sum(col("x"))).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ARITHMETIC_OVERFLOW")))
  }

  test("signed inputs (q70 profit shape) recombine exactly") {
    val rows = Seq(-4500000000000000000L, -37L, 0L, 11L,
      4500000000000000000L, 123456789012345L, -98765432109876L)
    assert(cascade(rows) === truth(rows))
    // heavily negative group, |sum| > 2^63
    val neg = Seq.fill(7)(-3000000000000000000L) :+ 17L
    assert(truth(neg) < BigDecimal(Long.MinValue))
    assert(cascade(neg) === truth(neg))
  }

  test("matches the q01 charge-unit magnitudes at simulated 100 TB group sizes") {
    // 1e-6-unit charge rows are ≤ ~1.1e11; 1e6 rows of it model the
    // per-group magnitude headroom (the full sf 1e5 row count is not
    // runnable in a unit test — the point is exactness past 2^63 via
    // mixed magnitudes, covered above; this pins the realistic unit)
    val rows = Seq.fill(1000)(109999999999L) ++ Seq.fill(1000)(1L)
    assert(cascade(rows) === truth(rows))
  }
}
