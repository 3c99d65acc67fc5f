package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Pins d10's corpus-derived blocking granularity (the scale-safe
  * blocking rule made code): cells = 2^ceil(log2(n / 40)) clamped to
  * [1, 256], computed as an integer threshold ladder so the Spark side
  * and the DuckDB oracle's CASE ladder can never disagree on a float
  * edge. The threshold edges are the contract — a regression here
  * silently changes which candidate pairs d10 scores at a given SF. */
class BlockingCellsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("cells-spec", "4").getOrCreate()

  private def cells(ns: Long*): Seq[(Long, Int)] = {
    import spark.implicits._
    ns.toDF("n")
      .select(col("n"), SimilarityOps.blockCells(col("n")).as("cells"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .toSeq
  }

  test("threshold edges: cells double exactly when n passes 40·2^(k-1)") {
    // at the threshold it stays, one past it doubles
    assert(cells(40, 41) === Seq((40L, 1), (41L, 2)))
    assert(cells(80, 81) === Seq((80L, 2), (81L, 4)))
    assert(cells(5120, 5121) === Seq((5120L, 128), (5121L, 256)))
  }

  test("the driver and sf1 operating points land where the r4 dial was set") {
    // n=500 (sf0.01) must keep the r4 hand-picked 16 cells; sf0.1's
    // 5,000 vectors get 128; anything past 5,120 (sf1's 20k included)
    // saturates all 8 hyperplane sign bits.
    assert(cells(50, 500, 5000, 20000, 10000000) ===
      Seq((50L, 2), (500L, 16), (5000L, 128), (20000L, 256), (10000000L, 256)))
  }

  test("tiny corpora degrade to a single cell (pure label blocking)") {
    assert(cells(0, 1, 39) === Seq((0L, 1), (1L, 1), (39L, 1)))
  }

  test("cells is always a power of two within [1, 256]") {
    val got = cells((0L to 12000L by 37L): _*)
    got.foreach { case (n, c) =>
      assert(c >= 1 && c <= 256 && Integer.bitCount(c) == 1, s"n=$n cells=$c")
      // monotone non-decreasing in n is implied by the ladder; spot-check
    }
    assert(got.sliding(2).forall(p => p.head._2 <= p.last._2))
  }
}
