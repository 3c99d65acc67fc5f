package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftSession, SparkEntry}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("asof-spec", "4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("merge semantics: latest right <= left per key, nulls when unmatched") {
    import spark.implicits._
    val trades = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 15L))
      .toDF("id", "sym", "t")
    val quotes = Seq((100L, "A", 5L), (101L, "A", 12L), (102L, "A", 20L), (103L, "C", 1L))
      .toDF("id", "sym", "t")
    val res = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), Seq("t", "id"), Seq("t", "id"))
      .select("id", "r_id").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // trade 2 at t=20: quote 102 is also t=20 but (20,102) > (20,2)
    // lexicographically, so the match is quote 101 — tie rule honored
    assert(res.toSeq === Seq((1L, 100L), (2L, 101L), (3L, -1L)))
  }

  test("physical plan: AsOfJoinExec with one hash exchange + sort per side") {
    val df = SparkEntry.queries("q31_asof_native")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
    val exchanges = "Exchange hashpartitioning\\(r?_?user_id".r.findAllIn(p).size
    assert(exchanges === 2, s"expected 2 key exchanges, plan:\n$p")
    // filters reached the parquet scan on both sides
    assert("PushedFilters: \\[IsNotNull\\(event_type\\)".r.findAllIn(p).size === 2)
  }

  test("property: random worlds — merge equals a by-hand lexicographic fold") {
    import spark.implicits._
    (0 until 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729 + 7)
      val syms = Seq("A", "B", "C", "D")
      // coarse time grid forces exact-tie cases; ids unique per side
      val trades = (0 until 120).map(i =>
        (i.toLong, syms(rnd.nextInt(syms.length)), rnd.nextInt(30) * 10L))
      val quotes = (0 until 150).map(i =>
        (1000L + i, syms(rnd.nextInt(syms.length)), rnd.nextInt(30) * 10L))

      val got = AsOfJoin.asofJoin(
          trades.toDF("id", "sym", "t"), quotes.toDF("id", "sym", "t"),
          Seq("sym"), Seq("t", "id"), Seq("t", "id"))
        .select("id", "r_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap

      // independent reference: plain Scala fold over the collections
      val bySym = quotes.groupBy(_._2)
      trades.foreach { case (id, sym, t) =>
        val want = bySym.getOrElse(sym, Seq.empty)
          .filter(q => q._3 < t || (q._3 == t && q._1 <= id))
          .sortBy(q => (q._3, q._1)).lastOption.map(_._1).getOrElse(-1L)
        assert(got(id) == want, s"seed $seed trade $id: ${got(id)} != $want")
      }
    }
  }

  test("native operator agrees with the q21 window composition") {
    val native = SparkEntry.queries("q31_asof_native")(spark, sf).collect().toSeq
    val twin = SparkEntry.queries("q21_asof_join")(spark, sf).collect().toSeq
    assert(native.size === twin.size)
    assert(native === twin)
  }
}
