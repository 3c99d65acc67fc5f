package graft

import org.apache.spark.sql.functions._

/** Phase-level decomposition of q50_basket_pairs (r15 diagnosis): the
  * bench times one figure; this names the dominant operator. Times
  * (a) the basket build (collect_set per order, through its exchange),
  * (b) basket build + pair generation (adds the valuePairs Generate),
  * (c) the full query (adds the (pk1,pk2) aggregate + sort).
  * Usage: runMain graft.Q50Probe [sfDir] [reps]
  */
object Q50Probe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get("graft-q50-probe")
    graft.functions.GraftFunctions.register(spark)
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val baskets = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val pairs = baskets
      .select(graft.functions.GraftFunctions.valuePairs(col("ps"))
        .as(Seq("pk1", "pk2")))
    // variant: explicit repartition on the pair key BEFORE the count —
    // the partial aggregate over ~unique pair keys builds a map-side
    // hash table that reduces almost nothing; satisfying the
    // distribution up front plans ONE complete aggregate instead
    val variant = pairs.repartition(col("pk1"), col("pk2"))
      .groupBy(col("pk1"), col("pk2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("pk1"), col("pk2"))
    (1 to reps).foreach { i =>
      val a = t { mat(baskets) }
      val b = t { mat(pairs) }
      val c = t { mat(SparkEntry.queries("q50_basket_pairs")(spark, d)) }
      val e = t { mat(variant) }
      System.err.println(
        f"q50 probe rep $i: baskets $a%.2f s, +pairs $b%.2f s, full $c%.2f s, norepart-partial-skip $e%.2f s")
    }
    spark.stop()
  }
}
