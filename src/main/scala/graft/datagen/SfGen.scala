package graft.datagen

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-factor data generator for the TPC-H-ish star schema the driver
  * ships at sf{0.001,0.01,0.1} — schema-identical and domain-matched
  * (measured off /root/testdata/sf0.1: same column names/types, value
  * ranges, category sets, lines-per-order ≈ Poisson(4), exponential
  * event values, unit-normalized label-clustered embeddings, small-vocab
  * documents with rare exact duplicates). The driver's own data is
  * read-only and tops out at sf0.1; this exists to SCALE-PROOF the
  * engine at sf1+ (verdict r3 ask #2) — correctness there is still
  * Spark-vs-DuckDB on identical inputs, so distributional fidelity only
  * needs to preserve query selectivities, not byte-match the driver.
  *
  * Deterministic, partition-parallel, scale-invariant: every value is a
  * pure function of (table seed, row id) via xxhash64 — the same
  * per-task lazy-generation design as [[Generators]] (SURVEY §3.1) —
  * so generating sf1 (~6M lineitem) or sf100 differs only in `range()`
  * bounds, never in a driver-side loop.
  *
  * Usage: runMain graft.datagen.SfGen <outDir> <scale>
  *   e.g.  runMain graft.datagen.SfGen /tmp/graft-sf1 1.0
  * Writes one single-file <table>.parquet per table (the same layout
  * the driver uses, so Tables + tools/check_oracle.py work unchanged).
  */
object SfGen {

  private def h(seed: Int, extra: Int = 0) =
    xxhash64(col("id"), lit(seed), lit(extra))
  private def ub(seed: Int, bound: Long) = pmod(h(seed), lit(bound))
  /** Uniform double in [0,1) with enough resolution for 2dp money. */
  private def u01(seed: Int) = (ub(seed, 100000000L).cast("double") + 0.5) / 1e8
  /** Money-style double with exactly 2 decimals in [lo, hi]. */
  private def money(seed: Int, lo: Double, hi: Double) =
    round((ub(seed, ((hi - lo) * 100).toLong + 1).cast("double") + lit(lo * 100)) / 100.0, 2)

  private val vocab = Array(
    "the", "query", "row", "stream", "batch", "data", "line", "small", "group",
    "sort", "value", "hash", "filter", "big", "spark", "fast", "customer",
    "column", "order", "a", "vector", "part", "scan", "slow", "agg", "key",
    "window", "table", "merge", "join")

  def region(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
  }

  def nation(s: SparkSession): DataFrame =
    s.range(0, 25, 1, 1).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey"))

  def customer(s: SparkSession, n: Long, parts: Int): DataFrame =
    s.range(0, n, 1, parts).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      ub(1, 25).cast("int").as("c_nationkey"),
      money(2, -999.99, 9999.99).as("c_acctbal"),
      element_at(lit(Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")), (ub(3, 5) + 1).cast("int")).as("c_mktsegment"))

  def supplier(s: SparkSession, n: Long, parts: Int): DataFrame =
    s.range(0, n, 1, parts).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      ub(4, 25).cast("int").as("s_nationkey"),
      money(5, -999.99, 9999.99).as("s_acctbal"))

  def part(s: SparkSession, n: Long, parts: Int): DataFrame =
    s.range(0, n, 1, parts).select(
      col("id").as("p_partkey"),
      concat(
        element_at(lit(Array("large", "hot", "blue", "dark", "light", "red",
          "green", "small", "cold", "plain")), (ub(6, 10) + 1).cast("int")),
        lit(" "),
        element_at(lit(Array("ring", "bolt", "screw", "washer", "gear", "rod",
          "plate", "wheel")), (ub(7, 8) + 1).cast("int"))).as("p_name"),
      concat(lit("Brand#"), (ub(8, 25) + 1)).as("p_brand"),
      element_at(lit(Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD")), (ub(9, 6) + 1).cast("int")).as("p_type"),
      (ub(10, 50) + 1).cast("int").as("p_size"),
      // 900.0..999.9, one decimal — the observed retail band
      round(lit(900.0) + ub(11, 1000).cast("double") / 10.0, 1).as("p_retailprice"))

  def orders(s: SparkSession, n: Long, nCust: Long, parts: Int): DataFrame =
    s.range(0, n, 1, parts).select(
      col("id").as("o_orderkey"),
      ub(12, nCust).as("o_custkey"),
      // observed mix is roughly half F / half O with a thin P band
      when(ub(13, 100) < 48, "F").when(ub(13, 100) < 96, "O").otherwise("P")
        .as("o_orderstatus"),
      money(14, 1000.0, 500000.0).as("o_totalprice"),
      // uniform over 1995-01-01 .. 2001-08-01 (2404 days), midnight stamps
      // — NTZ, matching the driver's naive timestamp[ms] parquet type
      date_add(lit(java.sql.Date.valueOf("1995-01-01")), ub(15, 2405).cast("int"))
        .cast("timestamp_ntz").as("o_orderdate"),
      element_at(lit(Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")), (ub(16, 5) + 1).cast("int")).as("o_orderpriority"))

  /** 4 lineitems/order on average: N draws of a uniform orderkey give a
    * Poisson(4) per-order line count at N = 4×orders, matching the
    * measured distribution (shipdate is independent of orderdate in the
    * driver's data — gaps of ±2400 days observed — so no join needed). */
  def lineitem(s: SparkSession, n: Long, nOrders: Long, nPart: Long, nSupp: Long,
      parts: Int): DataFrame =
    s.range(0, n, 1, parts).select(
      ub(17, nOrders).as("l_orderkey"),
      ub(18, nPart).as("l_partkey"),
      ub(19, nSupp).as("l_suppkey"),
      (ub(20, 7) + 1).cast("int").as("l_linenumber"),
      (ub(21, 50) + 1).cast("double").as("l_quantity"),
      money(22, 900.0, 105000.0).as("l_extendedprice"),
      (ub(23, 11).cast("double") / 100.0).as("l_discount"),
      (ub(24, 9).cast("double") / 100.0).as("l_tax"),
      element_at(lit(Array("A", "N", "R")), (ub(25, 3) + 1).cast("int"))
        .as("l_returnflag"),
      element_at(lit(Array("F", "O")), (ub(26, 2) + 1).cast("int"))
        .as("l_linestatus"),
      date_add(lit(java.sql.Date.valueOf("1995-01-02")), ub(27, 2499).cast("int"))
        .cast("timestamp_ntz").as("l_shipdate"))

  /** Events over one month (2024-01), values Exp(mean 50) rounded to 2dp
    * — the measured quantiles (14.7/34.7/69/114 at p25/50/75/90) are the
    * exponential's. */
  def events(s: SparkSession, n: Long, nUsers: Long, parts: Int): DataFrame =
    s.range(0, n, 1, parts).select(
      col("id").as("event_id"),
      // driver's current parquet encodes ts as µs isAdjustedToUTC=false
      // (TIMESTAMP_NTZ); match it so SfGen output is drop-in
      timestamp_micros(lit(1704067200000000L) + ub(28, 30L * 86400 * 1000000))
        .cast("timestamp_ntz").as("ts"),
      ub(29, nUsers).as("user_id"),
      element_at(lit(Array("click", "error", "purchase", "signup", "view")),
        (ub(30, 5) + 1).cast("int")).as("event_type"),
      round(-lit(50.0) * log(u01(31)), 2).as("value"),
      concat(lit("{\"k\": "), ub(32, 100), lit("}")).as("props"))

  /** Small-vocab word-salad documents, 10..100 words; ~1-in-600 rows
    * duplicate an earlier doc's text exactly (8 exact dups observed in
    * 5000 driver docs) — dup rows re-derive the text from seedId, so no
    * self-join is needed and the recipe stays O(row). */
  def documents(s: SparkSession, n: Long, parts: Int): DataFrame = {
    val seedId = when(ub(33, 600) === 0 && col("id") >= 7, col("id") - 7)
      .otherwise(col("id"))
    val words = transform(sequence(lit(1), (pmod(xxhash64(seedId, lit(34)), lit(91)) + 10)),
      i => element_at(lit(vocab),
        (pmod(xxhash64(seedId, lit(35), i), lit(30)) + 1).cast("int")))
    s.range(0, n, 1, parts).select(
      col("id").as("doc_id"),
      array_join(words, " ").as("text"),
      // en-heavy mix as observed: ~41% en, the rest ≈ even
      when(ub(36, 100) < 41, "en").when(ub(36, 100) < 56, "de")
        .when(ub(36, 100) < 71, "es").when(ub(36, 100) < 86, "fr")
        .otherwise("zh").as("lang"),
      concat(lit("src"), ub(37, 20)).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** 64-dim unit-normalized embeddings, iid random directions with a
    * UNIFORM label in 0..9. Measured off the driver's sf0.1 data: the
    * same-label and cross-label cosine distributions are identical
    * (pass(cos>=0.30) = 0.73% vs 0.75% — the N(0, 1/64) tail of random
    * unit vectors), i.e. label is a plain partition key, NOT a cluster
    * id. An earlier draft clustered per label; that inflated d06's
    * same-label pass rate from 0.7% to ~100% and its sf1 output from
    * ~150k to 20M pairs — selectivity fidelity is the whole point of
    * this generator, so the distribution is pinned by SfGenSpec. */
  def embeddings(s: SparkSession, n: Long, parts: Int): DataFrame = {
    val label = ub(38, 10).cast("int")
    // component j: iid uniform in [-1,1]; normalized below (CLT makes
    // the cosine of two such vectors ~ N(0, 1/64), matching measurement)
    val raw = transform(sequence(lit(0), lit(63)), j =>
      (pmod(xxhash64(col("id"), j, lit(40)), lit(2001)).cast("double") - 1000) / 1000.0)
    s.range(0, n, 1, parts)
      .withColumn("label", label)
      .withColumn("raw", raw)
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0d), (a, x) => a + x * x)))
      .select(
        col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("norm")).cast("float")).as("embedding"),
        col("label"))
  }

  /** Write df as a SINGLE parquet file at outDir/name.parquet — the
    * driver's layout, which both Tables and DuckDB's oracle read. The
    * compute stays partition-parallel; only the write funnels through
    * one task (fine at sf1; a real multi-file layout would just drop
    * the rename). */
  private def writeOne(df: DataFrame, outDir: java.nio.file.Path, name: String): Unit = {
    val tmp = outDir.resolve(s"_tmp_$name")
    df.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst.orElseThrow()
    java.nio.file.Files.move(part, outDir.resolve(s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part files, _SUCCESS, crc markers)
    java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    ()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SfGen <outDir> <scale>")
    val out = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(out)
    val scale = args(1).toDouble
    def n(base: Long): Long = math.max(1L, (base * scale).toLong)
    val parts = 32

    val spark = graft.GraftSession.get("graft-sfgen")
    val nCust = n(150000 * 10) // bases are sf1 counts = 10× the sf0.1 files
    val nSupp = n(1000 * 10)
    val nPart = n(20000 * 10)
    val nOrd = n(150000 * 10)
    val nLine = nOrd * 4
    val nEvt = n(100000 * 10)
    val nUsers = n(1500 * 10)
    val nDoc = n(5000 * 10)
    val nEmb = n(2000 * 10)

    writeOne(region(spark), out, "region")
    writeOne(nation(spark), out, "nation")
    writeOne(customer(spark, nCust, parts), out, "customer")
    writeOne(supplier(spark, nSupp, parts), out, "supplier")
    writeOne(part(spark, nPart, parts), out, "part")
    writeOne(orders(spark, nOrd, nCust, parts), out, "orders")
    writeOne(lineitem(spark, nLine, nOrd, nPart, nSupp, parts), out, "lineitem")
    writeOne(events(spark, nEvt, nUsers, parts), out, "events")
    writeOne(documents(spark, nDoc, parts), out, "documents")
    writeOne(embeddings(spark, nEmb, parts), out, "embeddings")
    println(s"wrote scale=$scale to $out (lineitem=$nLine, events=$nEvt, docs=$nDoc)")
    spark.stop()
  }
}
