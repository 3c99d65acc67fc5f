package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic dataset generators reproducing the reference's
  * workloads as distributed Spark plans (no driver-side materialization,
  * unlike the reference servers which build all batches in RAM at
  * startup — SURVEY §3.1; lazy per-task generation is the sanctioned
  * improvement, SURVEY §4 row 2).
  *
  * - [[flightBench]]: the get_simple payload — N rows × 4 int64 random
  *   columns (http/get_simple/python/server/http.server/server.py:26-36).
  * - [[ticker]]: the get_compressed / get_multipart trading table —
  *   (ticker, price, volume), 60 tickers, price = randint(1,1000)*100,
  *   volume = randint(1,10000)
  *   (http/get_compressed/python/server/server.py:40-93).
  * - [[manyTypes]]: the rand-many-types lattice — 21 columns, one per
  *   Arrow type, seeded (data/rand-many-types/generate.py:138-160).
  *
  * All columns derive from xxhash64(id, seed) — deterministic,
  * partition-parallel, and scale-invariant (works identically for 1e5
  * or 1e11 rows across any executor count).
  */
object Generators {

  /** Uniform long in [0, bound) from a seeded per-row hash. */
  private def h(seed: Int, extra: Int = 0) =
    xxhash64(col("id"), lit(seed), lit(extra))
  private def ub(seed: Int, bound: Long) = pmod(h(seed), lit(bound))

  def flightBench(s: SparkSession, rows: Long, partitions: Int = 32): DataFrame =
    s.range(0, rows, 1, partitions).select(
      h(1).as("a"), h(2).as("b"), h(3).as("c"), h(4).as("d"))

  /** 60 tickers of 3-4 uppercase chars, deterministic. */
  val tickers: Seq[String] = {
    val rng = new scala.util.Random(7)
    val set = scala.collection.mutable.LinkedHashSet[String]()
    while (set.size < 60) {
      val len = 3 + rng.nextInt(2)
      set += (1 to len).map(_ => ('A' + rng.nextInt(26)).toChar).mkString
    }
    set.toSeq
  }

  def ticker(s: SparkSession, rows: Long, partitions: Int = 32): DataFrame =
    s.range(0, rows, 1, partitions).select(
      element_at(lit(tickers.toArray), (ub(10, 60) + 1).cast("int")).as("ticker"),
      ((ub(11, 1000) + 1) * 100).as("price"),
      (ub(12, 10000) + 1).as("volume"))

  /** 21-type lattice; `col_N` naming per generate.py:162-164. Unsigned /
    * date64 / ns / dictionary flavors carry the original-type metadata
    * tag so the Arrow writer restores the exact wire type. */
  def manyTypes(s: SparkSession, rows: Long, partitions: Int = 8): DataFrame = {
    import graft.arrow.ArrowSchemas.OrigTypeKey
    def tag(t: String) = new MetadataBuilder().putString(OrigTypeKey, t).build()
    val base = s.range(0, rows, 1, partitions)
    val df = base.select(
      (pmod(h(0), lit(256)) - 128).cast("byte").as("col_0"),
      (pmod(h(1), lit(65536)) - 32768).cast("short").as("col_1"),
      (pmod(h(2), lit(1L << 32)) - (1L << 31)).cast("int").as("col_2"),
      h(3).as("col_3"),
      pmod(h(4), lit(256)).cast("short").as("col_4", tag("uint8")),
      pmod(h(5), lit(65536)).cast("int").as("col_5", tag("uint16")),
      pmod(h(6), lit(1L << 32)).as("col_6", tag("uint32")),
      pmod(h(7), lit(Long.MaxValue)).cast(DecimalType(20, 0)).as("col_7", tag("uint64")),
      (pmod(h(8), lit(1000000)).cast("float") / 1000f).as("col_8"),
      (pmod(h(9), lit(1000000000)).cast("double") / 1000d).as("col_9"),
      concat(lit("s-"), conv(pmod(h(10), lit(1L << 40)).cast("string"), 10, 16)).as("col_10"),
      unhex(lpad(conv(pmod(h(11), lit(1L << 40)).cast("string"), 10, 16), 10, "0")).as("col_11"),
      (pmod(h(12), lit(2)) === 1).as("col_12"),
      date_add(lit(java.sql.Date.valueOf("2000-01-01")), pmod(h(13), lit(10000)).cast("int")).as("col_13"),
      date_add(lit(java.sql.Date.valueOf("2000-01-01")), pmod(h(14), lit(10000)).cast("int")).as("col_14", tag("date64")),
      timestamp_micros(pmod(h(15), lit(4102444800000000L))).as("col_15", tag("timestamp_ns")),
      (pmod(h(16), lit(100000000)).cast(DecimalType(10, 2)) / 100).cast(DecimalType(10, 2)).as("col_16"),
      array(pmod(h(17), lit(1000)).cast("int"), pmod(h(17, 1), lit(1000)).cast("int"),
        pmod(h(17, 2), lit(1000)).cast("int")).as("col_17"),
      struct(pmod(h(18), lit(1000)).cast("int").as("field1"),
        (pmod(h(18, 1), lit(1000000)).cast("double") / 1000d).as("field2")).as("col_18"),
      element_at(lit(Array("alpha", "beta", "gamma", "delta")), (pmod(h(19), lit(4)) + 1).cast("int"))
        .as("col_19", tag("dictionary")),
      lit(null).cast(NullType).as("col_20"))
    df
  }

  /** arrow-commits-shaped git-log table (F5; data/arrow-commits/
    * README.md:60-65, arrow-commits.R:26-63): 40-hex sha, UTC micros
    * timestamp descending like `git log`, files int32, merge bool,
    * first-line-only message. Author name/email are never generated —
    * the R script strips PII before writing (arrow-commits.R:31-32). */
  def gitLog(s: SparkSession, rows: Long, partitions: Int = 4): DataFrame =
    s.range(0, rows, 1, partitions).select(
      lower(concat(
        lpad(conv(pmod(h(30), lit(Long.MaxValue)).cast("string"), 10, 16), 16, "0"),
        lpad(conv(pmod(h(31), lit(Long.MaxValue)).cast("string"), 10, 16), 16, "0"),
        lpad(conv(pmod(h(32), lit(1L << 32)).cast("string"), 10, 16), 8, "0"))).as("commit"),
      timestamp_micros(lit(1709776852000000L) - col("id") * 43000000000L
        - pmod(h(33), lit(3600000000L))).as("time"),
      (pmod(h(34), lit(40)) + 1).cast("int").as("files"),
      (pmod(h(35), lit(10)) === 0).as("merge"),
      concat(lit("GH-"), pmod(h(36), lit(99999)).cast("string"),
        lit(": [Component] Deterministic change "),
        conv(pmod(h(37), lit(1L << 20)).cast("string"), 10, 16)).as("message"))

  /** Sprinkle nulls deterministically (validity-bitmap coverage). */
  def withNulls(df: DataFrame, everyN: Int = 7): DataFrame = {
    val cols = df.columns.zipWithIndex.map { case (c, i) =>
      val keep = df.schema(c).dataType != NullType
      if (keep)
        when(pmod(xxhash64(col(c).cast("string"), lit(i)), lit(everyN)) =!= 0, col(c))
          .otherwise(lit(null)).as(c, df.schema(c).metadata)
      else col(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
