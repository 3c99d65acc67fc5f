package graft.sources

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.datagen.Generators

/** Round-trips [[SqliteWriter]] output through a STOCK SQLite
  * implementation (python3's stdlib `sqlite3` — the only SQLite reader
  * in this container, and an independent one: nothing of the writer's
  * code is on the read side). Every test first passes
  * `PRAGMA integrity_check` — the b-tree/page-level validity oracle —
  * then compares values in a canonical text form computed separately on
  * each side.
  *
  * Canonical forms (independent of the writer's encoding path):
  * ints as decimal, reals as the 16-hex-digit IEEE-754 bit pattern,
  * text verbatim, blobs as lowercase hex, NULL as `<null>`.
  */
class SqliteWriterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("sqlite-spec", "4").getOrCreate()

  private def tmp(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), name)
    Files.deleteIfExists(p)
    p.toString
  }

  /** Read back (integrity, count, canonical rows) via stdlib sqlite3. */
  private def readBack(path: String, table: String): (String, Long, Seq[String]) = {
    val script =
      s"""import sqlite3, sys
         |con = sqlite3.connect(sys.argv[1])
         |ic = con.execute("PRAGMA integrity_check").fetchone()[0]
         |n = con.execute('SELECT COUNT(*) FROM "$table"').fetchone()[0]
         |print(ic); print(n)
         |import struct
         |def canon(v):
         |    if v is None: return "<null>"
         |    if isinstance(v, bool): return str(int(v))
         |    if isinstance(v, int): return str(v)
         |    if isinstance(v, float):
         |        return struct.pack(">d", v).hex()
         |    if isinstance(v, bytes): return v.hex()
         |    return str(v)
         |for row in con.execute('SELECT * FROM "$table" ORDER BY rowid'):
         |    print("\\t".join(canon(v) for v in row))
         |""".stripMargin
    val sf = tmp("sqlite_readback.py")
    Files.write(Paths.get(sf), script.getBytes("UTF-8"))
    val out = Seq("python3", sf, path).!!.linesIterator.toVector
    (out.head, out(1).toLong, out.drop(2))
  }

  /** The same canonical form computed Spark-side, through SQL casts —
    * a separate mapping from the writer's record encoder. */
  private def canonDf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      f.dataType match {
        case BooleanType => when(c.isNull, "<null>").otherwise(c.cast("int").cast("string"))
        case ByteType | ShortType | IntegerType | LongType =>
          when(c.isNull, "<null>").otherwise(c.cast("long").cast("string"))
        case FloatType | DoubleType =>
          when(c.isNull, "<null>")
            .otherwise(lpad(lower(conv(
              // IEEE bits of the double value, as unsigned hex
              expr(s"cast(double_to_bits(`${f.name}`) as string)"), 10, 16)), 16, "0"))
        case BinaryType => when(c.isNull, "<null>").otherwise(lower(hex(c)))
        case DateType => when(c.isNull, "<null>").otherwise(c.cast("string"))
        case TimestampType => when(c.isNull, "<null>")
          .otherwise(date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        case _: DecimalType => when(c.isNull, "<null>").otherwise(c.cast("string"))
        case NullType => lit("<null>")
        case _: ArrayType | _: StructType | _: MapType =>
          when(c.isNull, "<null>").otherwise(to_json(c))
        case StringType => when(c.isNull, "<null>").otherwise(c)
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    df.select(concat_ws("\t", cols.toIndexedSeq: _*).as("line"))
  }

  test("many-types table round-trips through stock sqlite3 (CTAS parity)") {
    // the reference's conversion input: the 21-type lattice, with nulls
    // coalesce(1): one deterministic row order shared by the writer's
    // toLocalIterator pass and the expected-side collect below
    val df = Generators.withNulls(Generators.manyTypes(spark, 300, 4)).coalesce(1)
    val path = tmp("graft_many_types.sqlite")
    val n = SqliteWriter.write(df, path, "random")
    assert(n === 300)

    val (ic, count, rows) = readBack(path, "random")
    assert(ic === "ok", "PRAGMA integrity_check must pass")
    assert(count === 300)

    // double_to_bits isn't a builtin — register a tiny UDF for the
    // spec-side canonicalization only (never in engine code paths).
    spark.udf.register("double_to_bits",
      (d: java.lang.Double) => java.lang.Double.doubleToLongBits(d))
    val expected = canonDf(df).collect().map(_.getString(0)).toSeq
    assert(rows.size === expected.size)
    rows.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === want, s"row $i mismatch")
    }
  }

  test("schema and storage classes match the declared mapping") {
    val df = Generators.manyTypes(spark, 50, 2).coalesce(1)
    val path = tmp("graft_types_check.sqlite")
    SqliteWriter.write(df, path, "random")
    val script =
      """import sqlite3, sys
        |con = sqlite3.connect(sys.argv[1])
        |print(con.execute("SELECT sql FROM sqlite_master").fetchone()[0])
        |row = con.execute("SELECT * FROM random LIMIT 1").fetchone()
        |cur = con.execute("SELECT * FROM random LIMIT 1")
        |names = [d[0] for d in cur.description]
        |tys = con.execute(
        |  "SELECT " + ", ".join(f'typeof("{n}")' for n in names) + " FROM random LIMIT 1"
        |).fetchone()
        |print("\t".join(tys))
        |""".stripMargin
    val sf = tmp("sqlite_types.py")
    Files.write(Paths.get(sf), script.getBytes("UTF-8"))
    val out = Seq("python3", sf, path).!!.linesIterator.toVector
    assert(out(0).startsWith("""CREATE TABLE "random"("col_0" INTEGER"""))
    val tys = out(1).split("\t")
    // col_0..3 ints, col_8/9 real, col_10 text, col_11 blob, col_12 bool→int,
    // col_13 date→text, col_17 array→text(json), col_20 null
    assert(tys(0) === "integer"); assert(tys(3) === "integer")
    assert(tys(8) === "real"); assert(tys(9) === "real")
    assert(tys(10) === "text"); assert(tys(11) === "blob")
    assert(tys(12) === "integer"); assert(tys(13) === "text")
    assert(tys(17) === "text"); assert(tys(20) === "null")
  }

  test("overflow chains: payloads far beyond one page survive") {
    import spark.implicits._
    val big = (1 to 20).map { i =>
      (i.toLong, "x" * (i * 1500), Array.fill[Byte](i * 900)((i % 120).toByte))
    }.toDF("id", "s", "b").coalesce(1)
    val path = tmp("graft_overflow.sqlite")
    SqliteWriter.write(big, path, "t")
    val (ic, n, rows) = readBack(path, "t")
    assert(ic === "ok"); assert(n === 20)
    // spot-check the largest row's canonical form
    val last = rows.last.split("\t")
    assert(last(0) === "20")
    assert(last(1) === "x" * 30000)
    assert(last(2) === Array.fill[Byte](18000)((20 % 120).toByte).map("%02x".format(_)).mkString)
  }

  test("512-byte pages force multi-level interior trees; empty table ok") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, s"row-$i")).toDF("id", "s").coalesce(1)
    val path = tmp("graft_deep.sqlite")
    SqliteWriter.write(df, path, "t", pageSize = 512)
    val (ic, n, rows) = readBack(path, "t")
    assert(ic === "ok"); assert(n === 5000)
    assert(rows.head === "1\trow-1" && rows.last === "5000\trow-5000")

    val empty = spark.emptyDataFrame.withColumn("x", lit(1)).filter(lit(false))
    val p2 = tmp("graft_empty.sqlite")
    SqliteWriter.write(empty.select(col("x")), p2, "t")
    val (ic2, n2, _) = readBack(p2, "t")
    assert(ic2 === "ok"); assert(n2 === 0)
  }

  test("parquetToSqlite mirrors the reference CTAS end-to-end") {
    // parquet dir: mode("overwrite") below replaces any prior run's dir
    val pq = Paths.get(sys.props("java.io.tmpdir"), "graft_ctas_src").toString
    Generators.gitLog(spark, 500, 2).write.mode("overwrite").parquet(pq)
    val path = tmp("graft_ctas.sqlite")
    val n = SqliteWriter.parquetToSqlite(spark, pq, path, "commits")
    assert(n === 500)
    val (ic, cnt, _) = readBack(path, "commits")
    assert(ic === "ok"); assert(cnt === 500)
  }
}
