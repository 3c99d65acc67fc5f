package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types._

/** Pure-JVM SQLite database writer — the reference's Parquet → SQLite
  * CTAS (`/root/reference/data/rand-many-types/parquet-to-sqlite.sql:18-20`)
  * without the jar-blocked sqlite-jdbc driver: the SQLite file format is
  * public and stable (sqlite.org/fileformat2.html), so the writer emits
  * the bytes directly — header, table b-tree (leaf + interior pages),
  * record serial-type encoding, and overflow-page chains — and any stock
  * SQLite library reads the result (the spec round-trips through
  * python3's stdlib `sqlite3`, including `PRAGMA integrity_check`).
  *
  * Deliberately a DRIVER-SIDE sink (`toLocalIterator`, one open file):
  * SQLite is a single-file embedded database with a single writer — the
  * reference uses the conversion to produce a local test fixture, not a
  * distributed sink, and that is the contract here too (the 100 TB path
  * for relational hand-off is parquet/arrows; this exists for parity
  * with the reference's fixture tooling). Rows stream through a bounded
  * page builder, so memory is O(page size · tree depth), not O(table).
  *
  * Type mapping onto SQLite's five storage classes (declared column
  * affinities in the CREATE TABLE shadow the same choice):
  *   - integral types, booleans        → INTEGER (minimal-width serial)
  *   - float/double                    → REAL (float widens exactly)
  *   - string                          → TEXT
  *   - binary                          → BLOB
  *   - date / timestamp                → TEXT (ISO-8601, UTC)
  *   - decimal                         → TEXT (toPlainString — lossless)
  *   - array / struct / map            → TEXT (JSON via `to_json`)
  *   - null type                       → all-NULL TEXT column
  */
object SqliteWriter {

  /** Write `df` as table `table` into a fresh SQLite database at `path`
    * (any existing file is replaced — the CTAS `DROP TABLE IF EXISTS`
    * semantics of the reference script). Returns the row count.
    *
    * `pageSize` must be a power of two in [512, 65536]; 4096 is the
    * stock default. Small pages are exercised by the spec to force
    * multi-level interior trees cheaply.
    */
  def write(df: DataFrame, path: String, table: String,
      pageSize: Int = 4096): Long = {
    require(pageSize >= 512 && pageSize <= 65536 &&
      Integer.bitCount(pageSize) == 1, s"bad page size $pageSize")

    // Complex columns go through Spark's JSON projection once, up
    // front, so the page builder below only ever sees scalars.
    val flat = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
    val schema = flat.schema

    val file = new java.io.File(path)
    if (file.exists()) { require(file.delete(), s"cannot replace $path") }
    val raf = new RandomAccessFile(file, "rw")
    try {
      val pages = new PageFile(raf, pageSize)
      val leaves = new ArrayBuffer[(Int, Long)] // (pageNo, maxRowid)
      val leaf = new LeafBuilder(pages, headerOffset = 0)
      var rowid = 0L
      val it = flat.toLocalIterator()
      while (it.hasNext) {
        rowid += 1
        leaf.add(rowid, record(schema, it.next()))
        leaf.drainTo(leaves)
      }
      leaf.finish(leaves)
      val rootPage = buildInterior(pages, leaves)

      // sqlite_master on page 1: one row describing the table.
      val createSql = schema.fields
        .map(f => s""""${f.name}" ${affinity(f.dataType)}""")
        .mkString(s"""CREATE TABLE "$table"(""", ", ", ")")
      val masterRec = record(MasterSchema, Row("table", table, table,
        rootPage.toLong, createSql))
      val master = new LeafBuilder(pages, headerOffset = 100)
      master.add(1L, masterRec)
      val masterLeaves = new ArrayBuffer[(Int, Long)]
      master.finishAsPage1(masterLeaves)

      pages.writeHeader(pageSize)
      rowid
    } finally raf.close()
  }

  /** The reference's conversion entry point: parquet file(s) → one-table
    * SQLite database, mirroring parquet-to-sqlite.sql. */
  def parquetToSqlite(spark: org.apache.spark.sql.SparkSession,
      parquetPath: String, sqlitePath: String, table: String): Long =
    write(spark.read.parquet(parquetPath), sqlitePath, table)

  private val MasterSchema = StructType(Seq(
    StructField("type", StringType), StructField("name", StringType),
    StructField("tbl_name", StringType), StructField("rootpage", LongType),
    StructField("sql", StringType)))

  private def affinity(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    case BinaryType => "BLOB"
    case _ => "TEXT"
  }

  private val TsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  // -- record (row) encoding: serial-type header + value bodies --------

  /** SQLite varint: big-endian 7-bit groups, 9th byte carries 8 bits. */
  private[sources] def varint(v: Long): Array[Byte] = {
    require(v >= 0, s"negative varint $v")
    if (v <= 0x7f) Array(v.toByte)
    else {
      val groups = new ArrayBuffer[Byte]
      var rest = v
      var n = 0
      while (rest != 0 && n < 9) { groups += (rest & 0x7f).toByte; rest >>>= 7; n += 1 }
      require(rest == 0, s"varint too wide: $v")
      val out = groups.reverse.toArray
      var i = 0
      while (i < out.length - 1) { out(i) = (out(i) | 0x80).toByte; i += 1 }
      out
    }
  }

  private def intBytes(v: Long): (Long, Array[Byte]) = {
    // minimal-width two's-complement big-endian, serial types 1..6
    def be(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var i = 0
      while (i < n) { b(i) = (v >> (8 * (n - 1 - i))).toByte; i += 1 }
      b
    }
    if (v >= -128 && v <= 127) (1L, be(1))
    else if (v >= -32768 && v <= 32767) (2L, be(2))
    else if (v >= -8388608 && v <= 8388607) (3L, be(3))
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, be(4))
    else if (v >= -140737488355328L && v <= 140737488355327L) (5L, be(6))
    else (6L, be(8))
  }

  /** One row → SQLite record bytes (header varints + bodies). */
  private[sources] def record(schema: StructType, row: Row): Array[Byte] = {
    val n = schema.length
    val serials = new Array[Long](n)
    val bodies = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val (st, body) =
        if (row.isNullAt(i)) (0L, Array.emptyByteArray)
        else schema(i).dataType match {
          case BooleanType => (if (row.getBoolean(i)) 9L else 8L, Array.emptyByteArray)
          case ByteType => intBytes(row.getByte(i).toLong)
          case ShortType => intBytes(row.getShort(i).toLong)
          case IntegerType => intBytes(row.getInt(i).toLong)
          case LongType => intBytes(row.getLong(i))
          case FloatType => (7L, doubleBe(row.getFloat(i).toDouble))
          case DoubleType => (7L, doubleBe(row.getDouble(i)))
          case StringType => text(row.getString(i))
          case BinaryType =>
            val b = row.getAs[Array[Byte]](i); (12L + 2 * b.length, b)
          case DateType => text(row.getAs[java.sql.Date](i).toString)
          case TimestampType =>
            text(TsFmt.format(row.getAs[java.sql.Timestamp](i).toInstant))
          case _: DecimalType =>
            text(row.getAs[java.math.BigDecimal](i).toPlainString)
          case NullType => (0L, Array.emptyByteArray)
          case other => throw new IllegalArgumentException(
            s"sqlite writer: unsupported type ${other.catalogString}")
        }
      serials(i) = st
      bodies(i) = body
      i += 1
    }
    val serialBytes = serials.map(varint)
    val stLen = serialBytes.map(_.length).sum
    val bodyLen = bodies.map(_.length).sum
    // record-header length varint includes its own bytes: fixpoint
    var guess = 1 + stLen
    var hv = varint(guess.toLong)
    while (hv.length + stLen != guess) {
      guess = hv.length + stLen
      hv = varint(guess.toLong)
    }
    val out = new ArrayBuffer[Byte](guess + bodyLen)
    out ++= hv
    serialBytes.foreach(out ++= _)
    bodies.foreach(out ++= _)
    out.toArray
  }

  private def doubleBe(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (bits >> (8 * (7 - i))).toByte; i += 1 }
    b
  }

  private def text(s: String): (Long, Array[Byte]) = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    (13L + 2 * b.length, b)
  }

  // -- page-level building ----------------------------------------------

  /** Sequential page allocator over the open file. Page 1 is reserved
    * for the header + sqlite_master and written last. */
  private final class PageFile(raf: RandomAccessFile, val pageSize: Int) {
    var nPages = 1
    def allocate(): Int = { nPages += 1; nPages }
    def write(pageNo: Int, data: Array[Byte]): Unit = {
      require(data.length == pageSize, s"short page ${data.length}")
      raf.seek((pageNo - 1L) * pageSize)
      raf.write(data)
    }
    def writeRaw(offset: Long, data: Array[Byte]): Unit = {
      raf.seek(offset); raf.write(data)
    }
    def writeHeader(pageSize: Int): Unit = {
      val h = new Array[Byte](100)
      val magic = "SQLite format 3".getBytes(StandardCharsets.ISO_8859_1)
      System.arraycopy(magic, 0, h, 0, 15) // h(15) stays 0x00: the \0 terminator
      def be16(off: Int, v: Int): Unit = { h(off) = (v >> 8).toByte; h(off + 1) = v.toByte }
      def be32(off: Int, v: Int): Unit = {
        h(off) = (v >> 24).toByte; h(off + 1) = (v >> 16).toByte
        h(off + 2) = (v >> 8).toByte; h(off + 3) = v.toByte
      }
      be16(16, if (pageSize == 65536) 1 else pageSize)
      h(18) = 1; h(19) = 1 // legacy (rollback) read/write versions
      h(20) = 0 // reserved bytes per page
      h(21) = 64; h(22) = 32; h(23) = 32 // payload fractions (fixed)
      be32(24, 1) // file change counter
      be32(28, nPages) // database size in pages
      be32(40, 1) // schema cookie
      be32(44, 4) // schema format 4 (serial types 8/9 allowed)
      be32(56, 1) // text encoding: UTF-8
      be32(92, 1) // version-valid-for == change counter
      be32(96, 3045000) // SQLITE_VERSION_NUMBER shape
      raf.seek(0); raf.write(h)
      raf.setLength(nPages.toLong * pageSize)
    }
  }

  /** Accumulates leaf-table cells into fixed-size pages, spilling each
    * full page to the file as it closes. Payloads beyond the local
    * threshold X = U-35 continue into overflow-page chains, per the
    * b-tree payload-overflow rules. */
  private final class LeafBuilder(pages: PageFile, headerOffset: Int) {
    private val U = pages.pageSize
    private val X = U - 35
    private val cells = new ArrayBuffer[Array[Byte]]
    private var contentBytes = 0
    private var maxRowid = 0L
    private var emitted = 0
    private val done = new ArrayBuffer[(Int, Long)]

    def add(rowid: Long, payload: Array[Byte]): Unit = {
      val cell = makeCell(rowid, payload)
      // header + 2-byte pointer per cell + cell content must fit
      if (cells.nonEmpty &&
          headerOffset + 8 + 2 * (cells.length + 1) + contentBytes + cell.length > U) {
        flush()
      }
      cells += cell
      contentBytes += cell.length
      maxRowid = rowid
    }

    private def makeCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val L = payload.length
      if (L <= X) {
        val out = new ArrayBuffer[Byte]
        out ++= varint(L.toLong); out ++= varint(rowid); out ++= payload
        out.toArray
      } else {
        val M = ((U - 12) * 32) / 255 - 23
        val K = M + (L - M) % (U - 4)
        val local = if (K <= X) K else M
        // overflow chain first (cell references its head page number)
        val chunk = U - 4
        var off = local
        var head = 0
        var prevPage = 0
        var prevBytes: Array[Byte] = null
        while (off < L) {
          val page = pages.allocate()
          if (head == 0) head = page
          if (prevBytes != null) {
            prevBytes(0) = (page >> 24).toByte; prevBytes(1) = (page >> 16).toByte
            prevBytes(2) = (page >> 8).toByte; prevBytes(3) = page.toByte
            pages.write(prevPage, prevBytes)
          }
          val take = math.min(chunk, L - off)
          val pb = new Array[Byte](U)
          System.arraycopy(payload, off, pb, 4, take)
          prevPage = page; prevBytes = pb
          off += take
        }
        if (prevBytes != null) pages.write(prevPage, prevBytes) // next = 0
        val out = new ArrayBuffer[Byte]
        out ++= varint(L.toLong); out ++= varint(rowid)
        out ++= payload.take(local)
        out += (head >> 24).toByte; out += (head >> 16).toByte
        out += (head >> 8).toByte; out += head.toByte
        out.toArray
      }
    }

    private def render(pageNo: Int, isPage1: Boolean): Array[Byte] = {
      val pb = new Array[Byte](U)
      val base = if (isPage1) 100 else 0
      pb(base) = 0x0d // leaf table b-tree
      pb(base + 3) = (cells.length >> 8).toByte
      pb(base + 4) = cells.length.toByte
      var contentStart = U
      var ptr = base + 8
      cells.foreach { c =>
        contentStart -= c.length
        System.arraycopy(c, 0, pb, contentStart, c.length)
        pb(ptr) = (contentStart >> 8).toByte; pb(ptr + 1) = contentStart.toByte
        ptr += 2
      }
      pb(base + 5) = (contentStart >> 8).toByte
      pb(base + 6) = contentStart.toByte
      pb
    }

    private def flush(): Unit = {
      val pageNo = pages.allocate()
      pages.write(pageNo, render(pageNo, isPage1 = false))
      done += ((pageNo, maxRowid))
      emitted += 1
      cells.clear(); contentBytes = 0
    }

    def drainTo(sink: ArrayBuffer[(Int, Long)]): Unit = {
      sink ++= done; done.clear()
    }

    /** Close out: emits the partial tail page, or one empty leaf so an
      * empty table still has a root page. */
    def finish(sink: ArrayBuffer[(Int, Long)]): Unit = {
      if (cells.nonEmpty || emitted == 0) flush()
      drainTo(sink)
    }

    /** Render the accumulated cells as page 1's b-tree area (the
      * sqlite_master table — must fit one page; asserted). */
    def finishAsPage1(sink: ArrayBuffer[(Int, Long)]): Unit = {
      require(done.isEmpty,
        "sqlite_master spilled past page 1 (too many tables)")
      val pb = render(1, isPage1 = true)
      // leave the first 100 bytes for the file header (writeHeader)
      pages.writeRaw(100L, java.util.Arrays.copyOfRange(pb, 100, U))
      sink += ((1, maxRowid))
    }
  }

  /** Fold (pageNo, maxRowid) children into interior table pages until a
    * single root remains. Interior cell = 4-byte child page + varint
    * max-rowid key; the last child rides the header's rightmost pointer. */
  private def buildInterior(pages: PageFile,
      children0: ArrayBuffer[(Int, Long)]): Int = {
    var children: Seq[(Int, Long)] = children0.toSeq
    val U = pages.pageSize
    // children per interior page: nCells 15-byte worst-case slots
    // (4-byte child + ≤9-byte key + 2-byte pointer) + rightmost child
    val cap = (U - 12) / 15 + 1
    while (children.length > 1) {
      val n = children.length
      // even chunking so no page ends up with a single child
      val nChunks = (n + cap - 1) / cap
      val base = (n + nChunks - 1) / nChunks
      val chunks0 = children.grouped(base).toSeq
      val chunks =
        if (chunks0.length > 1 && chunks0.last.length == 1)
          chunks0.dropRight(2) :+ (chunks0(chunks0.length - 2).dropRight(1)) :+
            (chunks0(chunks0.length - 2).takeRight(1) ++ chunks0.last)
        else chunks0
      children = chunks.map { group =>
        val pageNo = pages.allocate()
        val pb = new Array[Byte](U)
        pb(0) = 0x05
        val nCells = group.length - 1
        pb(3) = (nCells >> 8).toByte; pb(4) = nCells.toByte
        val (rm, rmKey) = group.last
        pb(8) = (rm >> 24).toByte; pb(9) = (rm >> 16).toByte
        pb(10) = (rm >> 8).toByte; pb(11) = rm.toByte
        var contentStart = U
        var ptr = 12
        group.dropRight(1).foreach { case (child, key) =>
          val cell = new ArrayBuffer[Byte]
          cell += (child >> 24).toByte; cell += (child >> 16).toByte
          cell += (child >> 8).toByte; cell += child.toByte
          cell ++= varint(key)
          contentStart -= cell.length
          System.arraycopy(cell.toArray, 0, pb, contentStart, cell.length)
          pb(ptr) = (contentStart >> 8).toByte; pb(ptr + 1) = contentStart.toByte
          ptr += 2
        }
        pb(5) = (contentStart >> 8).toByte; pb(6) = contentStart.toByte
        pages.write(pageNo, pb)
        (pageNo, rmKey)
      }
    }
    children.head._1
  }
}
