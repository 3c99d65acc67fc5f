package graft.sources

import java.io.{BufferedInputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.FieldVector
import org.apache.arrow.vector.dictionary.DictionaryEncoder
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch}

import graft.arrow.{ArrowBridge, ArrowSchemas, InternalGetters}

/** DataSource V2 for Arrow IPC streams: `format("arrows")`.
  *
  * Read: local `.arrows` files (or directories of them) and `http(s)://`
  * URIs — one InputPartition per file/URI, which is exactly the
  * reference's own scale-out story (get_indirect's JSON-of-URIs,
  * `curl --parallel`; SURVEY §2.4). Column pruning supported; schemas
  * that map 1:1 onto Spark types take a zero-copy columnar path
  * (ArrowColumnVector), widened/dictionary schemas fall back to row
  * conversion.
  *
  * Write: partition-parallel part files (`part-NNNNN.arrows`) with
  * batch-size / lz4|zstd codec / IPC file-format options.
  */
class ArrowsTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrows"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("dissoc")) match {
      case Some(infoUrl) => ArrowsTableProvider.dissocSchema(infoUrl)
      case None =>
        val paths = ArrowsTableProvider.resolvePaths(options)
        require(paths.nonEmpty, "arrows source needs at least one path or url")
        ArrowsTableProvider.readSchema(paths.head)
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ArrowsTable(schema, new CaseInsensitiveStringMap(properties))
}

object ArrowsTableProvider {
  def isUrl(p: String): Boolean = p.startsWith("http://") || p.startsWith("https://")

  /** Expand paths: multi-path load, directories → their .arrows files. */
  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      // Spark passes load(paths*) as a JSON string array
      json.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val single = Option(options.get("path")).toSeq
    val urls = Option(options.get("url")).toSeq
    (multi ++ single ++ urls).flatMap { p =>
      if (isUrl(p)) Seq(p)
      else {
        val f = new java.io.File(stripScheme(p))
        if (f.isDirectory)
          f.listFiles().toSeq.map(_.getPath)
            .filter(n => n.endsWith(".arrows") || n.endsWith(".arrow")).sorted
        else Seq(f.getPath)
      }
    }
  }

  private[sources] def stripScheme(p: String): String =
    if (p.startsWith("file:")) URI.create(p).getPath else p

  /** The unexpanded path options (directories stay directories) —
    * the streaming source re-lists them per micro-batch. */
  def rawPaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      json.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    multi ++ Option(options.get("path")).toSeq ++ Option(options.get("url")).toSeq
  }

  def open(path: String): InputStream = open(path, schemaOnly = false)

  /** Socket guards for every client-side HTTP open (r14): a bench run
    * hung INDEFINITELY mid-100M-loop — one reader task blocked in
    * socket read while every server handler thread idled and a second
    * pooled connection held 2.9 MB of undelivered response — the same
    * stale keep-alive checkout race the dissociated channel reads
    * documented and opted out of in r13. Timeouts turn any recurrence
    * into a task failure (which Spark retries on a fresh connection)
    * instead of a wedged bench.
    *
    * r15 (r14 verdict #3): `Connection: close` now rides EVERY open,
    * not just bulk body reads — r14 left schema probes, /offsets
    * fetches, /qsplit probes and /dissoc/info discovery in the JDK
    * keep-alive pool, and a pooled connection the server half-closed
    * still stalled the FIRST read ~25 s until TCP gave up (the exact
    * 28–29 s plateau signature on three r14 32-core cells). The pool
    * buys nothing here: probe responses are a few hundred bytes against
    * a localhost (or LAN) server where a fresh connect is ~50 µs, and
    * at scale the probe fan-out per query is O(#parts), not a hot loop.
    * Opting every request out removes the stale-checkout race class
    * entirely. Env-tunable for deployments that want the pool back:
    * SPARK_GRAFT_HTTP_KEEPALIVE=1. */
  private val keepAlive =
    sys.env.getOrElse("SPARK_GRAFT_HTTP_KEEPALIVE", "0") == "1"
  private def httpTimeouts(conn: HttpURLConnection): HttpURLConnection = {
    conn.setConnectTimeout(
      sys.env.getOrElse("SPARK_GRAFT_HTTP_CONNECT_MS", "30000").toInt)
    conn.setReadTimeout(
      sys.env.getOrElse("SPARK_GRAFT_HTTP_READ_MS", "180000").toInt)
    if (!keepAlive) conn.setRequestProperty("Connection", "close")
    conn
  }

  def open(path: String, schemaOnly: Boolean, accept: String = ""): InputStream =
    if (isUrl(path)) {
      // keep-alive opt-out happens inside httpTimeouts (r15: EVERY
      // request, schema probes included — see the note there)
      val conn = httpTimeouts(
        URI.create(path).toURL.openConnection().asInstanceOf[HttpURLConnection])
      conn.setRequestProperty("Accept", "application/vnd.apache.arrow.stream")
      // opt-in content-coding (option acceptEncoding): the server
      // negotiates zstd/br/gzip and the decode match below unwraps it
      if (accept.nonEmpty) conn.setRequestProperty("Accept-Encoding", accept)
      if (schemaOnly) conn.setRequestProperty("X-Arrow-Schema-Only", "1")
      val code = conn.getResponseCode
      require(code == 200, s"GET $path -> HTTP $code")
      val ct = Option(conn.getContentType).getOrElse("")
      require(ct.startsWith("application/vnd.apache.arrow.stream"),
        s"unexpected content-type $ct from $path")
      val raw = conn.getInputStream
      val decoded = Option(conn.getContentEncoding) match {
        case Some("gzip") => new java.util.zip.GZIPInputStream(raw)
        case Some("zstd") => new com.github.luben.zstd.ZstdInputStream(raw)
        case Some("br")   => new graft.server.Brotli.BrotliStoredInputStream(raw)
        case _            => raw
      }
      new BufferedInputStream(decoded, 1 << 16)
    } else new BufferedInputStream(new java.io.FileInputStream(stripScheme(path)), 1 << 16)

  /** Probe the server's /offsets index and build range partitions of
    * roughly equal byte size, each covering whole batches. Empty when
    * the server has no index. */
  def rangedPartitions(fileUrl: String, n: Int): Seq[ArrowsInputPartition] =
    try {
      val offsetsUrl = fileUrl.replace("/files/", "/offsets/")
      val json = new String(httpTimeouts(URI.create(offsetsUrl).toURL
          .openConnection().asInstanceOf[HttpURLConnection])
        .getInputStream.readAllBytes(), "UTF-8")
      val schemaEnd = "\"schema_end\": (\\d+)".r.findFirstMatchIn(json).get.group(1).toLong
      val spans = "\\[(\\d+),(\\d+)\\]".r.findAllMatchIn(json)
        .map(m => (m.group(1).toLong, m.group(2).toLong)).toVector
      if (spans.isEmpty) Nil
      else {
        val total = spans.last._2 - spans.head._1
        val target = math.max(1L, total / n)
        val groups = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var start = spans.head._1
        var end = start
        spans.foreach { case (_, e) =>
          end = e
          if (end - start >= target) { groups += ((start, end)); start = end }
        }
        if (end > start) groups += ((start, end))
        groups.toSeq.map { case (s, e) => ArrowsInputPartition(fileUrl, schemaEnd, s, e) }
      }
    } catch { case _: Exception => Nil }

  /** Probe a /q/ URL's /qsplit/ twin: a graft server answers with a
    * JSON-of-URIs listing of spilled per-partition artifacts (the
    * indirect-listing shape). Empty on 404/foreign servers → caller
    * falls back to the single-stream read. */
  def probeSplits(qUrl: String): Seq[String] =
    try {
      val conn = httpTimeouts(URI.create(qUrl.replace("/q/", "/qsplit/")).toURL
        .openConnection().asInstanceOf[HttpURLConnection])
      if (conn.getResponseCode != 200) Nil
      else {
        val json = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        "\"uri\": \"([^\"]+)\"".r.findAllMatchIn(json).map(_.group(1)).toSeq
      }
    } catch { case _: Exception => Nil }

  /** GET a byte range of a URL. */
  def openRange(url: String, start: Long, endExclusive: Long): InputStream = {
    val conn = httpTimeouts(
      URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection])
    conn.setRequestProperty("Range", s"bytes=$start-${endExclusive - 1}")
    val code = conn.getResponseCode
    require(code == 206 || code == 200, s"range GET $url -> HTTP $code")
    new BufferedInputStream(conn.getInputStream, 1 << 16)
  }

  // ---- dissociated dual-channel read (SURVEY §3.3; the reference
  // client's out-of-order completion / in-order delivery,
  // dissociated-ipc/cudf-flight-client.cc:51-325, as a spark.read path)

  /** Parse a `/dissoc/info/` discovery document (real JSON parsing via
    * the jackson already on Spark's classpath — key order and whitespace
    * are not part of the contract; the r11 regex was): the
    * channel→uri map from `locations` plus any per-part info URIs from
    * `parts` (the reference's FlightInfo endpoint list is plural by
    * design, cudf-flight-server.cc:349-365 — a spilled dataset publishes
    * one (metadata, body) pair per part for a parallel scan). */
  /** One publishable unit of dissociated parallelism: a per-part info
    * URI plus (when the server inlines them) the part's resolved
    * channel pair — a task with the pair opens its two streams with no
    * discovery round-trip. */
  final case class DissocPart(infoUri: String, metaUri: String, bodyUri: String)

  def dissocInfo(infoUrl: String): (Map[String, String], Seq[DissocPart]) = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(httpTimeouts(URI.create(infoUrl).toURL
          .openConnection().asInstanceOf[HttpURLConnection])
        .getInputStream.readAllBytes())
    val chans = root.path("locations").elements().asScala
      .map(l => l.path("channel").asText() -> l.path("uri").asText()).toMap
    val parts = root.path("parts").elements().asScala
      .map(p => DissocPart(p.path("uri").asText(),
        p.path("metadata").asText(), p.path("body").asText()))
      .filter(_.infoUri.nonEmpty).toSeq
    (chans, parts)
  }

  /** Resolve a `/dissoc/info/` discovery document to its (metadata,
    * body) channel URIs — the HTTP analogue of the reference's
    * dual-location FlightInfo. */
  def resolveDissoc(infoUrl: String): (String, String) = {
    val pairs = dissocInfo(infoUrl)._1
    (pairs.getOrElse("metadata",
        throw new IllegalArgumentException(s"no metadata channel in $infoUrl")),
      pairs.getOrElse("body",
        throw new IllegalArgumentException(s"no body channel in $infoUrl")))
  }

  private def openRaw(url: String): InputStream = {
    // keep-alive opt-out inside httpTimeouts: a pooled channel
    // connection buys nothing (each is drained to EOF once) and exposes
    // the stale-checkout race — a connection the server half-closed
    // stalls the first read ~25 s until TCP gives up (observed as rare
    // outlier reps in DissocBench)
    val conn = httpTimeouts(
      URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection])
    val code = conn.getResponseCode
    require(code == 200, s"GET $url -> HTTP $code")
    new BufferedInputStream(conn.getInputStream, 1 << 16)
  }

  /** EOF that re-throws the background fetch failure instead of letting a
    * closed pipe read as a clean (but truncated) stream. */
  private final class ErrSurfacingStream(in: InputStream,
      err: java.util.concurrent.atomic.AtomicReference[Throwable])
      extends java.io.FilterInputStream(in) {
    private def chk(n: Int): Int = {
      if (n < 0 && err.get != null)
        throw new java.io.IOException("dissociated fetch failed", err.get)
      n
    }
    override def read(): Int = chk(super.read())
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      chk(super.read(b, off, len))
  }

  /** Bounded chunk pipe between the fetch thread and the reader.
    *
    * Replaces `java.io.Piped{Input,Output}Stream`, whose circular
    * buffer parks both sides in `wait(1000)` polling loops — measured
    * at ~0.5 s of stall per dissociated PART read (1 s-granular
    * first-byte/drain spikes), which multiplied by the r12 per-part
    * parallel scan turned a 0.6 s loop into a 2 s one. A
    * `ArrayBlockingQueue[Array[Byte]]` handoff has none of that: every
    * put/take wakes its peer immediately, and the bound (32 × ≤64 KiB
    * chunks ≈ 2 MiB) keeps the same backpressure the 1 MiB pipe gave. */
  private final case class PipeChunk(bytes: Array[Byte], len: Int)

  /** The pipe's write end: an OutputStream that can also take chunk
    * ownership (the reassemble fast path). */
  private abstract class ChunkPipeOut extends java.io.OutputStream
    with graft.dissociated.Dissociated.OwnedChunkSink

  private final class ChunkPipe {
    private val queue =
      new java.util.concurrent.ArrayBlockingQueue[PipeChunk](32)
    private val Eof = PipeChunk(null, -1)
    @volatile private var readerClosed = false

    val out: ChunkPipeOut = new ChunkPipeOut {
      private def put(chunk: PipeChunk): Unit = {
        // offer-with-timeout instead of put: a reader that abandoned the
        // stream (schema probes read only the prefix) must break the
        // producer out instead of parking it forever on a full queue —
        // the "pipe broken" contract java.io pipes get from readSide
        // liveness checks
        while (!queue.offer(chunk, 100,
            java.util.concurrent.TimeUnit.MILLISECONDS)) {
          if (readerClosed)
            throw new java.io.IOException("dissociated pipe closed by reader")
        }
      }
      // ownership handoff (r13): reassemble's arrays are fresh off the
      // channel and never reused — enqueue them directly, no copy, no
      // allocation (the generic write path below copied the whole body
      // volume once more per read)
      override def writeOwned(chunk: Array[Byte], len: Int): Unit = {
        if (readerClosed)
          throw new java.io.IOException("dissociated pipe closed by reader")
        if (len > 0) put(PipeChunk(chunk, len))
      }
      override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        if (readerClosed)
          throw new java.io.IOException("dissociated pipe closed by reader")
        var o = off
        var rem = len
        while (rem > 0) {
          val n = math.min(rem, 1 << 16)
          put(PipeChunk(java.util.Arrays.copyOfRange(b, o, o + n), n))
          o += n; rem -= n
        }
      }
      override def close(): Unit =
        try put(Eof) catch { case _: java.io.IOException => () }
    }

    val in: InputStream = new InputStream {
      private var cur: Array[Byte] = null
      private var curLen = 0
      private var pos = 0
      private var eof = false
      private def ensure(): Boolean = {
        if (eof) return false
        while (cur == null || pos >= curLen) {
          val c = queue.take()
          if (c eq Eof) { eof = true; return false }
          cur = c.bytes; curLen = c.len; pos = 0
        }
        true
      }
      override def read(): Int =
        if (!ensure()) -1 else { val v = cur(pos) & 0xFF; pos += 1; v }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (len == 0) return 0
        if (!ensure()) return -1
        val n = math.min(len, curLen - pos)
        System.arraycopy(cur, pos, b, off, n)
        pos += n
        n
      }
      // unblock a producer parked on a full queue so its finally-close
      // (and connection teardown) can run when the reader abandons the
      // stream early (schema probes read only the prefix)
      override def close(): Unit = { eof = true; readerClosed = true; queue.clear() }
    }
  }

  /** The reassembled Arrow IPC stream behind a dissoc info URL: both
    * channels are fetched CONCURRENTLY on a daemon thread, bodies may
    * complete out of order, and [[graft.dissociated.Dissociated.reassemble]]'s
    * bounded window (16 pending slots — constant memory at any stream
    * length) delivers batches in sequence order through a pipe. */
  def openDissoc(infoUrl: String): InputStream = {
    val (metaUrl, bodyUrl) = resolveDissoc(infoUrl)
    openDissocPair(metaUrl, bodyUrl)
  }

  /** As [[openDissoc]] with the channel pair already resolved (planned
    * tasks get theirs inline from the top-level discovery document).
    *
    * Both channel requests open CONCURRENTLY (r12 ADVICE): a sequential
    * meta-then-body open serializes two server handshakes per pair, and
    * with a fan-out of parts against a fixed-size server pool it
    * courts a queue-order deadlock — meta handlers streaming to
    * consumers whose body requests are still queued behind other
    * parts' meta handlers. Opening both up front enqueues each pair's
    * two requests back-to-back. */
  def openDissocPair(metaUrl: String, bodyUrl: String): InputStream = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val pipe = new ChunkPipe
    val t = new Thread(() => {
      try {
        val bodyF = new java.util.concurrent.CompletableFuture[InputStream]()
        val bt = new Thread(() => {
          try bodyF.complete(openRaw(bodyUrl))
          catch { case e: Throwable => bodyF.completeExceptionally(e) }
        }, "dissoc-dsv2-open-body")
        bt.setDaemon(true)
        bt.start()
        val meta = openRaw(metaUrl)
        val body =
          try bodyF.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              meta.close(); throw e.getCause
          }
        try graft.dissociated.Dissociated.reassemble(meta, body, pipe.out)
        finally { meta.close(); body.close() }
      } catch { case e: Throwable => err.set(e) }
      finally scala.util.Try(pipe.out.close())
    }, "dissoc-dsv2-fetch")
    t.setDaemon(true)
    t.start()
    new ErrSurfacingStream(pipe.in, err)
  }

  /** Schema of a dissociated dataset: read the reassembled stream's
    * schema message only (the channel fetch stops at the prefix). */
  def dissocSchema(infoUrl: String): StructType = {
    val alloc = ArrowBridge.newAllocator("dissoc-schema-probe")
    try {
      val r = new ArrowStreamReader(openDissoc(infoUrl), alloc,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
      try ArrowSchemas.fromArrowSchema(r.getVectorSchemaRoot.getSchema)
      finally r.close()
    } finally alloc.close()
  }

  /** Local file in the Arrow IPC *file* format? (ARROW1 magic) */
  def isFileFormat(path: String): Boolean =
    !isUrl(path) && {
      val f = new java.io.File(stripScheme(path))
      f.isFile && f.length > 6 && {
        val in = new java.io.FileInputStream(f)
        try {
          val magic = new Array[Byte](6)
          in.read(magic) == 6 && new String(magic, "ASCII") == "ARROW1"
        } finally in.close()
      }
    }

  /** Open either IPC format as an ArrowReader. */
  def openReader(path: String, alloc: org.apache.arrow.memory.BufferAllocator,
      schemaOnly: Boolean = false, accept: String = ""): org.apache.arrow.vector.ipc.ArrowReader =
    if (isFileFormat(path)) {
      val ch = new java.io.RandomAccessFile(stripScheme(path), "r").getChannel
      new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    } else new ArrowStreamReader(open(path, schemaOnly, accept), alloc,
      org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)

  def readSchema(path: String): StructType = {
    val alloc = ArrowBridge.newAllocator("schema-probe")
    try {
      val reader = openReader(path, alloc, schemaOnly = true)
      try ArrowSchemas.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally reader.close()
    } finally alloc.close()
  }
}

final class ArrowsTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "arrows"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowsScanBuilder(tableSchema, opts)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ArrowsWriteBuilder(info.schema(), options.asCaseSensitiveMap().asScala.toMap)
}

final class ArrowsScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve our metadata tags (pruned schema loses them)
    val byName = full.fields.map(f => f.name -> f).toMap
    required = StructType(requiredSchema.fields.map(f => byName.getOrElse(f.name, f)))
  }
  override def build(): Scan = Option(options.get("dissoc")) match {
    case Some(infoUrl) =>
      new ArrowsScan(full, required, Nil, 1, Nil, dissoc = Some(infoUrl),
        // dissocfanout=false forces the whole dataset through ONE
        // channel pair (the reference client's single dual-location
        // loop) — the right shape when per-part fixed costs would
        // dominate tiny parts; the default plans one task per pair
        dissocFanout = Option(options.get("dissocfanout")).forall(_.toBoolean))
    case None => buildPaths()
  }

  private def buildPaths(): Scan = {
    val paths = ArrowsTableProvider.resolvePaths(options)
    // Spark's V2 Table.columns() bridge strips StructField metadata, so
    // the original-type tags (dictionary/uint/...) that steer reader
    // selection may be gone — re-probe the first source's Arrow schema
    // and re-attach them by field name.
    val tagged = try {
      val probed = ArrowsTableProvider.readSchema(paths.head)
        .fields.map(f => f.name -> f).toMap
      StructType(required.fields.map { f =>
        probed.get(f.name).map(p => f.copy(metadata = p.metadata)).getOrElse(f)
      })
    } catch { case _: Exception => required }
    new ArrowsScan(full, tagged, paths,
      Option(options.get("rangepartitions")).map(_.toInt).getOrElse(1),
      ArrowsTableProvider.rawPaths(options),
      Option(options.get("split")).forall(_.toBoolean),
      accept = Option(options.get("acceptencoding")).getOrElse(""))
  }
}

final class ArrowsScan(full: StructType, required: StructType, paths: Seq[String],
    rangePartitions: Int, rawDirs: Seq[String], split: Boolean = true,
    dissoc: Option[String] = None, dissocFanout: Boolean = true,
    accept: String = "")
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Unbounded variant: the load path is watched as an append-only
    * directory of .arrows files; each micro-batch covers the newly
    * arrived files (the reference's incremental batch-at-a-time
    * delivery, SURVEY §1.1, extended to an unbounded source). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ArrowsMicroBatchStream(required, rawDirs)

  /** One partition per file/URL; a /q/ dynamic serve first probes the
    * server's /qsplit/ spill listing and expands to one partition per
    * spilled part file (option split=false opts out); a URL whose
    * server publishes a batch-offset index (our /offsets endpoint)
    * additionally splits into byte-range partitions — the get_range
    * split-fetch made a parallel scan (SURVEY §2.4; §4). */
  override def planInputPartitions(): Array[InputPartition] =
    // dissociated dual-channel dataset: the protocol's unit of
    // parallelism is the CHANNEL PAIR — a spilled dataset publishes one
    // per part (the reference's FlightInfo endpoint list is plural,
    // cudf-flight-server.cc:349-365), so plan one InputPartition per
    // pair; the out-of-order concurrency lives INSIDE each pair's fetch.
    // A single-pair dataset (unspilled/empty) stays one partition.
    if (dissoc.isDefined) {
      val parts =
        if (!dissocFanout) Nil
        else try ArrowsTableProvider.dissocInfo(dissoc.get)._2
        catch { case _: Exception => Nil }
      if (parts.size > 1)
        // pair-direct partitions: the inline channel URIs skip the
        // per-part discovery GET; entries without them (a foreign
        // server publishing info URIs only) resolve at open time
        parts.map(p => ArrowsInputPartition(p.infoUri, -1, -1, -1,
          dissoc = true, dissocMeta = p.metaUri, dissocBody = p.bodyUri)).toArray
      else Array(ArrowsInputPartition(dissoc.get, -1, -1, -1, dissoc = true))
    } else paths.flatMap { p =>
      val expanded =
        if (split && ArrowsTableProvider.isUrl(p) && p.contains("/q/")) {
          val parts = ArrowsTableProvider.probeSplits(p)
          if (parts.nonEmpty) parts else Seq(p)
        } else Seq(p)
      expanded.flatMap { u =>
        val ranged =
          if (rangePartitions > 1 && ArrowsTableProvider.isUrl(u) && u.contains("/files/"))
            ArrowsTableProvider.rangedPartitions(u, rangePartitions)
          else Nil
        if (ranged.nonEmpty) ranged
        else Seq(ArrowsInputPartition(u, -1, -1, -1, accept = accept))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowsReaderFactory(required)
}

final case class ArrowsInputPartition(path: String,
    schemaEnd: Long, start: Long, end: Long,
    dissoc: Boolean = false,
    dissocMeta: String = "", dissocBody: String = "",
    accept: String = "") extends InputPartition {
  def isRanged: Boolean = start >= 0
}

/** 1:1 Arrow↔Spark mapping (no widening/dictionary) → columnar OK. */
object ExactMap {
  def ok(st: StructType): Boolean = st.fields.forall { f =>
    !f.metadata.contains(ArrowSchemas.OrigTypeKey) && (f.dataType match {
      case s: StructType => ok(s)
      case org.apache.spark.sql.types.ArrayType(e, _) =>
        ok(StructType(Seq(org.apache.spark.sql.types.StructField("e", e))))
      case _ => true
    })
  }
}

final class ArrowsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  private val columnar = ExactMap.ok(required)

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ArrowsRowReader(p.asInstanceOf[ArrowsInputPartition], required)

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    new ArrowsColumnarReader(p.asInstanceOf[ArrowsInputPartition], required)
}

/** Shared reader plumbing: stream/file → per-batch vector access. A
  * ranged partition synthesizes [schema][its byte span][EOS] from two
  * range GETs — a valid standalone stream (the get_range concatenation
  * premise). */
abstract class ArrowsReaderBase(part: ArrowsInputPartition) {
  protected val alloc = ArrowBridge.newAllocator("dsv2-read")
  protected val reader =
    if (part.dissoc) {
      val in =
        if (part.dissocMeta.nonEmpty && part.dissocBody.nonEmpty)
          ArrowsTableProvider.openDissocPair(part.dissocMeta, part.dissocBody)
        else ArrowsTableProvider.openDissoc(part.path)
      new ArrowStreamReader(in, alloc,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    }
    else if (part.isRanged) {
      val pieces = java.util.Arrays.asList(
        ArrowsTableProvider.openRange(part.path, 0, part.schemaEnd),
        ArrowsTableProvider.openRange(part.path, part.start, part.end),
        new java.io.ByteArrayInputStream(ArrowBridge.EosBytes): InputStream)
      new ArrowStreamReader(
        new java.io.SequenceInputStream(java.util.Collections.enumeration(pieces)),
        alloc, org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    } else ArrowsTableProvider.openReader(part.path, alloc, accept = part.accept)
  protected val root = reader.getVectorSchemaRoot
  protected val arrowFieldIndex: Map[String, Int] =
    root.getSchema.getFields.asScala.map(_.getName).zipWithIndex.toMap

  def closeAll(): Unit = { reader.close(); alloc.close() }
}

final class ArrowsColumnarReader(part: ArrowsInputPartition, required: StructType)
    extends ArrowsReaderBase(part) with PartitionReader[ColumnarBatch] {
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (reader.loadNextBatch()) {
      val vecs = required.fields.map { f =>
        new ArrowColumnVector(root.getVector(arrowFieldIndex(f.name)))
      }
      batch = new ColumnarBatch(vecs.toArray, root.getRowCount)
      true
    } else false
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = { if (batch != null) batch.close(); closeAll() }
}

final class ArrowsRowReader(part: ArrowsInputPartition, required: StructType)
    extends ArrowsReaderBase(part) with PartitionReader[InternalRow] {
  private var getters: Array[Int => Any] = _
  private var decoded: Seq[org.apache.arrow.vector.ValueVector] = Nil
  private var rowCount = 0
  private var pos = 0

  private def loadBatch(): Boolean = {
    decoded.foreach(_.close()); decoded = Nil
    if (!reader.loadNextBatch()) return false
    rowCount = root.getRowCount
    pos = 0
    getters = required.fields.map { f =>
      val fv = root.getVector(arrowFieldIndex(f.name))
      if (fv.getField.getDictionary != null) {
        val dict = reader.getDictionaryVectors.get(fv.getField.getDictionary.getId)
        val dv = DictionaryEncoder.decode(fv, dict)
        decoded = decoded :+ dv
        InternalGetters.utf8(dv.asInstanceOf[org.apache.arrow.vector.VarCharVector])
      } else {
        val tag = if (f.metadata.contains(ArrowSchemas.OrigTypeKey))
          Some(f.metadata.getString(ArrowSchemas.OrigTypeKey)) else None
        InternalGetters.forField(fv.asInstanceOf[FieldVector], f.dataType, tag)
      }
    }
    true
  }

  override def next(): Boolean = {
    while (pos >= rowCount) if (!loadBatch()) return false
    pos += 1
    true
  }

  override def get(): InternalRow = {
    val i = pos - 1
    val arr = new Array[Any](getters.length)
    var j = 0
    while (j < getters.length) { arr(j) = getters(j)(i); j += 1 }
    new GenericInternalRow(arr)
  }

  override def close(): Unit = { decoded.foreach(_.close()); closeAll() }
}

// ============================ write ============================

final class ArrowsWriteBuilder(schema: StructType, options: Map[String, String])
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ArrowsBatchWrite(schema, options)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new ArrowsStreamingWrite(schema, options)
  }
}

/** Streaming sink: each micro-batch appends deterministic
  * `part-e<epoch>-p<partition>.arrows` files, so a retried task
  * overwrites its own file (idempotent per (epoch, partition)) and the
  * micro-batch arrows SOURCE can tail the same directory — the
  * stream-through-artifacts loop. */
final class ArrowsStreamingWrite(schema: StructType, options: Map[String, String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException("arrows streaming write needs a path"))

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    new java.io.File(path).mkdirs()
    val opts = ArrowBridge.WriteOptions(
      batchSize = options.get("batchsize").map(_.toInt).getOrElse(4096),
      codec = options.get("codec").filter(_ != "identity"))
    ArrowsStreamingWriterFactory(path, schema, opts)
  }
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ArrowsStreamingWriterFactory(path: String, schema: StructType,
    opts: ArrowBridge.WriteOptions)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new ArrowsDataWriter(path, partitionId, schema, opts,
      fixedName = Some(f"part-e$epochId%05d-p$partitionId%05d"))
}

final class ArrowsBatchWrite(schema: StructType, options: Map[String, String])
    extends BatchWrite {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException("arrows write needs a path"))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    val opts = ArrowBridge.WriteOptions(
      batchSize = options.get("batchsize").map(_.toInt).getOrElse(4096),
      codec = options.get("codec").filter(_ != "identity"),
      fileFormat = options.get("variant").contains("file"))
    ArrowsWriterFactory(path, schema, opts)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ArrowsWriterFactory(path: String, schema: StructType,
    opts: ArrowBridge.WriteOptions) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ArrowsDataWriter(path, partitionId, schema, opts)
}

final class ArrowsDataWriter(dir: String, partitionId: Int, schema: StructType,
    opts: ArrowBridge.WriteOptions, fixedName: Option[String] = None)
    extends DataWriter[InternalRow] {
  private val ext = if (opts.fileFormat) "arrow" else "arrows"
  private val file = new java.io.File(dir,
    fixedName.map(n => s"$n.$ext").getOrElse(
      f"part-$partitionId%05d-${UUID.randomUUID().toString.take(8)}.$ext"))
  private val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(file), 1 << 16)
  private val writer = new ArrowBridge.StreamingWriter(schema, out, opts)

  override def write(record: InternalRow): Unit = writer.append(record)

  override def commit(): WriterCommitMessage = {
    writer.finish()
    new WriterCommitMessage {}
  }
  override def abort(): Unit = { writer.close(); out.close(); val _ = file.delete() }
  override def close(): Unit = { writer.close(); out.close() }
}
