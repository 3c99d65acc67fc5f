package graft.server

import java.io.{IOException, OutputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.security.SecureRandom
import java.util.Base64
import java.util.concurrent.Executors

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.arrow.ArrowBridge

/** Driver-embedded HTTP service streaming DataFrames as Arrow IPC
  * streams — the engine surface reproducing the reference's http/
  * experiment family (SURVEY §2.3):
  *
  *   GET  /q/<name>          chunked Arrow stream, content negotiation
  *                           (HTTP codings zstd>gzip; IPC codecs
  *                           zstd,lz4 via Accept ;codecs), 406 path
  *   GET  /multipart/<name>  multipart/mixed: JSON + Arrow + footnotes
  *   GET  /                  indirect JSON listing of /files artifacts
  *   GET  /files/<name>      static .arrows artifact, Content-Length +
  *                           Accept-Ranges + single-range GETs
  *   POST /ingest/<name>     Arrow stream request body → temp view
  *
  * Streaming policy mirrors the reference: one flush per record batch
  * (TTFB), 64 KiB coalescing floor on the compressed path with the
  * first chunk force-flushed (server.py:388,421-429).
  */
final class ArrowHttpServer(spark: SparkSession, port: Int = 0) {

  private val datasets = scala.collection.concurrent.TrieMap[String, () => DataFrame]()
  private val files = scala.collection.concurrent.TrieMap[String, java.nio.file.Path]()
  /** Per-dataset dictionary-encoded columns (value sets computed at
    * registration — one dictionary per stream, the reference's
    * USE_DICTIONARY_ENCODING behavior, get_compressed/server.py:50-52). */
  private val dictCols = scala.collection.concurrent.TrieMap[String, Map[String, Array[String]]]()

  // reference preference order zstd > br > gzip (server.py:444-449);
  // br is the RFC 7932 stored-mode coding (see Brotli.scala)
  val httpCodings: Seq[String] = Seq("zstd", "br", "gzip")
  val ipcCodecs: Seq[String] = Seq("zstd", "lz4")

  def register(name: String, df: => DataFrame): Unit = {
    spillCache.remove(name).foreach(_ =>
      files.keys.filter(_.startsWith(s"$name/")).foreach(files.remove))
    datasets.put(name, () => df)
  }
  def registerFile(name: String, path: java.nio.file.Path): Unit = {
    offsetsCache.remove(name)
    chanStatCache.remove(name)
    files.put(name, path)
  }

  /** Register with dictionary encoding on the given string columns;
    * their distinct values are collected once, eagerly. The collect is
    * CAPPED at [[ArrowHttpServer.MaxDictValues]] per column: an
    * up-front dictionary only makes sense for genuinely low-cardinality
    * columns (the reference's case is 60 tickers), and an unguarded
    * collect() on an API surface is a driver-OOM hazard at scale —
    * high-cardinality columns belong on [[registerDictDelta]], which
    * streams the dictionary single-pass and never collects. */
  def registerDict(name: String, df: DataFrame, columns: Seq[String]): Unit = {
    val max = ArrowHttpServer.MaxDictValues
    val dicts = columns.map { c =>
      val vals = df.select(c).distinct().orderBy(c).limit(max + 1)
        .collect().map(_.getString(0))
      require(vals.length <= max,
        s"registerDict($name): column '$c' has more than $max distinct values; " +
          "use registerDictDelta, which never collects the value set")
      c -> vals
    }.toMap
    dictCols.put(name, dicts)
    datasets.put(name, () => df)
  }

  /** Per-dataset DELTA-dictionary columns: encoded single-pass against
    * dictionaries that grow as values appear — no distinct() pre-scan,
    * no up-front value collection (the scale shape for serving streams
    * whose value set is unknown; see ArrowBridge.writeDeltaDict). */
  private val deltaDictCols = scala.collection.concurrent.TrieMap[String, Seq[String]]()

  def registerDictDelta(name: String, df: => DataFrame, columns: Seq[String]): Unit = {
    deltaDictCols.put(name, columns)
    register(name, df)
  }

  // TCP_NODELAY on response sockets (read once at HttpServer class-init):
  // without it, Nagle + delayed-ACK stalls each small framed write behind
  // the peer's 40 ms ACK timer — measured at ~65 ms per dissociated
  // channel request (≈76 small frames each), which multiplied across the
  // per-part parallel scan's 2×parts requests dominated the loop.
  ArrowHttpServer.ensureNoDelay()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // Sized for the parallel dissociated scan (r12 ADVICE): each of up to
  // `defaultParallelism` reader tasks holds TWO long-lived channel
  // streams (meta + body) concurrently, plus short info requests — a
  // pool smaller than 2×parallelism serializes the whole fan-out behind
  // its sockets (measured: the 10M fan-out read 3.6 s behind 8 threads,
  // 0.9 s behind 72). Threads are cheap here — every handler streams in
  // O(64 KiB) chunks, so per-thread memory is bounded regardless of
  // pool width.
  private val pool = Executors.newFixedThreadPool(
    2 * spark.sparkContext.defaultParallelism + 8, r => {
    val t = new Thread(r, "arrow-http")
    t.setDaemon(true) // never pin the JVM open
    t
  })
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  // ------------------------------------------------------------------
  server.createContext("/q/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/q/")
    datasets.get(name) match {
      case None => sendText(exchange, 404, s"no dataset $name")
      case Some(dfFn) =>
        val h = exchange.getRequestHeaders
        Negotiation.negotiate(
          Option(h.getFirst("Accept")), Option(h.getFirst("Accept-Encoding")),
          ipcCodecs, httpCodings, http10 = exchange.getProtocol == "HTTP/1.0"
        ) match {
          case Left(diag) => sendText(exchange, 406, diag + "\n")
          case Right(strategy) =>
            val rh = exchange.getResponseHeaders
            rh.set("Content-Type", strategy.contentType)
            rh.set("Content-Disposition", s"""attachment; filename="$name.arrows"""")
            // schema-only probe: answer [schema][EOS] without running
            // the query (keeps DSv2 inferSchema from triggering a full
            // serve that is then abandoned)
            if (exchange.getRequestHeaders.containsKey("X-Arrow-Schema-Only")) {
              exchange.sendResponseHeaders(200, 0)
              val out = exchange.getResponseBody
              // must reflect the dictionary layout of the real stream:
              // one-dict streams prefix an (empty-tolerant) dictionary
              // message; delta streams are schema-only until data flows
              out.write(deltaDictCols.get(name) match {
                case Some(cols) => ArrowBridge.deltaDictSchemaBytes(dfFn().schema, cols)
                case None => ArrowBridge.schemaBytes(dfFn().schema,
                  ArrowBridge.WriteOptions(dictColumns = dictCols.getOrElse(name, Map.empty)))
              })
              out.write(ArrowBridge.EosBytes)
              out.close()
            } else {
              strategy.httpCoding.foreach(c => rh.set("Content-Encoding", c))
              exchange.sendResponseHeaders(200, 0) // 0 = chunked
              val raw = exchange.getResponseBody
              val sink = new CoalescingOutputStream(raw, 64 * 1024, flushFirst = true)
              val df = dfFn()
              // r15: the zstd coding on the parallel-relay path is
              // compressed as independent per-chunk frames on plain JVM
              // threads (ArrowBridge.writeParallelZstd) — libzstd's own
              // MT encoder (ZstdOutputStream.setWorkers) intermittently
              // stalled serves 20–80 s under concurrent decode load.
              // The delta-dict row loop keeps the (stall-free)
              // single-threaded ZstdOutputStream.
              if (strategy.httpCoding.contains("zstd") &&
                  !deltaDictCols.contains(name)) {
                try ArrowBridge.writeParallelZstd(df, sink,
                  ArrowBridge.WriteOptions(codec = strategy.ipcCodec,
                    dictColumns = dictCols.getOrElse(name, Map.empty)),
                  workers = sys.env.getOrElse("SPARK_GRAFT_ZSTD_WORKERS", "4").toInt)
                finally sink.close()
              } else {
                val out: OutputStream = strategy.httpCoding match {
                  case Some("gzip") => new java.util.zip.GZIPOutputStream(sink, true)
                  case Some("zstd") => new com.github.luben.zstd.ZstdOutputStream(sink)
                  case Some("br")   => new Brotli.BrotliStoredOutputStream(sink)
                  case _            => sink
                }
                try {
                  deltaDictCols.get(name) match {
                    case Some(cols) =>
                      // single-pass growing-dictionary encode (no IPC body
                      // codec on this path; HTTP coding still applies)
                      ArrowBridge.writeDeltaDict(df.schema,
                        ArrowBridge.internalRows(df), out, cols)
                    case None =>
                      ArrowBridge.writeParallel(df, out,
                        ArrowBridge.WriteOptions(codec = strategy.ipcCodec,
                          dictColumns = dictCols.getOrElse(name, Map.empty)))
                  }
                } finally { out.close() }
              }
            }
        }
    }
  })

  // ------------------------------------------------------------------
  server.createContext("/multipart/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/multipart/")
    datasets.get(name) match {
      case None => sendText(exchange, 404, s"no dataset $name")
      case Some(dfFn) =>
        // CSPRNG boundary: 28 bytes entropy, base64url (reference
        // algorithm, http/get_multipart/README.md:34-56)
        val rnd = new Array[Byte](28)
        new SecureRandom().nextBytes(rnd)
        val boundary = Base64.getUrlEncoder.withoutPadding.encodeToString(rnd)
        exchange.getResponseHeaders.set("Content-Type",
          s"""multipart/mixed; boundary="$boundary"""")
        exchange.sendResponseHeaders(200, 0)
        val out = exchange.getResponseBody
        val t0 = System.nanoTime()
        val df = dfFn()
        def part(ct: String): Unit =
          out.write(s"\r\n--$boundary\r\nContent-Type: $ct\r\n\r\n".getBytes(UTF_8))

        part("application/json")
        val cols = df.schema.fields.map(f =>
          s"""{"name":"${f.name}","type":"${f.dataType.simpleString}"}""").mkString(",")
        out.write(s"""{"name":"$name","columns":[$cols]}""".getBytes(UTF_8))

        part(Negotiation.ArrowMime)
        val counting = new CountingOutputStream(out)
        // digest computed WHILE streaming (no second pass, no buffering):
        // feeds the integrity part below
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        val (rows, batches, _) = ArrowBridge.writeParallel(df,
          new java.security.DigestOutputStream(counting, digest))
        counting.flush()

        part("text/plain")
        val secs = (System.nanoTime() - t0) / 1e9
        out.write(
          f"""record batches sent: $batches%d
             |arrow bytes sent: ${counting.count}%d
             |rows sent: $rows%d
             |seconds elapsed: $secs%.2f
             |""".stripMargin.getBytes(UTF_8))

        // 4th part kind (beyond the reference's three): an integrity
        // digest of the Arrow part's exact bytes, so a client can
        // verify the payload it just decoded without re-reading it
        part("application/vnd.graft.digest")
        out.write((digest.digest().map("%02x".format(_)).mkString("sha256:", "", "") +
          s" bytes:${counting.count}\n").getBytes(UTF_8))
        out.write(s"\r\n--$boundary--\r\n".getBytes(UTF_8))
        out.close()
    }
  })

  // ------------------------------------------------------------------
  // spill-to-artifact split listing: the first request runs the query
  // ONCE, spills it partition-parallel to .arrows part files through
  // the DSv2 writer, registers each part as a /files/ artifact, and
  // answers the same JSON-of-URIs shape as the indirect listing — so a
  // client fans out one GET per partition (and can range-split each via
  // /offsets). This is the reference's own scale-out pattern
  // (get_indirect JSON-of-URIs + parallel fetch) applied to dynamic
  // query results: serving memory stays O(batch), reads get N-way
  // parallelism instead of one task decoding the whole stream.
  private val spillCache = scala.collection.concurrent.TrieMap[String, Vector[String]]()
  @volatile private var spillRootCreated = false
  /** Spill dir if one was materialized (spec hook for stop() cleanup). */
  private[server] def spillRootPath: Option[java.nio.file.Path] =
    if (spillRootCreated) Some(spillRoot) else None
  private lazy val spillRoot = {
    val p = java.nio.file.Files.createTempDirectory("graft-qsplit")
    p.toFile.deleteOnExit()
    spillRootCreated = true
    p
  }

  /** Run the query ONCE and spill it partition-parallel to .arrows part
    * files (each registered under /files). Cached until re-register;
    * shared by /qsplit and the dissociated channels. Serialized per
    * name: concurrent first requests (e.g. a client opening both
    * dissociated channels at once) must not race two overwrites into
    * the same spill directory. */
  private val spillLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def ensureSpilled(name: String, dfFn: () => DataFrame): Vector[String] =
    spillLocks.computeIfAbsent(name, _ => new Object).synchronized {
    spillCache.getOrElseUpdate(name, {
      val dir = spillRoot.resolve(name).toFile
      if (dir.exists) dir.listFiles().foreach(_.delete())
      dfFn().write.format("arrows").mode("overwrite").save(dir.getPath)
      dir.listFiles().filter(_.getName.endsWith(".arrows")).sortBy(_.getName)
        .toVector.map { f =>
          val key = s"$name/${f.getName}"
          registerFile(key, f.toPath)
          key
        }
    })
  }

  server.createContext("/qsplit/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/qsplit/")
    datasets.get(name) match {
      case None => sendText(exchange, 404, s"no dataset $name")
      case Some(dfFn) =>
        val parts = ensureSpilled(name, dfFn)
        val uris = parts.map(k => s"""{"uri": "$baseUrl/files/$k"}""").mkString(",\n  ")
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        sendText(exchange, 200, s"""{"arrow_stream_files": [\n  $uris\n]}""")
    }
  })

  // ------------------------------------------------------------------
  // batch-offset index for ranged-parallel clients: the stream format
  // has no footer, so the server (which can afford one parse at
  // registration) publishes message boundaries
  private val offsetsCache = scala.collection.concurrent.TrieMap[String, String]()

  server.createContext("/offsets/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/offsets/")
    files.get(name) match {
      case None => sendText(exchange, 404, s"no file $name")
      case Some(p) =>
        // parse once per file, not once per request — and only the
        // encapsulation HEADERS of it: bodies are lseek-skipped, the
        // same move the r13 dissociated metadata channel made. The old
        // readAllBytes+splitStream form re-read the WHOLE dataset and
        // allocated it on-heap per part (a 3.2 GB serve = 3.2 GB of
        // humongous allocations just to learn ~24k message boundaries);
        // the index is O(#batches), so building it must be too. This
        // runs on the main DSv2 read path (probeRanges fetches /offsets
        // per part before the ranged fetch), not just on probes.
        val body = offsetsCache.getOrElseUpdate(name, {
          val total = java.nio.file.Files.size(p)
          val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
            java.nio.file.Files.newInputStream(p), 1 << 16))
          try {
            var off = 0L
            var schemaEnd = 0L
            val spans = new StringBuilder
            var n = 0
            var done = false
            while (!done) {
              val marker =
                try in.readInt()
                catch { case _: java.io.EOFException => done = true; 0 }
              if (!done) {
                require(marker == -1, s"expected continuation marker in $name at $off")
                val metaLen = Integer.reverseBytes(in.readInt())
                if (metaLen == 0) done = true // EOS
                else {
                  val header = new Array[Byte](metaLen)
                  in.readFully(header)
                  val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(
                    java.nio.ByteBuffer.wrap(header).order(java.nio.ByteOrder.LITTLE_ENDIAN))
                  val bodyLen = msg.bodyLength()
                  in.skipNBytes(bodyLen)
                  val end = off + 8 + metaLen + bodyLen
                  if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.Schema)
                    schemaEnd = end
                  else {
                    if (n > 0) spans.append(',')
                    spans.append('[').append(off).append(',').append(end).append(']')
                    n += 1
                  }
                  off = end
                }
              }
            }
            s"""{"schema_end": $schemaEnd, "total": $total, "batches": [$spans]}"""
          } finally in.close()
        })
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        sendText(exchange, 200, body)
    }
  })

  server.createContext("/files/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/files/")
    files.get(name) match {
      case None => sendText(exchange, 404, s"no file $name")
      case Some(p) =>
        val bytes = java.nio.file.Files.size(p)
        val rh = exchange.getResponseHeaders
        rh.set("Content-Type", Negotiation.ArrowMime)
        rh.set("Accept-Ranges", "bytes")
        val range = Option(exchange.getRequestHeaders.getFirst("Range"))
        // RFC 9110 §14: clamp end to size-1; suffix ranges larger than
        // the file cover the whole file; syntactically or semantically
        // unsatisfiable ranges → 416 with the */size form.
        def unsatisfiable(): Unit = {
          exchange.getResponseHeaders.set("Content-Range", s"bytes */$bytes")
          sendText(exchange, 416, "unsatisfiable range")
        }
        range match {
          case Some(r) if r.startsWith("bytes=") &&
              !r.stripPrefix("bytes=").matches("(\\d{0,18}-\\d{1,18}|\\d{1,18}-)") =>
            unsatisfiable()
          case Some(r) if r.startsWith("bytes=") =>
            val Array(a, b) = r.stripPrefix("bytes=").split("-", 2)
            val start = if (a.isEmpty) math.max(0L, bytes - b.toLong) else a.toLong
            val end = if (a.isEmpty || b.isEmpty) bytes - 1
                      else math.min(b.toLong, bytes - 1)
            if (start > end || start >= bytes) unsatisfiable()
            else {
              val len = end - start + 1
              rh.set("Content-Range", s"bytes $start-$end/$bytes")
              exchange.sendResponseHeaders(206, len)
              val out = exchange.getResponseBody
              val ch = java.nio.file.Files.newByteChannel(p)
              try {
                ch.position(start)
                val buf = java.nio.ByteBuffer.allocate(64 * 1024)
                var remaining = len
                while (remaining > 0) {
                  buf.clear(); buf.limit(math.min(buf.capacity(), remaining).toInt)
                  val n = ch.read(buf)
                  if (n < 0) remaining = 0
                  else { out.write(buf.array(), 0, n); remaining -= n }
                }
              } finally { ch.close(); out.close() }
            }
          case _ =>
            exchange.sendResponseHeaders(200, bytes)
            val out = exchange.getResponseBody
            java.nio.file.Files.copy(p, out)
            out.close()
        }
    }
  })

  // ------------------------------------------------------------------
  /** Spool an Arrow IPC body to a .arrows artifact — the bytes stream
    * straight to disk (O(64 KiB) driver memory, never a Vector[Row]),
    * then one batch-at-a-time pass counts rows. Returns (path, rows,
    * columns). */
  private def spoolIngest(name: String, in: java.io.InputStream)
      : (java.nio.file.Path, Long, Int) = {
    val dir = spillRoot.resolve("ingest")
    java.nio.file.Files.createDirectories(dir)
    val path = dir.resolve(
      s"$name-${java.util.UUID.randomUUID.toString.take(8)}.arrows")
    java.nio.file.Files.copy(in, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val alloc = ArrowBridge.newAllocator("ingest-count")
    val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(path), 1 << 16),
      alloc, org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
    try {
      val cols = rdr.getVectorSchemaRoot.getSchema.getFields.size
      var rows = 0L
      while (rdr.loadNextBatch()) rows += rdr.getVectorSchemaRoot.getRowCount
      (path, rows, cols)
    } finally { rdr.close(); alloc.close() }
  }

  /** Expose a spooled artifact as dataset + temp view + static file —
    * reads go through the DSv2 source, not driver memory. */
  private def registerSpooled(name: String, path: java.nio.file.Path): Unit = {
    registerFile(s"$name.arrows", path)
    spark.read.format("arrows").load(path.toString).createOrReplaceTempView(name)
    register(name, spark.table(name))
  }

  server.createContext("/ingest/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/ingest/")
    if (exchange.getRequestMethod != "POST") sendText(exchange, 405, "POST only")
    else {
      val (path, rows, cols) = spoolIngest(name, exchange.getRequestBody)
      registerSpooled(name, path)
      sendText(exchange, 200,
        s"""{"name":"$name","rows":$rows,"columns":$cols}""")
    }
  })

  // ------------------------------------------------------------------
  // multipart/form-data POST ingest: JSON metadata part + Arrow stream
  // part (http/post_multipart/README.md:20-22 — spec-only in the
  // reference; implemented here with the streaming boundary scanner)
  server.createContext("/ingest-multipart/", exchange => safely(exchange) {
    val name = exchange.getRequestURI.getPath.stripPrefix("/ingest-multipart/")
    val ct = Option(exchange.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    if (exchange.getRequestMethod != "POST") sendText(exchange, 405, "POST only")
    else if (!ct.startsWith("multipart/")) sendText(exchange, 400, "multipart body required")
    else {
      val boundary = ct.split("boundary=")(1).stripPrefix("\"").stripSuffix("\"")
      var meta = "{}"
      var spooled: Option[(java.nio.file.Path, Long, Int)] = None
      MultipartStream.parse(exchange.getRequestBody, boundary) { part =>
        part.headers.getOrElse("content-type", "") match {
          case Negotiation.ArrowMime =>
            // the Arrow part streams straight to disk, like /ingest/
            spooled = Some(spoolIngest(name, part.body))
          case "application/json" =>
            meta = new String(part.body.readAllBytes(), UTF_8)
          case _ => () // ignore unknown parts
        }
      }
      spooled match {
        case None => sendText(exchange, 400, "no arrow part in body")
        case Some((path, rows, cols)) =>
          registerSpooled(name, path)
          sendText(exchange, 200,
            s"""{"name":"$name","rows":$rows,"columns":$cols,"metadata":$meta}""")
      }
    }
  })

  // ------------------------------------------------------------------
  // dissociated IPC: discovery + metadata/body channels (the reference's
  // dual-location FlightInfo + AM/tagged streams, cudf-flight-server.cc
  // :96-104,138-182,227-258, re-expressed over HTTP). Channels serve
  // from the SAME spilled artifacts as /qsplit: the query runs once
  // (partition-parallel, through the DSv2 writer), then each channel is
  // a sequential O(one batch) pass over the part files — meta/body
  // sequence pairing is consistent by construction, with no
  // plan-determinism premise and no second query run. A dataset that
  // spills to zero part files (empty result) falls back to the direct
  // chunk-relay path so a schema frame is still served.

  /** Split a dissoc path remainder into (dataset, optional part index):
    * `{name}` addresses the whole dataset, `{name}/{i}` one spilled
    * part (per-part channel pairs are the dissociated scan's unit of
    * parallelism — the reference FlightInfo's plural endpoint list,
    * cudf-flight-server.cc:349-365). */
  private def dissocTarget(path: String): (String, Option[Int]) = {
    val k = path.lastIndexOf('/')
    if (k > 0 && path.length > k + 1 && path.drop(k + 1).forall(_.isDigit))
      (path.take(k), Some(path.drop(k + 1).toInt))
    else (path, None)
  }

  server.createContext("/dissoc/info/", exchange => safely(exchange) {
    val (name, idx) = dissocTarget(
      exchange.getRequestURI.getPath.stripPrefix("/dissoc/info/"))
    datasets.get(name) match {
      case None => sendText(exchange, 404, s"no dataset $name")
      case Some(dfFn) =>
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        val n = ensureSpilled(name, dfFn).size
        idx match {
          case Some(i) if i >= n =>
            sendText(exchange, 404, s"no part $i of $name ($n parts)")
          case Some(i) =>
            sendText(exchange, 200,
              s"""{"ticket": "$name/$i", "locations": [
                 |  {"uri": "$baseUrl/dissoc/meta/$name/$i", "channel": "metadata"},
                 |  {"uri": "$baseUrl/dissoc/data/$name/$i", "channel": "body"}
                 |]}""".stripMargin)
          case None =>
            // whole-dataset channels stay first (single-pair clients);
            // a multi-part spill additionally publishes one entry per
            // part so a parallel scan plans one task per pair. Each
            // entry carries its channel pair INLINE (metadata/body) so
            // a planned task opens its two streams without a per-part
            // discovery round-trip; the per-part info URI stays for
            // indirection-style clients.
            val parts =
              if (n <= 1) ""
              else (0 until n)
                .map(i => s"""{"uri": "$baseUrl/dissoc/info/$name/$i", """ +
                  s""""metadata": "$baseUrl/dissoc/meta/$name/$i", """ +
                  s""""body": "$baseUrl/dissoc/data/$name/$i"}""")
                .mkString(""", "parts": [""", ", ", "]")
            sendText(exchange, 200,
              s"""{"ticket": "$name", "locations": [
                 |  {"uri": "$baseUrl/dissoc/meta/$name", "channel": "metadata"},
                 |  {"uri": "$baseUrl/dissoc/data/$name", "channel": "body"}
                 |]$parts}""".stripMargin)
        }
    }
  })

  private def spilledPaths(name: String, dfFn: () => DataFrame): Vector[java.nio.file.Path] =
    ensureSpilled(name, dfFn).map(k => files(k))

  /** Per-part channel-length summary (r15): exact byte lengths of the
    * dissociated meta/body channel framings of one spilled part, from
    * the same O(#batches) header-seek scan /offsets uses (bodies are
    * lseek-skipped). Why: the JDK HttpServer sends unknown-length
    * responses CHUNKED with a hard-coded 4 KiB chunk size — ~240k chunk
    * writes (server) and chunk-header parses (client) per GB, and the
    * r15 fan-out thread dumps show the client pinned in
    * ChunkedInputStream.processRaw across the 2×32 concurrent channel
    * streams. Publishing an exact Content-Length turns both sides into
    * plain fixed-length socket I/O — no chunk framing at all — exactly
    * how the /files/ static handler already serves. Cached per part
    * file; invalidated with the offsets cache on re-registration. */
  private val chanStatCache =
    scala.collection.concurrent.TrieMap[String, ChanStat]()
  private case class ChanStat(schemaFramed: Long, metaTotal: Long, bodyTotal: Long)

  private def chanStats(key: String): ChanStat =
    chanStatCache.getOrElseUpdate(key, {
      val p = files(key)
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(p), 1 << 16))
      try {
        var schemaFramed = 0L
        var metaTotal = 0L
        var bodyTotal = 0L
        var done = false
        while (!done) {
          val marker =
            try in.readInt()
            catch { case _: java.io.EOFException => done = true; 0 }
          if (!done) {
            require(marker == -1, s"expected continuation marker in $key")
            val metaLen = Integer.reverseBytes(in.readInt())
            if (metaLen == 0) done = true // EOS
            else {
              val header = new Array[Byte](metaLen)
              in.readFully(header)
              val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(
                java.nio.ByteBuffer.wrap(header).order(java.nio.ByteOrder.LITTLE_ENDIAN))
              val bodyLen = msg.bodyLength()
              in.skipNBytes(bodyLen)
              if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.Schema)
                schemaFramed = 8L + metaLen
              else {
                // meta frame: [type:1][seq:4][len:4][8-byte prefix + header]
                metaTotal += 9L + 8L + metaLen
                // body frame: [seq:4][len:4][body][pad to 8]
                bodyTotal += 8L + bodyLen + ((8 - (bodyLen % 8)) % 8)
              }
            }
          }
        }
        ChanStat(schemaFramed, metaTotal, bodyTotal)
      } finally in.close()
    })

  /** Exact meta-channel byte length of a set of spilled parts: one
    * schema frame (first part's), every batch meta frame, one EOS. */
  private def metaChannelLen(keys: Seq[String]): Long =
    (9L + chanStats(keys.head).schemaFramed) +
      keys.map(chanStats(_).metaTotal).sum + 9L

  private def bodyChannelLen(keys: Seq[String]): Long =
    keys.map(chanStats(_).bodyTotal).sum

  // Both channel handlers publish an EXACT Content-Length computed from
  // the cached per-part header scan (see chanStats): a known length
  // makes the JDK server write the frames straight to the socket
  // instead of re-framing them into hard-coded 4 KiB HTTP chunks, and
  // the client reads a plain fixed-length stream with no chunk parsing
  // — the r15 fan-out profile showed 2×32 concurrent client readers
  // pinned in ChunkedInputStream chunk decode. A 64 KiB buffer
  // coalesces the per-frame header writes (the meta channel is ~4 small
  // writes per batch otherwise). The zero-spill fallback (dynamic
  // serve) keeps the chunked path — its length is unknowable up front.
  server.createContext("/dissoc/meta/", exchange => safely(exchange) {
    val (name, idx) = dissocTarget(
      exchange.getRequestURI.getPath.stripPrefix("/dissoc/meta/"))
    datasets.get(name) match {
      case None => sendText(exchange, 404, s"no dataset $name")
      case Some(dfFn) =>
        val keys = ensureSpilled(name, dfFn)
        if (idx.exists(_ >= keys.size))
          sendText(exchange, 404, s"no part ${idx.get} of $name (${keys.size} parts)")
        else {
          exchange.getResponseHeaders.set("Content-Type", "application/octet-stream")
          val serveKeys = idx.map(i => Vector(keys(i))).getOrElse(keys)
          if (serveKeys.nonEmpty) {
            exchange.sendResponseHeaders(200, metaChannelLen(serveKeys))
            val out = new java.io.BufferedOutputStream(exchange.getResponseBody, 1 << 16)
            graft.dissociated.Dissociated.streamMetadataFromFiles(
              serveKeys.map(files(_)), out)
            out.close()
          } else {
            exchange.sendResponseHeaders(200, 0)
            val out = exchange.getResponseBody
            graft.dissociated.Dissociated.streamMetadataChannel(dfFn(), out)
            out.close()
          }
        }
    }
  })

  server.createContext("/dissoc/data/", exchange => safely(exchange) {
    val (name, idx) = dissocTarget(
      exchange.getRequestURI.getPath.stripPrefix("/dissoc/data/"))
    datasets.get(name) match {
      case None => sendText(exchange, 404, s"no dataset $name")
      case Some(dfFn) =>
        val keys = ensureSpilled(name, dfFn)
        if (idx.exists(_ >= keys.size))
          sendText(exchange, 404, s"no part ${idx.get} of $name (${keys.size} parts)")
        else {
          exchange.getResponseHeaders.set("Content-Type", "application/octet-stream")
          // out-of-order delivery within windows of 8 (stays under the
          // client's bounded reassembly window)
          val serveKeys = idx.map(i => Vector(keys(i))).getOrElse(keys)
          val len = if (serveKeys.nonEmpty) bodyChannelLen(serveKeys) else 0L
          if (serveKeys.nonEmpty && len > 0) {
            exchange.sendResponseHeaders(200, len)
            val out = new java.io.BufferedOutputStream(exchange.getResponseBody, 1 << 16)
            graft.dissociated.Dissociated.streamBodyFromFiles(
              serveKeys.map(files(_)), out)
            out.close()
          } else if (serveKeys.nonEmpty) {
            exchange.sendResponseHeaders(200, -1) // zero batches: empty body
            exchange.getResponseBody.close()
          } else {
            exchange.sendResponseHeaders(200, 0)
            val out = exchange.getResponseBody
            graft.dissociated.Dissociated.streamBodyChannel(dfFn(), out)
            out.close()
          }
        }
    }
  })

  // ------------------------------------------------------------------
  // indirect listing (JSON-of-URIs), reference get_indirect/server.py:23-44
  server.createContext("/", exchange => safely(exchange) {
    if (exchange.getRequestURI.getPath != "/") sendText(exchange, 404, "not found")
    else {
      val uris = files.keys.toSeq.sorted.map(n =>
        s"""{"uri": "$baseUrl/files/$n"}""").mkString(",\n  ")
      val body = s"""{"arrow_stream_files": [\n  $uris\n]}"""
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      sendText(exchange, 200, body)
    }
  })

  private def sendText(exchange: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    if (!exchange.getResponseHeaders.containsKey("Content-Type"))
      exchange.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    exchange.sendResponseHeaders(code, b.length)
    val out = exchange.getResponseBody
    out.write(b); out.close()
  }

  private def safely(exchange: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case _: IOException => // client went away mid-stream
      case e: Exception =>
        try sendText(exchange, 500, s"error: ${e.getMessage}")
        catch { case _: IOException => () }
    } finally exchange.close()

  def start(): ArrowHttpServer = { server.start(); this }
  def stop(): Unit = {
    server.stop(0); pool.shutdownNow()
    // Reclaim the qsplit spill artifacts NOW, not at JVM exit:
    // deleteOnExit() cannot remove non-empty directories, so a
    // long-lived process (or a bench looping servers) would leak one
    // ~payload-sized dir per server instance — 25 leaked 100M-loop
    // spills filled the round-7 build box's disk before this cleanup.
    if (spillRootCreated) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(spillRoot.toFile)
      spillCache.clear()
    }
  }
}

object ArrowHttpServer {
  /** Cap on eagerly-collected dictionary values per column in
    * [[ArrowHttpServer.registerDict]]; beyond this the value set is no
    * longer "small" and must stream via registerDictDelta. */
  val MaxDictValues: Int = 4096

  /** Set TCP_NODELAY for all [[com.sun.net.httpserver.HttpServer]]
    * response sockets. The JDK server reads `sun.net.httpserver.nodelay`
    * once in ServerConfig's static init, so this must run before the
    * FIRST HttpServer.create in the JVM — hence the call from the
    * constructor, idempotently, ahead of create().
    *
    * Hardening (r12 ADVICE): the lazy set is a silent no-op when some
    * other component created a com.sun HttpServer first (ServerConfig's
    * static init already read the property). The primary defense is now
    * `-Dsun.net.httpserver.nodelay=true` in build.sbt's javaOptions —
    * set before ANY class init in every forked run/test JVM — with this
    * constructor-path set kept for non-sbt embedders, and a loud WARN
    * when the property was explicitly overridden to something else. */
  @volatile private var noDelayChecked = false
  private[server] def ensureNoDelay(): Unit = {
    val v = System.getProperty("sun.net.httpserver.nodelay")
    if (v == null) System.setProperty("sun.net.httpserver.nodelay", "true")
    else if (v != "true" && !noDelayChecked) {
      // explicit external override — say so instead of silently stalling
      System.err.println(s"[arrow-http] WARN: sun.net.httpserver.nodelay=$v " +
        "— TCP_NODELAY disabled externally; expect ~65 ms/request Nagle stalls")
    }
    noDelayChecked = true
  }
}

/** Coalesces writes to >= minSize before forwarding (the reference's
  * 64 KiB floor), force-flushing the first chunk for low TTFB. */
final class CoalescingOutputStream(under: OutputStream, minSize: Int,
    flushFirst: Boolean) extends OutputStream {
  private val buf = new java.io.ByteArrayOutputStream(minSize * 2)
  private var first = flushFirst

  override def write(b: Int): Unit = { buf.write(b); maybeFlush() }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    buf.write(b, off, len); maybeFlush()
  }
  private def maybeFlush(): Unit =
    if (first || buf.size() >= minSize) { forward(); first = false }
  private def forward(): Unit = if (buf.size() > 0) {
    buf.writeTo(under); buf.reset(); under.flush()
  }
  override def flush(): Unit = { forward(); under.flush() }
  override def close(): Unit = { forward(); under.close() }
}

final class CountingOutputStream(under: OutputStream) extends OutputStream {
  var count: Long = 0
  override def write(b: Int): Unit = { under.write(b); count += 1 }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    under.write(b, off, len); count += len
  }
  override def flush(): Unit = under.flush()
  override def close(): Unit = () // parts share the exchange stream
}
