package graft.server

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.arrow.ArrowBridge
import graft.datagen.Generators

class ArrowHttpSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("arrow-http-spec", "4").getOrCreate()

  lazy val server: ArrowHttpServer = {
    val s = new ArrowHttpServer(spark)
    s.register("ticker", Generators.ticker(spark, 5000, 2))
    s.register("bench", Generators.flightBench(spark, 10000, 2))
    s.start()
  }

  private def get(path: String, headers: Map[String, String] = Map.empty)
      : (Int, Map[String, String], Array[Byte]) = {
    val conn = URI.create(server.baseUrl + path).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val code = conn.getResponseCode
    val body = new ByteArrayOutputStream()
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    if (in != null) {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n != -1) { body.write(buf, 0, n); n = in.read(buf) }
      in.close()
    }
    val hs = conn.getHeaderFields.entrySet().iterator()
    val hmap = scala.collection.mutable.Map[String, String]()
    while (hs.hasNext) {
      val e = hs.next()
      if (e.getKey != null) hmap(e.getKey.toLowerCase) = e.getValue.get(0)
    }
    (code, hmap.toMap, body.toByteArray)
  }

  test("GET /q streams a decodable Arrow stream with correct rows") {
    val (code, headers, body) = get("/q/ticker")
    assert(code === 200)
    assert(headers("content-type").startsWith(Negotiation.ArrowMime))
    val res = ArrowBridge.read(new java.io.ByteArrayInputStream(body))
    val rows = res.rows.toVector
    res.close()
    assert(rows.size === 5000)
    assert(rows.forall(_.getLong(1) % 100 == 0))
  }

  test("DSv2 url read: format(arrows) over our own server") {
    val df = spark.read.format("arrows")
      .option("url", s"${server.baseUrl}/q/bench").load()
    assert(df.schema.fieldNames.toSeq === Seq("a", "b", "c", "d"))
    assert(df.count() === 10000)
    // values equal the generated frame
    val want = Generators.flightBench(spark, 10000, 2)
    assert(df.except(want).count() === 0 && want.except(df).count() === 0)
  }

  test("qsplit: dynamic serve spills to parts; DSv2 read fans out N partitions") {
    val (code, _, body) = get("/qsplit/bench")
    assert(code === 200)
    val uris = "\"uri\": \"([^\"]+)\"".r.findAllMatchIn(new String(body, UTF_8))
      .map(_.group(1)).toVector
    assert(uris.size === 2, s"expected one URI per partition, got $uris") // 2 input partitions
    // the split-aware read plans one partition per part file and
    // returns the same rows as the single-stream read
    val df = spark.read.format("arrows")
      .option("url", s"${server.baseUrl}/q/bench").load()
    assert(df.rdd.getNumPartitions === 2, df.rdd.getNumPartitions.toString)
    assert(df.count() === 10000)
    val single = spark.read.format("arrows")
      .option("split", "false")
      .option("url", s"${server.baseUrl}/q/bench").load()
    assert(single.rdd.getNumPartitions === 1)
    assert(df.except(single).count() === 0 && single.except(df).count() === 0)
  }

  test("negotiation: zstd HTTP coding round-trips") {
    val (code, headers, body) = get("/q/ticker", Map("Accept-Encoding" -> "zstd"))
    assert(code === 200)
    assert(headers.get("content-encoding").contains("zstd"))
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(body))
    val res = ArrowBridge.read(in)
    assert(res.rows.size === 5000)
    res.close()
  }

  test("zstd parallel frames: decompressed bytes identical to identity serve") {
    // r15: the zstd serve compresses each relay chunk as an independent
    // frame on JVM threads (writeParallelZstd). Concatenated-frame decode
    // must yield EXACTLY the identity stream — same schema header, same
    // single leading dictionary (duplicates stripped), same partition
    // order, one EOS. A dict-encoded multi-partition dataset covers the
    // trickiest path.
    server.registerDict("ticker_dict", Generators.ticker(spark, 5000, 2), Seq("ticker"))
    val (ci, _, identity) = get("/q/ticker_dict", Map("Accept-Encoding" -> "identity"))
    val (cz, zh, z) = get("/q/ticker_dict", Map("Accept-Encoding" -> "zstd"))
    assert(ci === 200 && cz === 200)
    assert(zh.get("content-encoding").contains("zstd"))
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(z))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n != -1) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    assert(java.util.Arrays.equals(bos.toByteArray, identity),
      s"zstd-decoded ${bos.size} B != identity ${identity.length} B")
  }

  test("negotiation: gzip HTTP coding round-trips (matrix completeness)") {
    val (code, headers, body) = get("/q/ticker", Map("Accept-Encoding" -> "gzip"))
    assert(code === 200)
    assert(headers.get("content-encoding").contains("gzip"))
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
    val res = ArrowBridge.read(in)
    assert(res.rows.size === 5000)
    res.close()
  }

  test("negotiation: br coding round-trips; client q ranks it over gzip") {
    // the reference client's explicit-br case (client.py:89-96): a
    // higher client q on br must beat gzip even though the server ranks
    // zstd first among EQUALS — zstd is absent from this Accept-Encoding
    val (code, headers, body) = get("/q/ticker",
      Map("Accept-Encoding" -> "gzip;q=0.9, br"))
    assert(code === 200)
    assert(headers.get("content-encoding").contains("br"))
    val in = new Brotli.BrotliStoredInputStream(new java.io.ByteArrayInputStream(body))
    val res = ArrowBridge.read(in)
    assert(res.rows.size === 5000)
    res.close()
  }

  test("negotiation: server preference order is zstd > br > gzip at equal q") {
    val (code, headers, _) = get("/q/ticker",
      Map("Accept-Encoding" -> "br, gzip, zstd"))
    assert(code === 200)
    assert(headers.get("content-encoding").contains("zstd"))
  }

  test("DSv2 read decodes a br-coded serve end-to-end") {
    val df = spark.read.format("arrows")
      .option("url", s"${server.baseUrl}/q/ticker")
      .option("acceptEncoding", "br")
      .option("split", "false").load()
    assert(df.count() === 5000)
  }

  test("negotiation: IPC codecs param wins and is echoed") {
    val (code, headers, body) = get("/q/ticker",
      Map("Accept" -> s"""${Negotiation.ArrowMime}; codecs="zstd, lz4""""))
    assert(code === 200)
    assert(headers("content-type").contains("codecs=\"zstd\""))
    assert(!headers.contains("content-encoding"))
    val res = ArrowBridge.read(new java.io.ByteArrayInputStream(body))
    assert(res.rows.size === 5000)
    res.close()
  }

  test("negotiation: identity;q=0 without alternatives yields 406") {
    // "compress" is genuinely unsupported (br no longer is — it moved
    // into the coding matrix when the stored-mode codec landed)
    val (code, _, body) = get("/q/ticker",
      Map("Accept-Encoding" -> "identity;q=0, compress"))
    assert(code === 406)
    assert(new String(body, UTF_8).contains("no acceptable"))
  }

  test("multipart/mixed: four parts parse by streaming scanner; digest verifies") {
    val (code, headers, body) = get("/multipart/ticker")
    assert(code === 200)
    val ct = headers("content-type")
    assert(ct.startsWith("multipart/mixed"))
    val boundary = ct.split("boundary=\"")(1).stripSuffix("\"")
    var kinds = Vector[String]()
    var arrowRows = -1
    var json = ""
    var footnotes = ""
    var digestLine = ""
    var arrowSha = ""
    MultipartStream.parse(new java.io.ByteArrayInputStream(body), boundary) { part =>
      val ct = part.headers("content-type")
      kinds :+= ct
      if (ct == "application/json")
        json = new String(part.body.readAllBytes(), UTF_8)
      else if (ct == Negotiation.ArrowMime) {
        // hash the part's exact bytes AND decode them (tee via buffer)
        val raw = part.body.readAllBytes()
        arrowSha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(raw).map("%02x".format(_)).mkString
        val res = ArrowBridge.read(new java.io.ByteArrayInputStream(raw))
        arrowRows = res.rows.size
        res.close()
      } else if (ct == "application/vnd.graft.digest")
        digestLine = new String(part.body.readAllBytes(), UTF_8)
      else footnotes = new String(part.body.readAllBytes(), UTF_8)
    }
    assert(kinds === Vector("application/json", Negotiation.ArrowMime, "text/plain",
      "application/vnd.graft.digest"))
    assert(json.contains(""""name":"ticker""""))
    assert(arrowRows === 5000)
    assert(footnotes.contains("record batches sent"))
    assert(footnotes.contains("seconds elapsed"))
    // the digest part names the sha256 of the Arrow part's exact bytes
    assert(digestLine.startsWith(s"sha256:$arrowSha bytes:"), digestLine)
  }

  test("registerDict refuses high-cardinality columns, pointing at the delta path") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // one distinct value per row — far over MaxDictValues
    val wide = Generators.flightBench(spark, ArrowHttpServer.MaxDictValues + 64, 2)
      .select(concat(lit("v"), col("a")).as("k"))
    val e = intercept[IllegalArgumentException] {
      server.registerDict("too_wide", wide, Seq("k"))
    }
    assert(e.getMessage.contains("registerDictDelta"))
    // the failed register must not leave a half-registered dataset
    assert(get("/q/too_wide")._1 === 404)
  }

  test("dictionary-encoded serving: smaller wire, decodes via bridge and DSv2") {
    val df = Generators.ticker(spark, 5000, 2)
    server.registerDict("ticker_dict", df, Seq("ticker"))
    val (code, _, body) = get("/q/ticker_dict")
    assert(code === 200)
    val (_, _, plain) = get("/q/ticker")
    assert(body.length < plain.length) // dictionary indices < repeated strings
    val res = ArrowBridge.read(new java.io.ByteArrayInputStream(body))
    val rows = res.rows.toVector
    res.close()
    assert(rows.size === 5000)
    assert(rows.map(_.getString(0)).distinct.size === 60)
    // DSv2 row-reader path decodes dictionaries too
    val viaSource = spark.read.format("arrows")
      .option("split", "false")
      .option("url", s"${server.baseUrl}/q/ticker_dict").load()
    assert(viaSource.select("ticker").distinct().count() === 60)
    assert(viaSource.count() === 5000)

    // the parallel relay keeps exactly ONE dictionary message on the
    // wire even though both partitions serialize one
    def readIntLE(a: Array[Byte], off: Int): Int =
      (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
        ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
    var off = 0
    var dicts = 0
    var batchMsgs = 0
    var done = false
    while (!done && off < body.length) {
      assert(readIntLE(body, off) === -1)
      val metaLen = readIntLE(body, off + 4)
      if (metaLen == 0) done = true
      else {
        val header = java.nio.ByteBuffer.wrap(body, off + 8, metaLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
        msg.headerType() match {
          case org.apache.arrow.flatbuf.MessageHeader.DictionaryBatch => dicts += 1
          case org.apache.arrow.flatbuf.MessageHeader.RecordBatch => batchMsgs += 1
          case _ => ()
        }
        off += 8 + metaLen + msg.bodyLength().toInt
      }
    }
    assert(dicts === 1, s"expected one dictionary message, saw $dicts")
    assert(batchMsgs >= 2, s"expected parallel per-partition batches, saw $batchMsgs")
  }

  test("delta-dictionary serving: growing dict, no pre-scan, DSv2-decodable") {
    // batches see new tickers as the stream progresses, so the serve
    // must emit delta dictionary messages mid-stream (one full + >= 1
    // delta) — the single-pass path with no distinct() pre-scan
    val df = Generators.ticker(spark, 5000, 2)
      .orderBy("ticker").coalesce(1) // value set grows across batches
    server.registerDictDelta("ticker_delta", df, Seq("ticker"))
    val (code, _, body) = get("/q/ticker_delta")
    assert(code === 200)

    def readIntLE(a: Array[Byte], off: Int): Int =
      (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
        ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
    var off = 0
    var fullDicts = 0
    var deltaDicts = 0
    var done = false
    while (!done && off < body.length) {
      assert(readIntLE(body, off) === -1)
      val metaLen = readIntLE(body, off + 4)
      if (metaLen == 0) done = true
      else {
        val header = java.nio.ByteBuffer.wrap(body, off + 8, metaLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
        if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.DictionaryBatch) {
          val db = msg.header(new org.apache.arrow.flatbuf.DictionaryBatch())
            .asInstanceOf[org.apache.arrow.flatbuf.DictionaryBatch]
          if (db.isDelta) deltaDicts += 1 else fullDicts += 1
        }
        off += 8 + metaLen + msg.bodyLength().toInt
      }
    }
    assert(fullDicts === 1, s"expected one full dictionary, saw $fullDicts")
    assert(deltaDicts >= 1, s"expected mid-stream delta dictionaries, saw $deltaDicts")

    // bridge reader decodes (arrow-java appends deltas)
    val res = ArrowBridge.read(new java.io.ByteArrayInputStream(body))
    val rows = res.rows.toVector
    res.close()
    assert(rows.size === 5000)
    assert(rows.map(_.getString(0)).distinct.size === 60)

    // DSv2 path decodes it too
    val viaSource = spark.read.format("arrows")
      .option("split", "false")
      .option("url", s"${server.baseUrl}/q/ticker_delta").load()
    assert(viaSource.select("ticker").distinct().count() === 60)
    assert(viaSource.count() === 5000)
  }

  test("POST /ingest round-trips a stream into a temp view") {
    val df = Generators.ticker(spark, 500, 1)
    val bytes = new ByteArrayOutputStream()
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), bytes)
    val conn = URI.create(s"${server.baseUrl}/ingest/posted").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(bytes.toByteArray)
    conn.getOutputStream.close()
    assert(conn.getResponseCode === 200)
    val resp = new String(conn.getInputStream.readAllBytes(), UTF_8)
    assert(resp.contains(""""rows":500"""))
    assert(spark.table("posted").count() === 500)
  }

  test("POST /ingest streams to disk: multi-batch body, no driver buffering") {
    // 50k rows = many 4096-row batches — bigger than any single batch
    // buffer; the handler spools to a .arrows artifact and the view
    // reads back through the DSv2 source.
    val df = Generators.ticker(spark, 50000, 2)
    val bytes = new ByteArrayOutputStream()
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), bytes)
    val conn = URI.create(s"${server.baseUrl}/ingest/bigpost").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setChunkedStreamingMode(1 << 16) // stream the request too
    conn.getOutputStream.write(bytes.toByteArray)
    conn.getOutputStream.close()
    assert(conn.getResponseCode === 200)
    val resp = new String(conn.getInputStream.readAllBytes(), UTF_8)
    assert(resp.contains(""""rows":50000"""), resp)
    assert(spark.table("bigpost").count() === 50000)
    // the spooled artifact is a served /files/ citizen (ranges + offsets)
    val (fc, fh, _) = get("/files/bigpost.arrows")
    assert(fc === 200 && fh.get("accept-ranges").contains("bytes"))
    val (oc, _, obody) = get("/offsets/bigpost.arrows")
    assert(oc === 200 && new String(obody, UTF_8).contains("\"batches\""))
  }

  test("POST /ingest-multipart: JSON + Arrow parts ingest to a temp view") {
    val df = Generators.ticker(spark, 300, 1)
    val arrow = new ByteArrayOutputStream()
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), arrow)
    val boundary = "graftTestBoundary42"
    val body = new ByteArrayOutputStream()
    def part(ct: String): Unit =
      body.write(s"\r\n--$boundary\r\nContent-Type: $ct\r\n\r\n".getBytes(UTF_8))
    part("application/json")
    body.write("""{"source":"unit-test"}""".getBytes(UTF_8))
    part(Negotiation.ArrowMime)
    body.write(arrow.toByteArray)
    body.write(s"\r\n--$boundary--\r\n".getBytes(UTF_8))

    val conn = URI.create(s"${server.baseUrl}/ingest-multipart/mp_posted").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", s"""multipart/form-data; boundary="$boundary"""")
    conn.getOutputStream.write(body.toByteArray)
    conn.getOutputStream.close()
    assert(conn.getResponseCode === 200)
    val resp = new String(conn.getInputStream.readAllBytes(), UTF_8)
    assert(resp.contains(""""rows":300"""))
    assert(resp.contains(""""source":"unit-test""""))
    assert(spark.table("mp_posted").count() === 300)
  }

  test("indirect listing + ranged fetch reassembles to the full file") {
    // materialize an artifact and register it
    val df = Generators.ticker(spark, 2000, 1)
    val tmp = java.nio.file.Files.createTempFile("graft", ".arrows")
    val out = java.nio.file.Files.newOutputStream(tmp)
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), out)
    out.close()
    server.registerFile("ticker.arrows", tmp)

    val (lcode, _, listing) = get("/")
    assert(lcode === 200)
    // the listing may also carry qsplit spill artifacts — find ours
    val uris = "\"uri\": \"([^\"]+)\"".r
      .findAllMatchIn(new String(listing, UTF_8)).map(_.group(1)).toVector
    assert(uris.exists(_.endsWith("/files/ticker.arrows")), uris.mkString(", "))

    // HEAD-equivalent: full GET gives the length; then two half ranges
    val (code, headers, full) = get("/files/ticker.arrows")
    assert(code === 200)
    assert(headers.get("accept-ranges").contains("bytes"))
    val size = full.length
    val half = size / 2
    val (c1, _, part1) = get("/files/ticker.arrows", Map("Range" -> s"bytes=0-${half - 1}"))
    val (c2, _, part2) = get("/files/ticker.arrows", Map("Range" -> s"bytes=$half-"))
    assert(c1 === 206 && c2 === 206)
    assert(part1.length + part2.length === size)
    val joined = part1 ++ part2
    assert(joined.toSeq === full.toSeq)
    // concatenation is a valid stream (the get_range premise)
    val res = ArrowBridge.read(new java.io.ByteArrayInputStream(joined))
    assert(res.rows.size === 2000)
    res.close()
  }

  test("range validation: clamped ends, 416 for unsatisfiable or malformed") {
    val df = Generators.ticker(spark, 1000, 1)
    val tmp = java.nio.file.Files.createTempFile("graft-rv", ".arrows")
    val out = java.nio.file.Files.newOutputStream(tmp)
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), out)
    out.close()
    server.registerFile("rv.arrows", tmp)
    val size = java.nio.file.Files.size(tmp)

    // end beyond EOF clamps to size-1
    val (c1, h1, b1) = get("/files/rv.arrows", Map("Range" -> s"bytes=0-${size * 2}"))
    assert(c1 === 206 && b1.length === size.toInt)
    assert(h1("content-range") === s"bytes 0-${size - 1}/$size")
    // suffix larger than the file covers the whole file
    val (c2, _, b2) = get("/files/rv.arrows", Map("Range" -> s"bytes=-${size * 3}"))
    assert(c2 === 206 && b2.length === size.toInt)
    // start past EOF, inverted, and malformed ranges → 416 with */size
    for (r <- Seq(s"bytes=$size-", "bytes=500-10", "bytes=abc-def", "bytes=99999999999999999999-")) {
      val (c, h, _) = get("/files/rv.arrows", Map("Range" -> r))
      assert(c === 416, s"$r -> $c")
      assert(h("content-range") === s"bytes */$size", r)
    }
  }

  test("ranged-parallel read: offsets index splits one URL into partitions") {
    val df = Generators.ticker(spark, 20000, 1)
    val tmp = java.nio.file.Files.createTempFile("graft-ranged", ".arrows")
    val out = java.nio.file.Files.newOutputStream(tmp)
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), out,
      ArrowBridge.WriteOptions(batchSize = 1000)) // 20 batches
    out.close()
    server.registerFile("ranged.arrows", tmp)

    val url = s"${server.baseUrl}/files/ranged.arrows"
    val back = spark.read.format("arrows")
      .option("rangepartitions", "4").option("url", url).load()
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 20000)
    val want = df.agg(org.apache.spark.sql.functions.sum("price")).head().getLong(0)
    assert(back.agg(org.apache.spark.sql.functions.sum("price")).head().getLong(0) === want)
  }

  test("DSv2 file write + multi-file read round-trip with pruning") {
    val df = Generators.ticker(spark, 3000, 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-arrows").toString
    df.write.format("arrows").option("codec", "lz4").mode("overwrite").save(dir)
    val back = spark.read.format("arrows").load(dir)
    assert(back.count() === 3000)
    assert(back.select("price").distinct().count() ===
      df.select("price").distinct().count())
    // pruned read plan only materializes the required column
    val plan = back.select("price").queryExecution.executedPlan.toString
    assert(plan.contains("price"))
  }

  test("stop() reclaims the qsplit spill directory (no per-server disk leak)") {
    // deleteOnExit() cannot remove non-empty dirs, and a process that
    // loops server instances (the bench's transport loops) would leak
    // one payload-sized spill dir per instance — this filled the
    // round-7 build box (25 × 3.1 GB) before stop() learned to clean
    val s2 = new ArrowHttpServer(spark)
    s2.register("leakcheck", Generators.flightBench(spark, 1000, 2))
    s2.start()
    try {
      val conn = URI.create(s2.baseUrl + "/qsplit/leakcheck").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode === 200)
      conn.getInputStream.readAllBytes()
    } finally s2.stop()
    val root = s2.spillRootPath
    assert(root.isDefined, "qsplit never spilled — vacuous")
    assert(java.nio.file.Files.notExists(root.get),
      s"spill dir survived stop(): ${root.get}")
  }
}
