package graft.dissociated

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, CountDownLatch}

import org.apache.spark.sql.DataFrame

import graft.arrow.ArrowBridge

/** Dissociated IPC: metadata and body of each record batch travel on
  * SEPARATE channels and are reassembled by sequence number — the
  * capability of the reference's dissociated-ipc experiment
  * (cudf-flight-server.cc send_metadata_stream :138-182 /
  * send_data_stream :227-258; client reassembly
  * cudf-flight-client.cc:264-288) re-expressed over plain byte channels
  * (HTTP/TCP in place of UCX; GPU residency out of scope, SURVEY §7).
  *
  * Wire format (little-endian lengths, mirroring the reference's 5-byte
  * `[type:1][seq:u32 LE]` AM prefix):
  *   metadata channel: frames [type:1][seq:4][len:4][bytes]; type 1 =
  *     schema (seq 0), 2 = batch metadata, 0 = EOS (len = batch count)
  *   body channel: frames [seq:4][len:4][bytes], 8-byte-aligned payloads
  *     (padding included in len; the IPC body alignment rule,
  *     cudf-flight-server.cc:273-277)
  *
  * A batch's IPC encapsulation is `[0xFFFFFFFF][metaLen:4][flatbuffer]
  * [padding][body]` — the splitter cuts at the body offset, the
  * reassembler concatenates, so a rebuilt stream is byte-identical to a
  * plain Arrow IPC stream and decodes with the standard reader.
  */
object Dissociated {

  val TypeEos: Byte = 0
  val TypeSchema: Byte = 1
  val TypeBatch: Byte = 2

  /** A reassembly sink that can take OWNERSHIP of a chunk: every array
    * [[reassemble]] emits is freshly read off a channel and never
    * touched again, so a sink implementing this skips the defensive
    * copy a generic OutputStream write needs (~the whole body volume
    * in allocation + memcpy per read). `len` ≤ `chunk.length` (channel
    * padding beyond the true IPC body length is dropped). */
  trait OwnedChunkSink { def writeOwned(chunk: Array[Byte], len: Int): Unit }

  final case class Split(seq: Int, metadata: Array[Byte], body: Array[Byte])

  /** Serialize a DataFrame into (schema message, per-batch splits). */
  def split(df: DataFrame, batchSize: Int = 4096): (Array[Byte], Vector[Split]) = {
    val full = new ByteArrayOutputStream()
    ArrowBridge.write(df.schema, ArrowBridge.internalRows(df), full,
      ArrowBridge.WriteOptions(batchSize = batchSize))
    splitStream(full.toByteArray)
  }

  /** Split a pure sequence of encapsulated batch messages — a
    * writeParallel partition chunk (no schema, no EOS) — into splits
    * numbered from `startSeq`. */
  def splitChunk(chunk: Array[Byte], startSeq: Int): Vector[Split] = {
    def readIntLE(off: Int): Int =
      (chunk(off) & 0xff) | ((chunk(off + 1) & 0xff) << 8) |
        ((chunk(off + 2) & 0xff) << 16) | ((chunk(off + 3) & 0xff) << 24)
    var off = 0
    var seq = startSeq
    val splits = Vector.newBuilder[Split]
    while (off < chunk.length) {
      require(readIntLE(off) == -1, s"expected continuation marker at $off")
      val metaLen = readIntLE(off + 4)
      val msgEnd = off + 8 + metaLen
      val header = java.nio.ByteBuffer.wrap(chunk, off + 8, metaLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val bodyLen = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
        .bodyLength().toInt
      splits += Split(seq, java.util.Arrays.copyOfRange(chunk, off, msgEnd),
        java.util.Arrays.copyOfRange(chunk, msgEnd, msgEnd + bodyLen))
      seq += 1
      off = msgEnd + bodyLen
    }
    splits.result()
  }

  /** Serve a dataset's metadata channel partition-wise: the query runs
    * through the writeParallel chunk relay and each chunk is split as
    * it arrives — serving memory is O(window × chunk), independent of
    * dataset size (the r1 path cached the entire serialized stream on
    * the driver). Returns the batch count. */
  def streamMetadataChannel(df: DataFrame, out: OutputStream,
      batchSize: Int = 4096): Int = {
    val d = new DataOutputStream(out)
    val opts = ArrowBridge.WriteOptions(batchSize = batchSize)
    writeMetaFrame(d, TypeSchema, 0, ArrowBridge.schemaBytes(df.schema, opts))
    var seq = 0
    ArrowBridge.foreachPartitionChunk(df, opts) { case (chunk, _, _) =>
      splitChunk(chunk, seq + 1).foreach { s =>
        writeMetaFrame(d, TypeBatch, s.seq, s.metadata)
        seq = s.seq
      }
    }
    writeMetaFrame(d, TypeEos, seq, Array.empty)
    d.flush()
    seq
  }

  /** Serve a dataset's body channel partition-wise (same chunk relay);
    * delivery is permuted within windows of `shuffleWindow` frames to
    * exercise out-of-order reassembly, mirroring the unordered tags of
    * the reference transport. */
  def streamBodyChannel(df: DataFrame, out: OutputStream,
      batchSize: Int = 4096, shuffleWindow: Int = 8): Unit = {
    val d = new DataOutputStream(out)
    val opts = ArrowBridge.WriteOptions(batchSize = batchSize)
    var seq = 0
    val window = scala.collection.mutable.ArrayBuffer[Split]()
    def flushWindow(): Unit = {
      window.reverseIterator.foreach(s => writeBodyFrame(d, s.seq, s.body))
      window.clear()
    }
    ArrowBridge.foreachPartitionChunk(df, opts) { case (chunk, _, _) =>
      splitChunk(chunk, seq + 1).foreach { s =>
        seq = s.seq
        window += s
        if (window.size >= shuffleWindow) flushWindow()
      }
    }
    flushWindow()
    d.flush()
  }

  /** Incrementally split an IPC stream read from `in`: `onSchema` fires
    * for the schema message, `f` per batch split (sequence numbers from
    * `startSeq`), stopping at EOS or EOF. Memory is O(one batch) — the
    * streaming complement of [[splitStream]] for spilled artifacts.
    * Returns the last sequence number consumed (startSeq-1 if none). */
  def foreachSplitIn(in: InputStream, startSeq: Int)
      (onSchema: Array[Byte] => Unit)(f: Split => Unit): Int = {
    val d = new DataInputStream(in)
    var seq = startSeq - 1
    var done = false
    while (!done) {
      val marker = try d.readInt() catch { case _: EOFException => done = true; 0 }
      if (!done) {
        require(marker == -1, s"expected continuation marker, got $marker")
        val metaLen = Integer.reverseBytes(d.readInt())
        if (metaLen == 0) done = true // EOS
        else {
          // keep the 8-byte encapsulation prefix: reassembled streams
          // must be byte-identical to plain IPC
          val framed = new Array[Byte](8 + metaLen)
          framed(0) = -1; framed(1) = -1; framed(2) = -1; framed(3) = -1
          framed(4) = (metaLen & 0xff).toByte
          framed(5) = ((metaLen >> 8) & 0xff).toByte
          framed(6) = ((metaLen >> 16) & 0xff).toByte
          framed(7) = ((metaLen >> 24) & 0xff).toByte
          d.readFully(framed, 8, metaLen)
          val header = java.nio.ByteBuffer.wrap(framed, 8, metaLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
          val body = new Array[Byte](msg.bodyLength().toInt)
          d.readFully(body)
          if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.Schema)
            onSchema(framed)
          else {
            seq += 1
            f(Split(seq, framed, body))
          }
        }
      }
    }
    seq
  }

  /** Serve the metadata channel from spilled `.arrows` part files (one
    * per partition, name-sorted): reads ONLY the encapsulation headers —
    * body regions are `skip`ped (an lseek on a file stream, no read, no
    * allocation). The r12 version ran the full [[foreachSplitIn]] here,
    * which `readFully`d every body just to discard it: the metadata
    * channel paid a whole-dataset read + alloc per request, and since
    * reassembly can't emit a batch until its META frame arrives, the
    * single-pair loop was gated on that wasted pass (the r12 verdict #2
    * 0.62→0.80 s regression). The query that produced the spill is NOT
    * re-run, so meta and body channels built from the same files are
    * consistent by construction. Returns the batch count. */
  def streamMetadataFromFiles(paths: Seq[java.nio.file.Path], out: OutputStream): Int = {
    val d = new DataOutputStream(out)
    var schemaSent = false
    var seq = 0
    paths.foreach { p =>
      val in = new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(p), 1 << 16)
      try {
        seq = foreachSplitMeta(in, seq + 1) { schema =>
          if (!schemaSent) { writeMetaFrame(d, TypeSchema, 0, schema); schemaSent = true }
        } { (s, metadata) => writeMetaFrame(d, TypeBatch, s, metadata) }
      } finally in.close()
    }
    writeMetaFrame(d, TypeEos, seq, Array.empty)
    d.flush()
    seq
  }

  /** Header-only variant of [[foreachSplitIn]]: `f(seq, framedHeader)`
    * per batch, body bytes SKIPPED (never read, never allocated). */
  def foreachSplitMeta(in: InputStream, startSeq: Int)
      (onSchema: Array[Byte] => Unit)(f: (Int, Array[Byte]) => Unit): Int = {
    val d = new DataInputStream(in)
    var seq = startSeq - 1
    var done = false
    while (!done) {
      val marker = try d.readInt() catch { case _: EOFException => done = true; 0 }
      if (!done) {
        require(marker == -1, s"expected continuation marker, got $marker")
        val metaLen = Integer.reverseBytes(d.readInt())
        if (metaLen == 0) done = true // EOS
        else {
          val framed = new Array[Byte](8 + metaLen)
          framed(0) = -1; framed(1) = -1; framed(2) = -1; framed(3) = -1
          framed(4) = (metaLen & 0xff).toByte
          framed(5) = ((metaLen >> 8) & 0xff).toByte
          framed(6) = ((metaLen >> 16) & 0xff).toByte
          framed(7) = ((metaLen >> 24) & 0xff).toByte
          d.readFully(framed, 8, metaLen)
          val header = java.nio.ByteBuffer.wrap(framed, 8, metaLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
          d.skipNBytes(msg.bodyLength())
          if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.Schema)
            onSchema(framed)
          else {
            seq += 1
            f(seq, framed)
          }
        }
      }
    }
    seq
  }

  /** Serve the body channel from the same spilled part files; delivery
    * is permuted within `shuffleWindow`-frame windows to exercise
    * out-of-order reassembly (reference transport tags are unordered).
    *
    * Bodies are read into a ring of `shuffleWindow` grow-only reused
    * buffers — at most window-many bodies are ever live and NOTHING is
    * allocated per batch after warm-up (the r12 version materialized a
    * fresh header + body array per batch: the whole dataset volume in
    * per-request allocation churn, a driver-box GC tax at bench scale). */
  def streamBodyFromFiles(paths: Seq[java.nio.file.Path], out: OutputStream,
      shuffleWindow: Int = 8): Unit = {
    val d = new DataOutputStream(out)
    var seq = 0
    // ring slot: (seq, buffer, true body length)
    val bufs = Array.fill(shuffleWindow)(new Array[Byte](0))
    val seqs = new Array[Int](shuffleWindow)
    val lens = new Array[Int](shuffleWindow)
    var filled = 0
    def flushWindow(): Unit = {
      var i = filled - 1
      while (i >= 0) {
        writeBodyFrameRef(d, seqs(i), bufs(i), lens(i))
        i -= 1
      }
      filled = 0
    }
    val header = new Array[Byte](1 << 16)
    paths.foreach { p =>
      val in = new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(p), 1 << 16)
      val di = new DataInputStream(in)
      try {
        var done = false
        while (!done) {
          val marker = try di.readInt() catch { case _: EOFException => done = true; 0 }
          if (!done) {
            require(marker == -1, s"expected continuation marker, got $marker")
            val metaLen = Integer.reverseBytes(di.readInt())
            if (metaLen == 0) done = true // EOS
            else {
              require(metaLen <= header.length, s"metadata message $metaLen too large")
              di.readFully(header, 0, metaLen)
              val hb = java.nio.ByteBuffer.wrap(header, 0, metaLen)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(hb)
              val bodyLen = msg.bodyLength().toInt
              if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.Schema) {
                di.skipNBytes(bodyLen)
              } else {
                if (bufs(filled).length < bodyLen) bufs(filled) = new Array[Byte](bodyLen)
                di.readFully(bufs(filled), 0, bodyLen)
                seq += 1
                seqs(filled) = seq
                lens(filled) = bodyLen
                filled += 1
                if (filled >= shuffleWindow) flushWindow()
              }
            }
          }
        }
      } finally in.close()
    }
    flushWindow()
    d.flush()
  }

  /** Split a serialized Arrow IPC stream into schema + batch messages,
    * each batch cut at its body offset. */
  def splitStream(stream: Array[Byte]): (Array[Byte], Vector[Split]) = {
    def readIntLE(off: Int): Int =
      (stream(off) & 0xff) | ((stream(off + 1) & 0xff) << 8) |
        ((stream(off + 2) & 0xff) << 16) | ((stream(off + 3) & 0xff) << 24)

    var off = 0
    var schema: Array[Byte] = null
    val splits = Vector.newBuilder[Split]
    var seq = 1
    var done = false
    while (!done && off < stream.length) {
      require(readIntLE(off) == -1, s"expected continuation marker at $off")
      val metaLen = readIntLE(off + 4)
      if (metaLen == 0) { done = true; off += 8 } // EOS
      else {
        val msgEnd = off + 8 + metaLen
        // the flatbuffer's bodyLength decides where this message ends;
        // rather than parse it, use the next continuation marker — but
        // bodies can contain 0xFFFFFFFF, so parse the header instead:
        val header = java.nio.ByteBuffer.wrap(stream, off + 8, metaLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
        val bodyLen = msg.bodyLength().toInt
        val total = msgEnd + bodyLen
        val headerBytes = java.util.Arrays.copyOfRange(stream, off, msgEnd)
        if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.Schema) {
          schema = headerBytes
        } else {
          splits += Split(seq, headerBytes,
            java.util.Arrays.copyOfRange(stream, msgEnd, total))
          seq += 1
        }
        off = total
      }
    }
    (schema, splits.result())
  }

  // ---------------- channel framing ----------------

  def writeMetaFrame(out: DataOutputStream, tpe: Byte, seq: Int, bytes: Array[Byte]): Unit = {
    out.writeByte(tpe)
    out.writeInt(Integer.reverseBytes(seq))
    out.writeInt(Integer.reverseBytes(bytes.length))
    out.write(bytes)
  }

  def writeBodyFrame(out: DataOutputStream, seq: Int, bytes: Array[Byte]): Unit =
    writeBodyFrameRef(out, seq, bytes, bytes.length)

  /** [[writeBodyFrame]] over a reused buffer prefix. */
  def writeBodyFrameRef(out: DataOutputStream, seq: Int,
      bytes: Array[Byte], len: Int): Unit = {
    val pad = (8 - (len % 8)) % 8 // 8-byte alignment rule
    out.writeInt(Integer.reverseBytes(seq))
    out.writeInt(Integer.reverseBytes(len + pad))
    out.write(bytes, 0, len)
    if (pad > 0) out.write(new Array[Byte](pad), 0, pad)
  }

  /** Serve the metadata stream of a pre-split dataset. */
  def writeMetadataChannel(out: OutputStream, schema: Array[Byte],
      splits: Seq[Split]): Unit = {
    val d = new DataOutputStream(out)
    writeMetaFrame(d, TypeSchema, 0, schema)
    splits.foreach(s => writeMetaFrame(d, TypeBatch, s.seq, s.metadata))
    writeMetaFrame(d, TypeEos, splits.size, Array.empty)
    d.flush()
  }

  /** Serve the body stream; `order` permutes delivery to exercise
    * out-of-order transfer (reference tags are unordered by design). */
  def writeBodyChannel(out: OutputStream, splits: Seq[Split],
      order: Seq[Int] = Nil): Unit = {
    val d = new DataOutputStream(out)
    val seq = if (order.nonEmpty) order.map(i => splits(i)) else splits
    seq.foreach(s => writeBodyFrame(d, s.seq, s.body))
    d.flush()
  }

  // ---------------- client: reassembly ----------------

  final case class MetaFrame(tpe: Byte, seq: Int, bytes: Array[Byte])

  def readMetaFrame(in: DataInputStream): Option[MetaFrame] =
    try {
      val tpe = in.readByte()
      val seq = Integer.reverseBytes(in.readInt())
      val len = Integer.reverseBytes(in.readInt())
      val b = new Array[Byte](len)
      in.readFully(b)
      Some(MetaFrame(tpe, seq, b))
    } catch { case _: EOFException => None }

  def readBodyFrame(in: DataInputStream): Option[(Int, Array[Byte])] =
    try {
      val seq = Integer.reverseBytes(in.readInt())
      val len = Integer.reverseBytes(in.readInt())
      val b = new Array[Byte](len)
      in.readFully(b)
      Some((seq, b))
    } catch { case _: EOFException => None }

  /** Reads both channels concurrently (out-of-order completion), emits a
    * standard Arrow IPC stream in sequence order with BOUNDED buffering
    * (`maxPending` reassembly slots — the backpressure the reference's
    * unbounded `outstanding_tags_` lacks, SURVEY §7 hard parts). */
  def reassemble(meta: InputStream, body: InputStream, sink: OutputStream,
      maxPending: Int = 16): (Long, Long) = {
    val metaBySeq = new ConcurrentHashMap[Int, MetaFrame]()
    val bodyBySeq = new ConcurrentHashMap[Int, Array[Byte]]()
    val schemaLatch = new CountDownLatch(1)
    @volatile var schema: Array[Byte] = null
    @volatile var eosCount = -1
    @volatile var error: Throwable = null
    val available = new ArrayBlockingQueue[Int](1024)
    val pendingGate = new java.util.concurrent.Semaphore(maxPending)

    def noteAvailable(seq: Int): Unit =
      if (metaBySeq.containsKey(seq) && bodyBySeq.containsKey(seq)) available.put(seq)

    // A producer thread that dies (error OR clean EOF) pushes a sentinel
    // so the consumer's take() can never block forever: zero-batch
    // streams, errors after the schema latch, and truncated channels all
    // surface instead of deadlocking.
    val Sentinel = Int.MinValue

    val metaThread = new Thread(() => {
      try {
        val d = new DataInputStream(meta)
        var frame = readMetaFrame(d)
        while (frame.isDefined) {
          val f = frame.get
          f.tpe match {
            case TypeSchema => schema = f.bytes; schemaLatch.countDown()
            case TypeBatch  => metaBySeq.put(f.seq, f); noteAvailable(f.seq)
            case TypeEos    => eosCount = f.seq
            case other      => throw new IllegalStateException(s"meta frame type $other")
          }
          frame = readMetaFrame(d)
        }
      } catch { case t: Throwable => error = t; schemaLatch.countDown() }
      finally available.put(Sentinel)
    }, "dissoc-meta")
    metaThread.setDaemon(true)

    val bodyThread = new Thread(() => {
      try {
        val d = new DataInputStream(body)
        var frame = readBodyFrame(d)
        while (frame.isDefined) {
          pendingGate.acquire() // bound unprocessed bodies in memory
          val (seq, bytes) = frame.get
          bodyBySeq.put(seq, bytes)
          noteAvailable(seq)
          frame = readBodyFrame(d)
        }
      } catch { case t: Throwable => error = t }
      finally available.put(Sentinel)
    }, "dissoc-body")
    bodyThread.setDaemon(true)

    metaThread.start(); bodyThread.start()
    schemaLatch.await()
    if (error != null) throw error
    // owned-chunk fast path: every array this loop emits is fresh off a
    // channel and never reused, so a sink that can take ownership skips
    // the defensive copy (and its allocation) per frame
    val owned: OwnedChunkSink = sink match {
      case o: OwnedChunkSink => o
      case _ => (chunk, len) => sink.write(chunk, 0, len)
    }
    owned.writeOwned(schema, schema.length)

    var emitted = 0L
    var bytes = schema.length.toLong
    var next = 1
    var liveProducers = 2
    val ready = scala.collection.mutable.Set[Int]()
    while (eosCount < 0 || emitted < eosCount) {
      val seq = available.take()
      if (seq == Sentinel) {
        liveProducers -= 1
        if (error != null) throw error
        if (liveProducers == 0 && (eosCount < 0 || emitted < eosCount))
          throw new EOFException(
            s"dissociated stream truncated: emitted $emitted of " +
              (if (eosCount < 0) "unknown (no EOS)" else eosCount.toString))
      } else ready += seq
      while (ready.contains(next)) {
        val m = metaBySeq.remove(next)
        val b = bodyBySeq.remove(next)
        owned.writeOwned(m.bytes, m.bytes.length)
        // strip alignment padding: the IPC header records the true body
        // length; padded tail bytes beyond it are channel-only
        val header = java.nio.ByteBuffer.wrap(m.bytes, 8, m.bytes.length - 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val trueLen = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
          .bodyLength().toInt
        owned.writeOwned(b, trueLen)
        bytes += m.bytes.length + trueLen
        ready -= next
        pendingGate.release()
        emitted += 1
        next += 1
      }
      if (error != null) throw error
    }
    // EOS marker: continuation + zero length
    sink.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))
    sink.flush()
    // bounded join: a malformed channel with frames beyond EOS could
    // leave a (daemon) producer parked on the gate — don't hang with it
    metaThread.join(10000); bodyThread.join(10000)
    if (error != null) throw error
    (emitted, bytes + 8)
  }
}
