package graft.arrow

import java.io.{InputStream, OutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.{BufferAllocator, RootAllocator}
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryEncoder, DictionaryProvider}
import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType, Schema => ASchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._

/** Arrow IPC ⇄ Spark bridge: streaming writer from InternalRow iterators
  * and streaming reader to external Rows, covering the reference's type
  * lattice (SURVEY §1.3) with LZ4/ZSTD IPC body compression and
  * single-dictionary-per-stream encoding (the reference's wire shapes:
  * http/get_compressed/python/server/server.py:50-52,390-393).
  *
  * Batch-at-a-time in constant memory both directions — the reference's
  * own pipelining discipline (SURVEY §4 row 1).
  */
object ArrowBridge {

  /** Shared root allocator; children are created per stream. */
  private val root = new RootAllocator(Long.MaxValue)
  private val childId = new AtomicLong()

  def newAllocator(tag: String): BufferAllocator =
    root.newChildAllocator(s"graft-$tag-${childId.incrementAndGet()}", 0, Long.MaxValue)

  final case class WriteOptions(
      batchSize: Int = 4096,
      /** IPC buffer codec: None | Some("lz4") | Some("zstd"). */
      codec: Option[String] = None,
      /** Write the IPC *file* format instead of the stream format. */
      fileFormat: Boolean = false,
      /** Columns to dictionary-encode, with their ordered value sets
        * (one dictionary per stream, as the reference does). */
      dictColumns: Map[String, Array[String]] = Map.empty)

  private def codecType(name: String): CompressionUtil.CodecType = name match {
    case "lz4"  => CompressionUtil.CodecType.LZ4_FRAME
    case "zstd" => CompressionUtil.CodecType.ZSTD
    case other  => throw new IllegalArgumentException(s"unknown IPC codec $other")
  }

  // =================== write: InternalRow -> IPC ===================

  /** Driver-side InternalRow iterator over a DataFrame, partition at a
    * time. The `.copy()` is load-bearing: whole-stage codegen reuses one
    * UnsafeRow buffer, and local-mode collection skips the serialization
    * that would otherwise snapshot it. */
  def internalRows(df: org.apache.spark.sql.DataFrame): Iterator[InternalRow] =
    df.queryExecution.toRdd.map(_.copy()).toLocalIterator

  /** The serialized schema message of an IPC stream with these options —
    * also the byte prefix of every per-partition stream, which is what
    * makes executor-side serialization concatenable. */
  def schemaBytes(schema: StructType, opts: WriteOptions = WriteOptions()): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    write(schema, Iterator.empty, bos, opts)
    val all = bos.toByteArray
    java.util.Arrays.copyOfRange(all, 0, all.length - EosBytes.length)
  }

  /** v5 IPC end-of-stream marker: continuation + zero length. */
  val EosBytes: Array[Byte] = Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)

  /** Parallel DataFrame → IPC stream: each partition serializes its own
    * batches on the executors (all cores busy), the driver concatenates
    * [schema][partition batch messages…][EOS] in partition order with a
    * bounded prefetch window — constant driver memory, no row-at-a-time
    * driver loop. This is the 100 TB-shaped serving path: on a cluster
    * the driver only relays ~10 MB chunks.
    *
    * Not valid with dictionary columns (each partition would emit its
    * own dictionary message mid-stream) — falls back to the row loop.
    *
    * Returns (rows, batches, bytes).
    */
  def writeParallel(df: org.apache.spark.sql.DataFrame, out: OutputStream,
      opts: WriteOptions = WriteOptions(), window: Int = 8): (Long, Long, Long) = {
    if (opts.fileFormat) {
      val (r, b) = write(df.schema, internalRows(df), out, opts)
      return (r, b, -1L)
    }
    val header = schemaBytes(df.schema, opts)
    out.write(header)
    var rows = 0L
    var batches = 0L
    var bytes = header.length.toLong
    // Dictionary streams stay parallel: the value set is fixed at
    // registration, so every partition emits an IDENTICAL dictionary
    // message right after its schema — the relay keeps the first and
    // strips the duplicates, preserving one-dictionary-per-stream on
    // the wire (the reference's shape) at executor-parallel speed.
    var dictEmitted = false
    foreachPartitionChunk(df, opts, window) { case (chunk, r, b) =>
      val body =
        if (opts.dictColumns.isEmpty) chunk
        else {
          val (dict, rest) = splitLeadingDictionary(chunk)
          if (dict.isEmpty) chunk
          else if (!dictEmitted) { dictEmitted = true; chunk }
          else rest
        }
      out.write(body)
      out.flush()
      rows += r; batches += b; bytes += body.length
    }
    out.write(EosBytes)
    out.flush()
    (rows, batches, bytes + EosBytes.length)
  }

  /** [[writeParallel]] with the HTTP-level zstd coding done as
    * INDEPENDENT zstd frames — [frame(schema)][frame(chunk)]…[frame(EOS)]
    * — compressed on a private pool of plain JVM threads and emitted in
    * partition order. Concatenated frames are standard zstd (the CLI
    * produces them for multi-file input) and ZstdInputStream decodes
    * them as one stream, so the decompressed bytes are identical to
    * writeParallel's output.
    *
    * Why not ZstdOutputStream.setWorkers (libzstd's own MT): it
    * intermittently stalled the serve for 20–80 s per request under the
    * bench's serve+decode loop (ticker probe, ~25% of reps, escalating
    * then recovering) while the single-threaded encoder never did; this
    * path gets the same compression overlap from deterministic JVM
    * threads and one-shot ZSTD_compress calls with no shared native
    * context. Ratio cost of per-chunk frames (window reset every ~27 MB
    * chunk + 13-byte frame headers) is < 0.5% on the ticker payload.
    *
    * Backpressure: at most `workers + 2` frames are in flight; the
    * relay blocks on the oldest future, so driver memory stays
    * O((window + workers) × chunk). Returns (rows, batches,
    * uncompressed stream bytes) like writeParallel. */
  def writeParallelZstd(df: org.apache.spark.sql.DataFrame, out: OutputStream,
      opts: WriteOptions = WriteOptions(), workers: Int = 4, level: Int = 3,
      window: Int = 8): (Long, Long, Long) = {
    val nw = math.max(1, workers)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nw,
      (r: Runnable) => { val t = new Thread(r, "zstd-frame"); t.setDaemon(true); t })
    val pending = new java.util.ArrayDeque[java.util.concurrent.Future[Array[Byte]]]()
    def submit(bytes: Array[Byte]): Unit = {
      pending.add(pool.submit(() => com.github.luben.zstd.Zstd.compress(bytes, level)))
      while (pending.size > nw + 2) { out.write(pending.poll().get()); out.flush() }
    }
    try {
      val header = schemaBytes(df.schema, opts)
      submit(header)
      var rows = 0L
      var batches = 0L
      var bytes = header.length.toLong
      var dictEmitted = false
      foreachPartitionChunk(df, opts, window) { case (chunk, r, b) =>
        val body =
          if (opts.dictColumns.isEmpty) chunk
          else {
            val (dict, rest) = splitLeadingDictionary(chunk)
            if (dict.isEmpty) chunk
            else if (!dictEmitted) { dictEmitted = true; chunk }
            else rest
          }
        submit(body)
        rows += r; batches += b; bytes += body.length
      }
      submit(EosBytes)
      while (!pending.isEmpty) { out.write(pending.poll().get()); out.flush() }
      (rows, batches, bytes + EosBytes.length)
    } finally pool.shutdownNow()
  }

  /** If `chunk` opens with a DictionaryBatch message, split it off:
    * (dictionaryMessage, remainder); otherwise (empty, chunk). */
  private def splitLeadingDictionary(chunk: Array[Byte]): (Array[Byte], Array[Byte]) = {
    def readIntLE(off: Int): Int =
      (chunk(off) & 0xff) | ((chunk(off + 1) & 0xff) << 8) |
        ((chunk(off + 2) & 0xff) << 16) | ((chunk(off + 3) & 0xff) << 24)
    if (chunk.length < 8 || readIntLE(0) != -1) return (Array.emptyByteArray, chunk)
    val metaLen = readIntLE(4)
    if (metaLen <= 0 || chunk.length < 8 + metaLen) return (Array.emptyByteArray, chunk)
    val header = java.nio.ByteBuffer.wrap(chunk, 8, metaLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(header)
    if (msg.headerType() != org.apache.arrow.flatbuf.MessageHeader.DictionaryBatch)
      (Array.emptyByteArray, chunk)
    else {
      val end = 8 + metaLen + msg.bodyLength().toInt
      (java.util.Arrays.copyOfRange(chunk, 0, end),
        java.util.Arrays.copyOfRange(chunk, end, chunk.length))
    }
  }

  /** The executor-parallel chunk relay under [[writeParallel]]: each
    * partition serializes its own batches; the driver sees, in
    * partition order with a bounded prefetch window, one chunk per
    * partition — a pure sequence of encapsulated batch messages (no
    * schema prefix, no EOS). Driver memory is O(window × chunk). */
  def foreachPartitionChunk(df: org.apache.spark.sql.DataFrame,
      opts: WriteOptions = WriteOptions(), window: Int = 8)(
      consume: (Array[Byte], Long, Long) => Unit): Unit = {
    val schema = df.schema
    val headerLen = schemaBytes(schema, opts).length
    val chunks: org.apache.spark.rdd.RDD[(Array[Byte], Long, Long)] =
      df.queryExecution.toRdd.mapPartitions { it =>
        val bos = new java.io.ByteArrayOutputStream(1 << 20)
        val (r, b) = write(schema, it, bos, opts)
        val all = bos.toByteArray
        // strip the schema prefix and EOS suffix; what remains is a
        // pure sequence of encapsulated batch messages
        Iterator.single((java.util.Arrays.copyOfRange(
          all, headerLen, all.length - EosBytes.length), r, b))
      }
    PartitionStreamer.foreachOrdered(chunks, window) { case (chunk, r, b) =>
      consume(chunk, r, b)
    }
  }

  /** Push-style streaming writer: append rows one at a time, constant
    * memory; flushes a batch every `opts.batchSize` rows. */
  final class StreamingWriter(schema: StructType, out: OutputStream, opts: WriteOptions) {
    private val alloc = newAllocator("stream-write")
    private var rows = 0L
    private var batches = 0L
    private var n = 0
    private var closed = false

    private val state = makeWriteState(schema, out, opts, alloc)

    def append(r: InternalRow): Unit = {
      var i = 0
      while (i < state.setters.length) { state.setters(i)(r, i, n); i += 1 }
      n += 1
      if (n == opts.batchSize) flushBatch()
    }

    private def flushBatch(): Unit = if (n > 0) {
      state.root.setRowCount(n)
      state.writer.writeBatch()
      rows += n; batches += 1; n = 0
      state.root.allocateNew()
    }

    /** Ends the stream (EOS); returns (rows, batches). */
    def finish(): (Long, Long) = {
      flushBatch()
      state.writer.end()
      (rows, batches)
    }

    def close(): Unit = if (!closed) {
      closed = true
      state.writer.close()
      state.root.close()
      state.closeDicts()
      alloc.close()
    }
  }

  private final case class WriteState(
      root: VectorSchemaRoot,
      writer: org.apache.arrow.vector.ipc.ArrowWriter,
      setters: Array[(SpecializedGetters, Int, Int) => Unit],
      closeDicts: () => Unit)

  /** Writes `rows` as an Arrow IPC stream; returns (rows, batches). */
  def write(schema: StructType, rows: Iterator[InternalRow], out: OutputStream,
            opts: WriteOptions = WriteOptions()): (Long, Long) = {
    val w = new StreamingWriter(schema, out, opts)
    try {
      while (rows.hasNext) w.append(rows.next())
      w.finish()
    } finally w.close()
  }

  /** Wire schema bytes of a [[writeDeltaDict]] stream: the schema
    * message ONLY — unlike the one-dict-per-stream path, no dictionary
    * batch precedes the first data (dictionaries appear when values
    * do), so a schema probe of a delta stream is exactly this prefix. */
  def deltaDictSchemaBytes(schema: StructType, dictCols: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeDeltaDict(schema, Iterator.empty, bos, dictCols)
    java.util.Arrays.copyOfRange(bos.toByteArray, 0,
      bos.size() - EosBytes.length)
  }

  /** Single-pass dictionary-DELTA stream writer: encodes `dictCols`
    * (string columns) against dictionaries that GROW as values appear —
    * the first values emit as a full dictionary batch, later batches
    * emit `isDelta=true` dictionary batches carrying only unseen values
    * (appended by spec-conforming readers; arrow-java's ArrowReader
    * batch-appends them, so [[read]] decodes these streams unchanged).
    *
    * Contrast with `WriteOptions.dictColumns` (one dictionary per
    * stream, the reference's only wire shape,
    * get_compressed/python/server/server.py:50-52): that path needs the
    * value set up front — a full `distinct()` pre-scan — while this one
    * needs NO pre-scan and O(|dictionary|) writer memory, the shape for
    * encoding unbounded streams (POST ingest, readStream) where the
    * value set is unknown. Delta batches are the IPC spec's documented
    * evolution of dictionary streams (format/Columnar.rst, dictionary
    * messages).
    *
    * Returns (rows, batches, final dictionary size per column). */
  def writeDeltaDict(schema: StructType, rows: Iterator[InternalRow],
      out: OutputStream, dictCols: Seq[String], batchSize: Int = 4096)
      : (Long, Long, Map[String, Int]) = {
    import org.apache.arrow.vector.ipc.WriteChannel
    import org.apache.arrow.vector.ipc.message.{ArrowDictionaryBatch, IpcOption, MessageSerializer}
    import org.apache.arrow.vector.util.DictionaryUtility
    require(dictCols.nonEmpty, "writeDeltaDict needs at least one dictionary column")
    dictCols.foreach(c => require(
      schema(c).dataType == StringType, s"dictionary column $c must be string"))
    val alloc = newAllocator("delta-dict-write")
    val dictIds = dictCols.zipWithIndex.toMap
    def encoding(c: String) =
      new DictionaryEncoding(dictIds(c).toLong, false, new ArrowType.Int(32, true))

    val fields: Seq[Field] = schema.fields.toSeq.map { f =>
      if (dictIds.contains(f.name))
        new Field(f.name,
          new FieldType(f.nullable, new ArrowType.Int(32, true), encoding(f.name), null),
          List.empty[Field].asJava)
      else ArrowSchemas.toArrowField(f)
    }
    val vroot = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
    // empty value vectors let toMessageFormat recover the VALUE type for
    // the wire schema (the index type travels in the encoding metadata)
    val provider = new DictionaryProvider.MapDictionaryProvider()
    dictCols.foreach { c =>
      val dv = new VarCharVector(s"$c-dict", alloc)
      dv.allocateNew(0); dv.setValueCount(0)
      provider.put(new Dictionary(dv, encoding(c)))
    }
    val lookups = dictCols.map(c => c -> new java.util.HashMap[String, Integer]()).toMap
    val pendingNew = dictCols.map(c => c -> scala.collection.mutable.ArrayBuffer[String]()).toMap

    try {
      val setters: Array[(InternalRow, Int) => Unit] =
        schema.fields.zipWithIndex.map { case (f, i) =>
          val vec = vroot.getVector(i)
          if (dictIds.contains(f.name)) {
            val lookup = lookups(f.name)
            val pend = pendingNew(f.name)
            val iv = vec.asInstanceOf[IntVector]
            (r: InternalRow, dst: Int) =>
              if (r.isNullAt(i)) iv.setNull(dst)
              else {
                val v = r.getUTF8String(i).toString
                var idx = lookup.get(v)
                if (idx == null) { idx = Integer.valueOf(lookup.size); lookup.put(v, idx); pend += v }
                iv.setSafe(dst, idx.intValue())
              }
          } else {
            val s = mkSetter(vec, f.dataType, origTag(f))
            (r: InternalRow, dst: Int) => s(r, i, dst)
          }
        }

      val wch = new WriteChannel(Channels.newChannel(out))
      val used = new java.util.HashSet[java.lang.Long]()
      val msgFields = vroot.getSchema.getFields.asScala
        .map(f => DictionaryUtility.toMessageFormat(f, provider, used))
      MessageSerializer.serialize(wch, new ASchema(msgFields.asJava))

      var rowsN = 0L
      var batches = 0L
      val emittedOnce = scala.collection.mutable.Set[String]()
      while (rows.hasNext) {
        var n = 0
        while (rows.hasNext && n < batchSize) {
          val r = rows.next()
          var i = 0
          while (i < setters.length) { setters(i)(r, n); i += 1 }
          n += 1
        }
        // dictionary (delta) batches FIRST — a batch may only reference
        // values its readers have already seen
        dictCols.foreach { c =>
          val pend = pendingNew(c)
          if (pend.nonEmpty) {
            val dv = new VarCharVector(s"$c-dict", alloc)
            dv.allocateNew(pend.size)
            pend.zipWithIndex.foreach { case (v, j) => dv.setSafe(j, v.getBytes(UTF_8)) }
            dv.setValueCount(pend.size)
            val droot = new VectorSchemaRoot(
              List(dv.getField).asJava, List[FieldVector](dv).asJava, pend.size)
            val rb = new VectorUnloader(droot).getRecordBatch
            val db = new ArrowDictionaryBatch(dictIds(c).toLong, rb,
              /* isDelta = */ emittedOnce.contains(c))
            try MessageSerializer.serialize(wch, db) finally db.close()
            dv.close()
            emittedOnce += c
            pend.clear()
          }
        }
        vroot.setRowCount(n)
        val rb = new VectorUnloader(vroot).getRecordBatch
        try MessageSerializer.serialize(wch, rb) finally rb.close()
        vroot.allocateNew() // reset buffers for the next fill
        rowsN += n
        batches += 1
      }
      ArrowStreamWriter.writeEndOfStream(wch, IpcOption.DEFAULT)
      out.flush()
      (rowsN, batches, dictCols.map(c => c -> lookups(c).size).toMap)
    } finally {
      vroot.close()
      provider.getDictionaryIds.asScala.foreach(id => provider.lookup(id).getVector.close())
      alloc.close()
    }
  }

  private def makeWriteState(schema: StructType, out: OutputStream,
      opts: WriteOptions, alloc: BufferAllocator): WriteState = {
    {
      val provider = new DictionaryProvider.MapDictionaryProvider()
      val dictIndex: Map[String, java.util.HashMap[String, Integer]] =
        opts.dictColumns.toSeq.zipWithIndex.map { case ((name, values), i) =>
          val dictVec = new VarCharVector(s"$name-dict", alloc)
          dictVec.allocateNew(values.length)
          values.zipWithIndex.foreach { case (v, j) => dictVec.setSafe(j, v.getBytes(UTF_8)) }
          dictVec.setValueCount(values.length)
          provider.put(new Dictionary(dictVec,
            new DictionaryEncoding(i.toLong, false, new ArrowType.Int(32, true))))
          val lookup = new java.util.HashMap[String, Integer]()
          values.zipWithIndex.foreach { case (v, j) => lookup.put(v, j) }
          name -> lookup
        }.toMap

      val fields: Seq[Field] = schema.fields.toSeq.map { f =>
        if (opts.dictColumns.contains(f.name)) {
          val id = opts.dictColumns.keysIterator.toSeq.indexOf(f.name).toLong
          new Field(f.name,
            new FieldType(f.nullable, new ArrowType.Int(32, true),
              new DictionaryEncoding(id, false, new ArrowType.Int(32, true)), null),
            List.empty[Field].asJava)
        } else ArrowSchemas.toArrowField(f)
      }
      val vroot = VectorSchemaRoot.create(new ASchema(fields.asJava), alloc)
      locally {
        val setters: Array[(SpecializedGetters, Int, Int) => Unit] =
          schema.fields.zipWithIndex.map { case (f, i) =>
            val vec = vroot.getVector(i)
            if (opts.dictColumns.contains(f.name)) {
              val lookup = dictIndex(f.name)
              val iv = vec.asInstanceOf[IntVector]
              (g: SpecializedGetters, src: Int, dst: Int) =>
                if (g.isNullAt(src)) iv.setNull(dst)
                else iv.setSafe(dst, lookup.get(g.getUTF8String(src).toString).intValue())
            } else mkSetter(vec, f.dataType, origTag(f))
          }

        val chan = Channels.newChannel(out)
        val writer =
          if (opts.fileFormat) {
            opts.codec match {
              case Some(c) => new ArrowFileWriter(vroot, provider,
                Channels.newChannel(out), new java.util.HashMap[String, String](),
                org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
                CommonsCompressionFactory.INSTANCE, codecType(c))
              case None => new ArrowFileWriter(vroot, provider, Channels.newChannel(out))
            }
          } else opts.codec match {
            case Some(c) => new ArrowStreamWriter(vroot, provider, chan,
              org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
              CommonsCompressionFactory.INSTANCE, codecType(c))
            case None => new ArrowStreamWriter(vroot, provider, chan)
          }
        writer.start()
        WriteState(vroot, writer, setters, () =>
          provider.getDictionaryIds.asScala.foreach(id => provider.lookup(id).getVector.close()))
      }
    }
  }

  private def origTag(f: StructField): Option[String] =
    if (f.metadata.contains(ArrowSchemas.OrigTypeKey))
      Some(f.metadata.getString(ArrowSchemas.OrigTypeKey))
    else None

  /** Setter writing value `src`-th field of a SpecializedGetters into
    * vector position `dst`. Children of lists/structs recurse. */
  private def mkSetter(vec: FieldVector, dt: DataType, orig: Option[String])
      : (SpecializedGetters, Int, Int) => Unit = {
    def nn(f: (SpecializedGetters, Int, Int) => Unit): (SpecializedGetters, Int, Int) => Unit =
      (g, src, dst) => if (g.isNullAt(src)) setNull(vec, dst) else f(g, src, dst)
    (orig, dt) match {
      case (Some("uint8"), ShortType) =>
        val v = vec.asInstanceOf[UInt1Vector]; nn((g, s, d) => v.setSafe(d, g.getShort(s) & 0xff))
      case (Some("uint16"), IntegerType) =>
        val v = vec.asInstanceOf[UInt2Vector]; nn((g, s, d) => v.setSafe(d, g.getInt(s).toChar))
      case (Some("uint32"), LongType) =>
        val v = vec.asInstanceOf[UInt4Vector]; nn((g, s, d) => v.setSafe(d, g.getLong(s).toInt))
      case (Some("uint64"), t: DecimalType) =>
        val v = vec.asInstanceOf[UInt8Vector]
        nn((g, s, d) => v.setSafe(d, g.getDecimal(s, t.precision, t.scale)
          .toJavaBigDecimal.toBigInteger.longValue()))
      case (Some("date64"), DateType) =>
        val v = vec.asInstanceOf[DateMilliVector]
        nn((g, s, d) => v.setSafe(d, g.getInt(s).toLong * 86400000L))
      case (Some("timestamp_ns"), TimestampType) =>
        val v = vec.asInstanceOf[TimeStampNanoTZVector]
        nn((g, s, d) => v.setSafe(d, Math.multiplyExact(g.getLong(s), 1000L)))
      case (_, ByteType) =>
        val v = vec.asInstanceOf[TinyIntVector]; nn((g, s, d) => v.setSafe(d, g.getByte(s)))
      case (_, ShortType) =>
        val v = vec.asInstanceOf[SmallIntVector]; nn((g, s, d) => v.setSafe(d, g.getShort(s)))
      case (_, IntegerType) =>
        val v = vec.asInstanceOf[IntVector]; nn((g, s, d) => v.setSafe(d, g.getInt(s)))
      case (_, LongType) =>
        val v = vec.asInstanceOf[BigIntVector]; nn((g, s, d) => v.setSafe(d, g.getLong(s)))
      case (_, FloatType) =>
        val v = vec.asInstanceOf[Float4Vector]; nn((g, s, d) => v.setSafe(d, g.getFloat(s)))
      case (_, DoubleType) =>
        val v = vec.asInstanceOf[Float8Vector]; nn((g, s, d) => v.setSafe(d, g.getDouble(s)))
      case (_, StringType) =>
        val v = vec.asInstanceOf[VarCharVector]
        nn((g, s, d) => v.setSafe(d, g.getUTF8String(s).getBytes))
      case (_, BinaryType) =>
        val v = vec.asInstanceOf[VarBinaryVector]; nn((g, s, d) => v.setSafe(d, g.getBinary(s)))
      case (_, BooleanType) =>
        val v = vec.asInstanceOf[BitVector]
        nn((g, s, d) => v.setSafe(d, if (g.getBoolean(s)) 1 else 0))
      case (_, DateType) =>
        val v = vec.asInstanceOf[DateDayVector]; nn((g, s, d) => v.setSafe(d, g.getInt(s)))
      case (_, TimestampType) =>
        val v = vec.asInstanceOf[TimeStampMicroTZVector]; nn((g, s, d) => v.setSafe(d, g.getLong(s)))
      case (_, TimestampNTZType) =>
        val v = vec.asInstanceOf[TimeStampMicroVector]; nn((g, s, d) => v.setSafe(d, g.getLong(s)))
      case (_, t: DecimalType) =>
        val v = vec.asInstanceOf[DecimalVector]
        nn((g, s, d) => v.setSafe(d, g.getDecimal(s, t.precision, t.scale).toJavaBigDecimal))
      case (_, NullType) =>
        (_, _, _) => () // NullVector: value count set via root.setRowCount
      case (_, ArrayType(et, _)) =>
        val v = vec.asInstanceOf[ListVector]
        val childSetter = mkSetter(v.getDataVector.asInstanceOf[FieldVector], et, None)
        (g, s, d) => {
          if (g.isNullAt(s)) v.setNull(d)
          else {
            val arr = g.getArray(s)
            // startNewValue returns this row's child start offset —
            // keeps the setter stateless across batch resets
            val start = v.startNewValue(d)
            var k = 0
            while (k < arr.numElements()) { childSetter(arr, k, start + k); k += 1 }
            v.endValue(d, arr.numElements())
          }
        }
      case (_, st: StructType) =>
        val v = vec.asInstanceOf[StructVector]
        val childSetters = st.fields.zipWithIndex.map { case (cf, ci) =>
          mkSetter(v.getChildrenFromFields.get(ci), cf.dataType, origTag(cf))
        }
        (g, s, d) => {
          if (g.isNullAt(s)) v.setNull(d)
          else {
            v.setIndexDefined(d)
            val struct = g.getStruct(s, st.fields.length)
            var k = 0
            while (k < childSetters.length) { childSetters(k)(struct, k, d); k += 1 }
          }
        }
      case (_, other) => throw new UnsupportedOperationException(s"write: $other")
    }
  }

  private def setNull(vec: FieldVector, idx: Int): Unit = vec match {
    case v: BaseFixedWidthVector    => v.setNull(idx)
    case v: BaseVariableWidthVector => v.setNull(idx)
    case v: ListVector              => v.setNull(idx)
    case v: StructVector            => v.setNull(idx)
    case _: NullVector              => ()
    case other => throw new UnsupportedOperationException(s"setNull: ${other.getClass}")
  }

  // =================== read: IPC -> external Rows ===================

  final class ReadResult(
      val schema: StructType,
      val rows: Iterator[Row],
      private val closeFn: () => Unit) extends AutoCloseable {
    override def close(): Unit = closeFn()
  }

  /** Streaming read of an Arrow IPC stream: batches are decoded one at a
    * time; dictionary-encoded columns are decoded to their value type. */
  def read(in: InputStream): ReadResult = {
    val alloc = newAllocator("read")
    val reader = new ArrowStreamReader(in, alloc, CommonsCompressionFactory.INSTANCE)
    val vroot = reader.getVectorSchemaRoot
    val schema = ArrowSchemas.fromArrowSchema(vroot.getSchema)

    val rowIter: Iterator[Row] = new Iterator[Row] {
      private var batch: Array[Row] = Array.empty
      private var pos = 0
      private var done = false

      private def loadNext(): Unit = {
        if (reader.loadNextBatch()) {
          val n = vroot.getRowCount
          val decoded = new scala.collection.mutable.ArrayBuffer[ValueVector]()
          val getters: Array[Int => AnyRef] = vroot.getFieldVectors.asScala.toArray.map { fv =>
            val f = fv.getField
            if (f.getDictionary != null) {
              val dict = reader.getDictionaryVectors.get(f.getDictionary.getId)
              val dv = DictionaryEncoder.decode(fv, dict)
              decoded += dv
              mkGetter(dv.asInstanceOf[FieldVector], StringType, None)
            } else {
              val sf = ArrowSchemas.fromArrowField(f)
              mkGetter(fv, sf.dataType, origTagOf(sf))
            }
          }
          val out = new Array[Row](n)
          var i = 0
          while (i < n) {
            val vals = new Array[Any](getters.length)
            var j = 0
            while (j < getters.length) { vals(j) = getters(j)(i); j += 1 }
            out(i) = Row.fromSeq(vals.toIndexedSeq)
            i += 1
          }
          decoded.foreach(_.close())
          batch = out; pos = 0
        } else { done = true; batch = Array.empty; pos = 0 }
      }

      override def hasNext: Boolean = {
        while (!done && pos >= batch.length) loadNext()
        !done && pos < batch.length
      }
      override def next(): Row = { if (!hasNext) throw new NoSuchElementException; pos += 1; batch(pos - 1) }
    }

    new ReadResult(schema, rowIter, () => { reader.close(); alloc.close() })
  }

  private def origTagOf(f: StructField): Option[String] =
    if (f.metadata.contains(ArrowSchemas.OrigTypeKey))
      Some(f.metadata.getString(ArrowSchemas.OrigTypeKey))
    else None

  /** Getter producing Spark *external* values (java.sql dates etc.). */
  private def mkGetter(vec: FieldVector, dt: DataType, orig: Option[String]): Int => AnyRef = {
    def nn(f: Int => AnyRef): Int => AnyRef = i => if (vec.isNull(i)) null else f(i)
    (orig, dt) match {
      case (Some("uint8"), ShortType) =>
        val v = vec.asInstanceOf[UInt1Vector]
        nn(i => java.lang.Short.valueOf(((v.get(i): Byte) & 0xff).toShort))
      case (Some("uint16"), IntegerType) =>
        val v = vec.asInstanceOf[UInt2Vector]
        nn(i => java.lang.Integer.valueOf(v.get(i).toInt))
      case (Some("uint32"), LongType) =>
        val v = vec.asInstanceOf[UInt4Vector]
        nn(i => java.lang.Long.valueOf(java.lang.Integer.toUnsignedLong(v.get(i))))
      case (Some("uint64"), _: DecimalType) =>
        val v = vec.asInstanceOf[UInt8Vector]
        nn(i => new java.math.BigDecimal(java.lang.Long.toUnsignedString(v.get(i))))
      case (Some("date64"), DateType) =>
        val v = vec.asInstanceOf[DateMilliVector]
        nn(i => new java.sql.Date(Math.floorDiv(v.get(i), 86400000L) * 86400000L))
      case (Some("timestamp_ns"), TimestampType) =>
        val v = vec.asInstanceOf[TimeStampNanoTZVector]
        nn(i => microsToSqlTimestamp(Math.floorDiv(v.get(i), 1000L)))
      case (_, ByteType)    => val v = vec.asInstanceOf[TinyIntVector]; nn(i => java.lang.Byte.valueOf(v.get(i)))
      case (_, ShortType)   => val v = vec.asInstanceOf[SmallIntVector]; nn(i => java.lang.Short.valueOf(v.get(i)))
      case (_, IntegerType) => val v = vec.asInstanceOf[IntVector]; nn(i => java.lang.Integer.valueOf(v.get(i)))
      case (_, LongType)    => val v = vec.asInstanceOf[BigIntVector]; nn(i => java.lang.Long.valueOf(v.get(i)))
      case (_, FloatType)   => val v = vec.asInstanceOf[Float4Vector]; nn(i => java.lang.Float.valueOf(v.get(i)))
      case (_, DoubleType)  => val v = vec.asInstanceOf[Float8Vector]; nn(i => java.lang.Double.valueOf(v.get(i)))
      case (_, StringType)  =>
        val v = vec.asInstanceOf[VarCharVector]; nn(i => new String(v.get(i), UTF_8))
      case (_, BinaryType)  => val v = vec.asInstanceOf[VarBinaryVector]; nn(i => v.get(i))
      case (_, BooleanType) =>
        val v = vec.asInstanceOf[BitVector]; nn(i => java.lang.Boolean.valueOf(v.get(i) == 1))
      case (_, DateType) =>
        val v = vec.asInstanceOf[DateDayVector]
        nn(i => new java.sql.Date(v.get(i).toLong * 86400000L))
      case (_, TimestampType) =>
        val v = vec.asInstanceOf[TimeStampMicroTZVector]
        nn(i => microsToSqlTimestamp(v.get(i)))
      case (_, TimestampNTZType) =>
        val v = vec.asInstanceOf[TimeStampMicroVector]
        nn(i => java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(v.get(i), 1000000L),
          (Math.floorMod(v.get(i), 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
      case (_, _: DecimalType) =>
        val v = vec.asInstanceOf[DecimalVector]; nn(i => v.getObject(i))
      case (_, NullType) => _ => null
      case (_, ArrayType(et, _)) =>
        val v = vec.asInstanceOf[ListVector]
        val childGetter = mkGetter(v.getDataVector.asInstanceOf[FieldVector], et, None)
        nn { i =>
          val start = v.getElementStartIndex(i)
          val end = v.getElementEndIndex(i)
          (start until end).map(childGetter).toIndexedSeq
        }
      case (_, st: StructType) =>
        val v = vec.asInstanceOf[StructVector]
        val childGetters = st.fields.zipWithIndex.map { case (cf, ci) =>
          mkGetter(v.getChildrenFromFields.get(ci), cf.dataType, origTagOf(cf))
        }
        nn(i => Row.fromSeq(childGetters.map(g => g(i)).toIndexedSeq))
      case (_, other) => throw new UnsupportedOperationException(s"read: $other")
    }
  }

  private def microsToSqlTimestamp(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }
}
