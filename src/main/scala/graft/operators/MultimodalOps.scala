package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode/feature-extract per partition.
  *
  * Two decode tiers:
  *  - [[decodePpm]] is a REAL image decoder — binary P6 PPM (magic,
  *    comments, dims, maxval, interleaved RGB bytes) parsed from the
  *    payload with channel-mean + Rec.601 luma features (m03). The
  *    payloads are real image bytes synthesized deterministically, so
  *    the DuckDB oracle can recompute every pixel.
  *  - [[stubDecode]] remains the clearly-marked stand-in for formats
  *    whose codecs the container lacks (JPEG/audio/video); the
  *    surrounding plumbing — binary column, metadata struct,
  *    partition-parallel batched transform — is identical, so swapping
  *    in a JNI/ffmpeg decoder changes no plan shape.
  */
object MultimodalOps {

  /** Output schema of the feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** STUB decoder: stands in for an image decode. Deterministic fake:
    * derives "dimensions" and a "mean luma" from the payload bytes alone,
    * so tests are stable. A real build would decode `payload` here.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val w = math.max(1, n % 640)
    val h = math.max(1, (n * 7) % 480)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    (w, h, if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Output schema of the real image feature extractor. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Deterministic P6 PPM payload for a doc id — REAL image bytes:
    * ASCII header (magic, width, height, maxval) + interleaved RGB.
    * Dims 4..16 × 4..14; pixel byte k = (id·31 + k·7) mod 256. */
  def ppmBytes(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 13).toInt
    val h = 4 + ((docId * 3) % 11).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var k = 0
    while (k < px.length) { px(k) = ((docId * 31 + k * 7) % 256).toByte; k += 1 }
    header ++ px
  }

  /** Real P6 decoder: parses magic / `#` comments / dims / maxval, then
    * accumulates per-channel sums over the raster. Returns (width,
    * height, mean_r, mean_g, mean_b, rec601_luma_of_means). */
  def decodePpm(b: Array[Byte]): (Int, Int, Double, Double, Double, Double) = {
    var pos = 0
    def skipWs(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos)
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else go = false
      }
    }
    def token(): String = {
      skipWs()
      val s0 = pos
      while (pos < b.length && !Character.isWhitespace(b(pos).toChar)) pos += 1
      new String(b, s0, pos - s0, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM (P6) payload")
    val w = token().toInt
    val h = token().toInt
    require(token().toInt == 255, "unsupported maxval")
    pos += 1 // exactly one whitespace byte separates header from raster
    val n = w * h
    var rs = 0L; var gs = 0L; var bs = 0L
    var p = 0
    while (p < n) {
      rs += b(pos + 3 * p) & 0xff
      gs += b(pos + 3 * p + 1) & 0xff
      bs += b(pos + 3 * p + 2) & 0xff
      p += 1
    }
    val mr = rs.toDouble / n
    val mg = gs.toDouble / n
    val mb = bs.toDouble / n
    (w, h, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb)
  }

  /** Output schema of the real audio feature extractor. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** Deterministic RIFF/WAV payload for a doc id — REAL audio bytes:
    * 16-bit mono PCM at 8 kHz, 64..254 samples, sample k =
    * ((id·131 + k·17) mod 65536) − 32768. Every third doc carries an
    * extra LIST chunk between fmt and data, so the decoder's
    * chunk-walking (not just fixed offsets) is exercised. */
  def wavBytes(docId: Long): Array[Byte] = {
    val rate = 8000
    val n = 64 + (docId % 191).toInt
    val junk = if (docId % 3 == 0) 8 + 6 else 0
    val dataSize = 2 * n
    val riffSize = 4 + (8 + 16) + junk + (8 + dataSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    if (junk > 0) bb.put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("GRAFT!".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) {
      bb.putShort((((docId * 131 + k * 17) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /** Real WAV decoder: validates RIFF/WAVE magic, walks chunks (even-
    * padded), parses fmt (PCM, mono, 16-bit required), then folds the
    * data chunk into mean amplitude and RMS. */
  def decodeWav(b: Array[Byte]): (Int, Int, Double, Double, Double) = {
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val c = new Array[Byte](4); bb.get(c); new String(c, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF payload")
    bb.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE form")
    var rate = -1
    var dataOff = -1
    var dataLen = -1
    while (bb.remaining() >= 8 && (rate < 0 || dataOff < 0)) {
      val id = fourcc()
      val len = bb.getInt
      val next = bb.position() + len + (len & 1) // chunks are even-padded
      id match {
        case "fmt " =>
          require(bb.getShort == 1, "not PCM")
          require(bb.getShort == 1, "not mono")
          rate = bb.getInt
          bb.getInt; bb.getShort
          require(bb.getShort == 16, "not 16-bit")
        case "data" => dataOff = bb.position(); dataLen = len
        case _      => () // skip unknown chunks (LIST etc.)
      }
      bb.position(next)
    }
    require(rate > 0 && dataOff >= 0, "missing fmt or data chunk")
    val n = dataLen / 2
    var sum = 0L
    var sq = 0L
    var k = 0
    while (k < n) {
      val v = bb.getShort(dataOff + 2 * k).toLong
      sum += v; sq += v * v; k += 1
    }
    (rate, n, n.toDouble / rate, sum.toDouble / n,
      math.sqrt(sq.toDouble / n))
  }

  /** Output schema of the frame-sampling extractor. */
  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sampled_frames", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Deterministic multi-frame container for a doc id: [n_frames:4 LE]
    * then per frame [len:4 LE][P6 PPM bytes]; frame f's image is
    * ppmBytes(id·7 + f), 2..6 frames per doc. */
  def framesBytes(docId: Long): Array[Byte] = {
    val nf = 2 + (docId % 5).toInt
    val frames = (0 until nf).map(f => ppmBytes(docId * 7 + f))
    val bb = java.nio.ByteBuffer.allocate(4 + frames.map(4 + _.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(nf)
    frames.foreach { fr => bb.putInt(fr.length); bb.put(fr) }
    bb.array()
  }

  /** Walks the container by its length prefixes, decodes ONLY every
    * `k`-th frame (others are skipped by seek, never parsed — what
    * makes sparse sampling cheap), and folds sampled lumas in frame
    * order. Returns (n_frames, sampled_count, mean_sampled_luma). */
  def sampleFrames(b: Array[Byte], k: Int): (Int, Int, Double) = {
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nf = bb.getInt
    var sum = 0.0
    var sampled = 0
    var f = 0
    while (f < nf) {
      val len = bb.getInt
      if (f % k == 0) {
        val frame = new Array[Byte](len)
        bb.get(frame)
        sum += decodePpm(frame)._6
        sampled += 1
      } else bb.position(bb.position() + len) // seek past, no decode
      f += 1
    }
    (nf, sampled, sum / sampled)
  }

  /** documents.text re-framed as an opaque binary payload column with a
    * metadata struct — the multimodal table shape. */
  def binaryTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        length(encode(col("text"), "UTF-8")).as("byte_len")).as("meta"))

  /** Partition-parallel batched feature extraction over the binary
    * column — the mapPartitions shape a real decoder would use (one
    * decoder init per partition, row-batched inner loop). */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      // decoder init would happen once per partition here
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, luma) = stubDecode(payload)
        Row(id, payload.length, w, h, luma)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val all: Seq[QueryDef] = Seq(

    // -- binary ingest + metadata (fully SQL-checkable) ----------------
    QueryDef.sql("m01_binary_meta",
      (s, d) => binaryTable(s, d)
        .select(col("doc_id"),
          col("meta.byte_len").as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          col("meta.mime").as("mime"))
        .orderBy(col("doc_id")),
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  md5(text) AS payload_md5,
        |  'text/plain' AS mime
        |FROM documents
        |ORDER BY doc_id""".stripMargin),

    // -- stub decode features: oracle mirrors the stub's arithmetic ----
    QueryDef.sql("m02_decode_features",
      (s, d) => extractFeatures(binaryTable(s, d)).orderBy(col("doc_id")),
      // documents.text is pure ASCII (verified), so UTF-8 payload bytes
      // == text chars and the oracle can do char arithmetic directly.
      """WITH b AS (
        |  SELECT doc_id, text AS t, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id, n AS byte_len,
        |  greatest(1, n % 640) AS width,
        |  greatest(1, (n * 7) % 480) AS height,
        |  CAST(list_reduce([0] || list_transform(range(1, n + 1),
        |    i -> ascii(t[i:i])), (a, x) -> a + x) AS DOUBLE) / n AS mean_luma
        |FROM b
        |ORDER BY doc_id""".stripMargin),

    // -- REAL image decode: P6 PPM parse + channel means ---------------
    // The payload is genuine image bytes; the decoder genuinely parses
    // them (magic, comments, dims, maxval, raster). The oracle
    // recomputes every pixel from the generation recipe — header
    // arithmetic included — so a parser bug (off-by-one into the
    // raster, header length miscount) fails the hash.
    QueryDef.sql("m03_image_decode",
      (s, d) => {
        val ids = Tables.documents(s, d)
          .select(col("doc_id")).filter(col("doc_id") < 500)
        val feats = ids.rdd.mapPartitions { it =>
          // decoder state would init once per partition here
          it.map { r =>
            val id = r.getLong(0)
            val payload = ppmBytes(id)
            val (w, h, mr, mg, mb, luma) = decodePpm(payload)
            Row(id, payload.length, w, h, mr, mg, mb, luma)
          }
        }
        s.createDataFrame(feats, imageFeatureSchema).orderBy(col("doc_id"))
      },
      """WITH b AS (
        |  SELECT doc_id, 4 + doc_id % 13 AS w, 4 + (doc_id * 3) % 11 AS h
        |  FROM documents WHERE doc_id < 500),
        |s AS (
        |  SELECT doc_id, w, h, w * h AS n,
        |    3 + length(CAST(w AS VARCHAR)) + 1 + length(CAST(h AS VARCHAR)) + 5
        |      + 3 * w * h AS byte_len,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, w * h),
        |      p -> (doc_id * 31 + (3 * p) * 7) % 256), (a, x) -> a + x) AS rs,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, w * h),
        |      p -> (doc_id * 31 + (3 * p + 1) * 7) % 256), (a, x) -> a + x) AS gs,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, w * h),
        |      p -> (doc_id * 31 + (3 * p + 2) * 7) % 256), (a, x) -> a + x) AS bs
        |  FROM b)
        |SELECT doc_id, byte_len, w AS width, h AS height,
        |  CAST(rs AS DOUBLE) / n AS mean_r,
        |  CAST(gs AS DOUBLE) / n AS mean_g,
        |  CAST(bs AS DOUBLE) / n AS mean_b,
        |  0.299 * (CAST(rs AS DOUBLE) / n) + 0.587 * (CAST(gs AS DOUBLE) / n)
        |    + 0.114 * (CAST(bs AS DOUBLE) / n) AS mean_luma
        |FROM s
        |ORDER BY doc_id""".stripMargin),

    // -- REAL audio decode: RIFF/WAV chunk walk + PCM stats ------------
    // Genuine wave-file bytes (RIFF header, fmt chunk, an interleaved
    // LIST chunk on every third doc, 16-bit PCM data); the decoder
    // genuinely walks chunks and folds samples. The oracle recomputes
    // every sample and the full container byte length from the
    // generation recipe, so a header offset bug, a chunk-skip bug, or a
    // sign error in the PCM decode fails the hash.
    QueryDef.sql("m04_audio_decode",
      (s, d) => {
        val ids = Tables.documents(s, d)
          .select(col("doc_id")).filter(col("doc_id") < 500)
        val feats = ids.rdd.mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val payload = wavBytes(id)
            val (rate, n, dur, mean, rms) = decodeWav(payload)
            Row(id, payload.length, rate, n, dur, mean, rms)
          }
        }
        s.createDataFrame(feats, audioFeatureSchema).orderBy(col("doc_id"))
      },
      """WITH b AS (
        |  SELECT doc_id, 64 + doc_id % 191 AS n,
        |    CASE WHEN doc_id % 3 = 0 THEN 14 ELSE 0 END AS junk
        |  FROM documents WHERE doc_id < 500),
        |v AS (
        |  SELECT doc_id, n, 44 + 2 * n + junk AS byte_len,
        |    list_transform(range(0, n),
        |      k -> (doc_id * 131 + k * 17) % 65536 - 32768) AS vs
        |  FROM b),
        |s AS (
        |  SELECT doc_id, n, byte_len,
        |    list_reduce([CAST(0 AS BIGINT)] || vs, (a, x) -> a + x) AS sm,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(vs, x -> x * x),
        |      (a, x) -> a + x) AS sq
        |  FROM v)
        |SELECT doc_id, byte_len, 8000 AS sample_rate, n AS n_samples,
        |  CAST(n AS DOUBLE) / 8000 AS duration_s,
        |  CAST(sm AS DOUBLE) / n AS mean_amp,
        |  sqrt(CAST(sq AS DOUBLE) / n) AS rms
        |FROM s
        |ORDER BY doc_id""".stripMargin),

    // -- frame sampling over a multi-frame container -------------------
    // The video-pipeline op the mandate names (decode / frame-sample):
    // payloads are REAL multi-frame containers ([n:4 LE] then per frame
    // [len:4 LE][P6 PPM bytes]); the extractor walks the container by
    // its length prefixes, decodes ONLY every 3rd frame with the same
    // P6 parser m03 uses (skip cost is a seek, not a decode — the
    // property that makes sparse sampling cheap at scale), and folds
    // sampled lumas. The oracle recomputes sampled frames analytically,
    // so frame indexing or seek-offset bugs fail the hash.
    QueryDef.sql("m05_frame_sample",
      (s, d) => {
        val ids = Tables.documents(s, d)
          .select(col("doc_id")).filter(col("doc_id") < 300)
        val feats = ids.rdd.mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val payload = framesBytes(id)
            val (n, sampled, meanLuma) = sampleFrames(payload, 3)
            Row(id, payload.length, n, sampled, meanLuma)
          }
        }
        s.createDataFrame(feats, frameFeatureSchema).orderBy(col("doc_id"))
      },
      // frame f of doc id is ppmBytes(id*7 + f); sampled frames are
      // f % 3 == 0; per-frame mean luma mirrors the m03 arithmetic
      """WITH b AS (
        |  SELECT doc_id, 2 + doc_id % 5 AS nf FROM documents WHERE doc_id < 300),
        |f AS (
        |  SELECT doc_id, nf, unnest(range(0, nf)) AS fi FROM b),
        |dims AS (
        |  SELECT doc_id, nf, fi, doc_id * 7 + fi AS fid,
        |    4 + (doc_id * 7 + fi) % 13 AS w,
        |    4 + ((doc_id * 7 + fi) * 3) % 11 AS h
        |  FROM f),
        |sz AS (
        |  SELECT doc_id, nf, fi, fid, w, h, w * h AS n,
        |    3 + length(CAST(w AS VARCHAR)) + 1 + length(CAST(h AS VARCHAR)) + 5
        |      + 3 * w * h AS frame_len
        |  FROM dims),
        |lum AS (
        |  SELECT doc_id, nf, fi, frame_len,
        |    0.299 * (CAST(list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, n),
        |        p -> (fid * 31 + (3 * p) * 7) % 256), (a, x) -> a + x) AS DOUBLE) / n)
        |    + 0.587 * (CAST(list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, n),
        |        p -> (fid * 31 + (3 * p + 1) * 7) % 256), (a, x) -> a + x) AS DOUBLE) / n)
        |    + 0.114 * (CAST(list_reduce([CAST(0 AS BIGINT)] || list_transform(range(0, n),
        |        p -> (fid * 31 + (3 * p + 2) * 7) % 256), (a, x) -> a + x) AS DOUBLE) / n)
        |      AS luma
        |  FROM sz),
        |agg AS (
        |  SELECT doc_id, nf,
        |    4 + CAST(SUM(4 + frame_len) AS BIGINT) AS byte_len,
        |    COUNT(*) FILTER (WHERE fi % 3 = 0) AS sampled,
        |    -- ordered left fold, not SUM: the decoder accumulates lumas
        |    -- in frame order, and double addition must replay that exact
        |    -- IEEE sequence to hash-match
        |    list_reduce([CAST(0.0 AS DOUBLE)] ||
        |      list(luma ORDER BY fi) FILTER (WHERE fi % 3 = 0),
        |      (a, x) -> a + x)
        |      / COUNT(*) FILTER (WHERE fi % 3 = 0) AS mean_luma
        |  FROM lum GROUP BY doc_id, nf)
        |SELECT doc_id, byte_len, nf AS n_frames,
        |  CAST(sampled AS INTEGER) AS sampled_frames, mean_luma
        |FROM agg
        |ORDER BY doc_id""".stripMargin)
  )
}
