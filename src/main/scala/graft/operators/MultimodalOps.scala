package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched decode/feature-extract per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[stubDecode]]); the Spark-side
  * plumbing — binary column, metadata struct schema, partition-parallel
  * batched transform, output schema — is real and tested. Swapping the
  * stub for a real decoder (JNI/ffmpeg/Pillow-equivalent) changes no plan
  * shape.
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
        |ORDER BY doc_id""".stripMargin)
  )
}
