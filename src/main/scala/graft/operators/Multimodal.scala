package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract run per-partition
  * over batches of payloads.
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container ships no image/audio codecs) — everything Spark-side is real
  * and tested: the schema contract, the partition-wise batched execution
  * shape (the Scala analogue of `mapInPandas`), and the downstream typed
  * feature columns. A real decoder drops into [[decodeStub]] without
  * touching any caller.
  *
  * Scale notes: payloads stay columnar-compressed in parquet until the
  * decode task touches them; `withPayloads.repartition(n)` sizes decode
  * tasks independently of upstream file splits, which is the knob that
  * matters when each payload is MBs of image rather than bytes of text.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      checksum: Long, width: Int, height: Int, mean_intensity: Double)

  /** Wrap the documents table as (id, type, binary payload) — the ingest
    * contract a real pipeline would satisfy with image/audio bytes. */
  def withPayloads(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Deterministic fake "decode": byte stats standing in for a codec.
    * Replace the body with the real decoder (keeping the signature) to get
    * actual image features — callers and tests are agnostic. */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var sum = 0L
    var h = 1125899906842597L // deterministic FNV-ish rolling checksum
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      h = h * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val side = math.max(1, math.sqrt(bytes.length.toDouble).toInt)
    MediaFeatures(row.doc_id, row.media_type, bytes.length.toLong, h,
      side, side,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
  }

  /** Partition-wise batched feature extraction (the `mapInPandas` shape:
    * one iterator of rows in, one iterator of feature rows out, executed
    * per partition with no driver involvement). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** End-to-end: ingest → decode → typed feature DataFrame. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(withPayloads(spark, sfDir)).toDF()
}
