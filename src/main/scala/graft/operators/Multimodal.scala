package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run per-record feature
  * extraction through a batched partition-level decode.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[DecodeStub.decode]] derives deterministic fake features
  * from the bytes. Everything around it — schema, binary columns,
  * partition-level batching, feature struct shape — is the real Spark
  * plumbing a production decoder would drop into (replace the stub body
  * with the codec call; the plan shape does not change).
  *
  * Scale notes: decode is a narrow mapPartitions (no shuffle); payload
  * columns stay binary end-to-end (never stringified); metadata-only
  * queries never touch the payload column thanks to parquet column
  * pruning — that's the entire point of splitting metadata from payload.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Deterministic fake features standing in for a real decoder. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           header: String, checksum: Long)

  /** Build a media table from the documents table (text bytes standing in
    * for encoded payloads — the driver testdata ships no real media).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
      col("text").cast("binary").as("payload"))

  object DecodeStub {
    /** STUB — stands in for e.g. JPEG decode + feature extraction. Real
      * implementation would decode `payload` and emit embedding/shape
      * features; this derives deterministic values from the raw bytes so
      * tests can assert the plumbing end-to-end.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length
      val header = r.payload.take(8).map(b => f"$b%02x").mkString
      val checksum = r.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) & 0x7fffffffL)
      MediaFeatures(r.media_id, r.kind, n, header, checksum)
    }
  }

  /** Batched decode: one stub call per record, amortized per partition —
    * the Scala analog of `mapInPandas` (partition-at-a-time, no
    * per-row planning overhead).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(DecodeStub.decode))
  }
}
