package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming deduplication over a document stream (SURVEY.md §2.14).
  *
  * State posture at 100 TB: keying dedup state by the 16-byte content
  * fingerprint (never the document text) keeps the state store compact, and
  * `dropDuplicatesWithinWatermark` bounds it by event time — state for a
  * fingerprint is evicted once the watermark passes it, which is the only
  * way streaming dedup survives unbounded input. Exact-forever dedup
  * (plain `dropDuplicates`) is provided for bounded/replay jobs where the
  * fingerprint universe fits the state store.
  */
object StreamingDedup {

  /** Fingerprint + event-time projection: (ts, doc_id, fp). */
  def fingerprinted(docsStream: DataFrame): DataFrame =
    docsStream.select(col("ts"), col("doc_id"),
      md5(TextAnalysis.normalized(col("text"))).as("fp"))

  /** Keep the first document per content fingerprint, with state bounded by
    * the watermark: duplicates arriving within `watermarkDelay` of the
    * original are dropped; state older than the watermark is evicted.
    */
  def dedupWithinWatermark(docsStream: DataFrame,
                           watermarkDelay: String = "10 minutes"): DataFrame =
    fingerprinted(docsStream)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Exact dedup across the whole stream history (unbounded state — only
    * for bounded replays).
    */
  def dedupExact(docsStream: DataFrame): DataFrame =
    fingerprinted(docsStream).dropDuplicates("fp")
}
