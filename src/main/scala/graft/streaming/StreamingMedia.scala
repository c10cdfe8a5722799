package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the pixel-level media layer — the
  * [[StreamingCuration]] discipline applied to binary payloads: every
  * operator here is a stateless per-row projection or a stream-static
  * join, so it drops into any micro-batch pipeline with no watermark,
  * no state store, and append-mode semantics for free.
  */
object StreamingMedia {

  /** Per-arriving-image decode + perceptual hash: the batch
    * [[graft.operators.Multimodal.imageDhashes]] columns with the event
    * time carried through (identical expression — batch ≡ stream by
    * construction). Undecodable payloads keep their row with null
    * columns, the in-band contract.
    */
  def dhashStream(mediaStream: DataFrame): DataFrame =
    mediaStream.select(col("ts"), col("media_id"),
        graft.functions.MediaFunctions.image_dhash(col("payload")).as("d"))
      .select(col("ts"), col("media_id"), col("d.width").as("width"),
        col("d.height").as("height"), col("d.dhash").as("dhash"))

  /** Streaming image dedup against a KNOWN corpus: each arriving image
    * is hashed and matched by EXACT dHash equality to a static
    * (known_id, hash) index — hash equality IS the perceptual
    * hamming-0 class (brightness-shifted re-encodes collide exactly;
    * MultimodalSpec pins it), the class that dominates crawl duplicate
    * volume. One stream-static equi-join on an 8-byte key, no state,
    * no watermark; the hamming ≤ t generalization stays a batch job
    * ([[graft.operators.Multimodal.imageNearDups]]) exactly like
    * incremental text dedup pairs the streaming exact pass with batch
    * MinHash. The index side dedupes to one representative per hash
    * (smallest id) so output stays one row per arriving image.
    */
  def imageDedupStream(mediaStream: DataFrame,
                       knownHashes: DataFrame): DataFrame = {
    val idx = knownHashes
      .groupBy(col("hash")).agg(min(col("known_id")).as("dup_of"))
    dhashStream(mediaStream)
      .join(idx, col("dhash") === col("hash"), "left")
      .select(col("ts"), col("media_id"), col("dhash"), col("dup_of"),
        col("dup_of").isNotNull.cast("int").as("is_dup"))
  }
}
