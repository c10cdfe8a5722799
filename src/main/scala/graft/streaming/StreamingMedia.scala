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

  /** Streaming FUZZY near-dup alerting against a known corpus: one row
    * per (arriving image, corpus hash within hamming `maxHamming`).
    *
    * Before the r15 optimizer rules this shape was a streaming
    * non-starter: `bit_count(dhash ^ hash) <= t` has no equi key, so
    * every micro-batch would nested-loop the whole corpus per arrival —
    * which is why [[imageDedupStream]] limited streaming to the exact
    * (hamming-0) class and deferred hamming ≤ t to the batch q145 job.
    * [[graft.plans.HammingJoinRewrite]] changes the calculus: the naive
    * condition below is rebuilt into the Manku block equi-join, with the
    * stream side's Generate a STATELESS per-row explode — no state
    * store, no watermark, append-safe, and per-batch cost proportional
    * to block-bucket overlap instead of corpus size.
    *
    * INNER join deliberately: near-dup ALERTING emits on match (possibly
    * several corpus neighbors per arrival — the t>0 classes genuinely
    * overlap); per-arrival "is there any dup" rows stay with
    * [[imageDedupStream]], whose left join is equi-keyed. A left-outer
    * spelling here would put the non-equi condition back on a
    * BroadcastNestedLoopJoin (the rewrite is inner-only by its
    * multiplicity argument).
    */
  def nearDupPairsStream(mediaStream: DataFrame, knownHashes: DataFrame,
                         maxHamming: Int = 3): DataFrame = {
    val hamming = bit_count(col("dhash").bitwiseXOR(col("hash")))
    dhashStream(mediaStream)
      .join(knownHashes, hamming <= maxHamming)
      .select(col("ts"), col("media_id"), col("dhash"),
        col("known_id"), hamming.cast("int").as("hamming"))
  }
}
