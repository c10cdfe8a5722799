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

  /** Streaming twin of [[graft.operators.Dedup.dedupAgainstCorpus]]'s
    * near-dup arm: each streamed document's LSH bands probe a STATIC
    * corpus band index (stream-static join — stateless, no store), exact
    * Jaccard verifies the candidates, and the only stateful operator is
    * the watermark-bounded dedup of (doc_id, corp_id) matches (a pair can
    * collide in several bands). Emits one row per (incoming doc, corpus
    * near-dup) — the "today's crawl vs the living corpus" check as a
    * continuous query. The corpus index and shingle relations are what
    * production precomputes; at scale they arrive as parquet, not a
    * recomputation.
    */
  /** [[nearDupsAgainstCorpusStage]]'s streaming result with the cache
    * handle for the persisted static corpus index (ADVICE r7: the repo's
    * stage-handle discipline applies to streaming operators too — a
    * driver running several queries per session must be able to release
    * the index when the query stops, not wait for session teardown).
    */
  case class CorpusProbeStage(corpusIndex: DataFrame, result: DataFrame) {
    def unpersist(): Unit = { corpusIndex.unpersist(); () }
  }

  def nearDupsAgainstCorpus(docsStream: DataFrame, corpus: DataFrame,
                            threshold: Double = 0.5,
                            watermarkDelay: String = "10 minutes"): DataFrame =
    nearDupsAgainstCorpusStage(docsStream, corpus, threshold, watermarkDelay)
      .result

  def nearDupsAgainstCorpusStage(docsStream: DataFrame, corpus: DataFrame,
                                 threshold: Double = 0.5,
                                 watermarkDelay: String = "10 minutes"): CorpusProbeStage = {
    import graft.operators.Dedup
    // the static side of a stream-static join re-evaluates EVERY
    // micro-batch — persist the one-scan corpus index so each batch pays
    // a cache read, not a corpus re-shingle (production reads
    // precomputed parquet; the stage handle releases it on query stop)
    val corpIdx = Dedup.dedupIndex(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpBands = Dedup.bandsFromIndex(corpIdx)
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("corp_id"))
    val corpSh = corpIdx.select(col("doc_id").as("corp_id"),
      col("sh").as("sh_corp"))
    val inBands = docsStream
      .select(col("ts"), col("doc_id"),
        array_distinct(Dedup.shingles(col("text"))).as("sh_in"),
        posexplode(transform(
          sequence(lit(0), lit(Dedup.LshBands - 1)),
          b => md5(concat_ws("|", slice(
            Dedup.minhashSignature(Dedup.shingles(col("text")), Dedup.MinhashK),
            b * Dedup.LshRows + 1, lit(Dedup.LshRows)))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
      .filter(size(col("sh_in")) > 0)
    val result = inBands
      .join(corpBands, Seq("band_idx", "band_hash"))
      .join(corpSh, "corp_id")
      .select(col("ts"), col("doc_id"), col("corp_id"),
        round(Dedup.jaccard(col("sh_in"), col("sh_corp")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id", "corp_id")
    CorpusProbeStage(corpIdx, result)
  }
}
