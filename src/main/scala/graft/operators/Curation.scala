package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: the composition layer a large-scale
  * LLM-data pipeline runs after the per-document analyses — language +
  * quality filtering with exact-dedup survivor selection, and
  * deterministic stratified sampling to rebalance the language mix.
  *
  * Scale design: both operators are ONE projection over the corpus scan
  * (pred_lang, quality, fingerprint all fuse into whole-stage codegen —
  * see [[TextAnalysis.predLang]]/[[TextAnalysis.qualityScore]]) plus, for
  * [[curate]], a single shuffle on the 8-byte fp64 fingerprint for the
  * survivor window. Joining the three analysis operators' outputs by
  * doc_id instead would scan and shuffle the corpus three times for the
  * same answer.
  */
object Curation {

  /** Curated corpus: exact-dedup canonical survivors (smallest doc_id per
    * content fingerprint, chosen over the FULL corpus before any filter so
    * the survivor does not depend on filter order), restricted to the
    * requested language at or above the quality floor. `dup_cnt` carries
    * how many raw documents the surviving row represents.
    */
  def curate(docs: DataFrame, lang: String, minQuality: Double): DataFrame = {
    val enriched = docs.select(
      col("doc_id"),
      TextAnalysis.predLang(col("text")).as("pred_lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      size(TextAnalysis.tokens(col("text"))).as("n_words"),
      TextAnalysis.fp64Expr(col("text")).as("fp64"))
    val w = Window.partitionBy(col("fp64"))
    enriched
      .withColumn("dup_cnt", count(lit(1)).over(w))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
      .filter(col("pred_lang") === lang && col("quality") >= minQuality)
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        col("n_words"), col("dup_cnt"))
  }

  /** Deterministic hash bucket 0..99 from the md5 of the stringified id —
    * the engine-portable sampling coin: stable across runs, partitions,
    * and engines (DuckDB replays it as
    * `('0x' || substr(md5(id::VARCHAR), 1, 4))::INT % 100`).
    */
  def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int") % 100

  /** Stratified sampling by predicted language: each stratum keeps the
    * documents whose hash bucket falls under its percentage (`rates`,
    * else `defaultPct`). Content-hash sampling beats `rand()` at scale:
    * it is reproducible (reruns and retried tasks sample identically,
    * which exactly-once sinks need), joinable (two tables sampled on the
    * same key stay aligned), and engine-portable for the oracle. One
    * projection + filter, no shuffle at all.
    */
  /** Fixed-size deterministic sample per stratum: the k documents with
    * the smallest md5(doc_id) in each predicted language — the "show me
    * k examples per slice" primitive. Hash-priority selection is a
    * single-pass distributed reservoir: Spark executes the ranking window
    * as WindowGroupLimit (per-partition top-k heaps before the shuffle),
    * so the full stratum never sorts.
    */
  def fixedSizeSample(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("pred_lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs.select(col("doc_id"),
        TextAnalysis.predLang(col("text")).as("pred_lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (e, (l, p)) =>
      when(col("pred_lang") === l, lit(p)).otherwise(e)
    }
    docs.select(
        col("doc_id"),
        TextAnalysis.predLang(col("text")).as("pred_lang"),
        hashBucket(col("doc_id")).as("bucket"))
      .filter(col("bucket") < pct)
  }
}
