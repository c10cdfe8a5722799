package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.bpe_apply

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al., ACL 2016) — the
  * piece of an LLM data pipeline that comes before everything tokenized:
  * learn the `nMerges` highest-count adjacent symbol merges over the
  * corpus word distribution, character-seeded.
  *
  * Scale shape: the corpus is scanned ONCE — training runs entirely on
  * the persisted (word, count, symbols) vocabulary relation, which is
  * vocab-sized, not corpus-sized (the classic BPE trick: pair counts
  * weight by word frequency instead of touching word instances). Each
  * merge round is ONE map-side-combining aggregate over that relation
  * plus a driver-side argmax of a single row — the same bounded-driver
  * division of labor as [[Similarity.kmeansFit]]. Pair counting follows
  * the standard convention (all adjacent pairs, overlapping included);
  * merge APPLICATION is greedy left-to-right non-overlapping
  * ([[graft.functions.BpeApply]]). Ties break lexicographically on the
  * pair, so training is deterministic.
  *
  * Not SQL-expressible (the argmax of round r feeds the projection of
  * round r+1 — an iterative fixpoint like q52's clustering), so the gate
  * is the driver's rows-only check plus the exact-fixture spec; q98 is
  * the documented oracle exemption in ContractSpec.
  */
object Bpe {

  /** The learned merge table and the vocabulary in its final
    * segmentation, plus the cache handle for the shared vocab relation.
    */
  case class BpeModel(merges: DataFrame, vocab: DataFrame) {
    def unpersist(): Unit = { vocab.unpersist(); () }
  }

  def train(docs: DataFrame, nMerges: Int): BpeModel = {
    val spark = docs.sparkSession
    val base = docs
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      .withColumn("sym", split(col("word"), ""))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var tab = base
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // all adjacent pairs (overlap allowed — the counting convention),
      // weighted by word frequency; symbols never contain a space, so
      // "a b" is a collision-free pair key
      val top = tab
        .filter(size(col("sym")) >= 2)
        .select(col("wcount"),
          explode(transform(sequence(lit(1), size(col("sym")) - 1), i =>
            concat(element_at(col("sym"), i), lit(" "),
              element_at(col("sym"), i + 1)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wcount")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((r, a, b, a + b, cnt))
        tab = tab.withColumn("sym", bpe_apply(col("sym"), a, b))
        r += 1
      }
    }
    import spark.implicits._
    BpeModel(
      merges.result()
        .toDF("rank", "left", "right", "merged", "pair_count"),
      tab.select(col("word"), col("wcount"),
        col("sym").as("segmentation")))
  }

  /** The learned merge table alone (q98's gate output). */
  def trainMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    val m = train(docs, nMerges)
    // the merge table is already materialized driver-side; the vocab
    // cache can go immediately
    m.unpersist()
    m.merges
  }
}
