package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}

/** Round-5 scale probes at 100-2000× the gated SF: the new operators'
  * cost curves at 1 M docs / 1 M embeddings / 10 M probe keys, plus the
  * deep-graph behavior of the checkpoint-truncated connected components.
  * Measurement rule from ProbeCuration: force evaluation through an
  * aggregate or a real consumer — `count()` lets ColumnPruning delete
  * projections.
  */
object ProbeRound5 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-round5").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.catalog.clearCache()
    }

    val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()

    // single-pass heavy hitters (q66 shape) at 1M docs / 50M tokens
    time("heavy_hitters_1m") {
      val st = TextAnalysis.heavyHittersStage(docs)
      val n = st.result.count()
      st.unpersist(); n
    }
    // repetition signals: projection + collapsed bigram explode
    time("repetition_1m")(TextAnalysis.repetitionSignals(docs)
      .agg(count(when(col("dup_word_frac") >= 0, 1))).head().getLong(0))
    // TF-IDF over 1M docs x 1000-word vocab
    time("tfidf_1m")(TextAnalysis.tfIdfTopTerms(docs, k = 3).count())

    // bloom: build over 1M keys, probe 10M rows
    time("bloom_build_probe_10m") {
      import graft.functions.AggFunctions.{bloom_agg, bloom_might_contain}
      val bits = 1 << 24 // 16M bits = 2 MB for ~1M keys -> fp ~2%
      val bf = spark.range(1000000L).select(col("id"))
        .agg(bloom_agg(col("id"), bits, 3).as("bf"))
      spark.range(10000000L).crossJoin(broadcast(bf))
        .filter(bloom_might_contain(col("bf"), col("id"), bits, 3))
        .count()
    }

    // int8-quantized ANN over 1M embeddings (8 queries)
    val emb = ScaleProbe.syntheticEmbeddings(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    emb.count()
    time("quantized_topk_1m")(
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 8), k = 10).count())
    time("brute_topk_1m_float")(
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 8), k = 10).count())

    // connected components on an adversarially deep graph: 1000 paths of
    // diameter 99 (~100k edges) — ~99 label-propagation rounds with
    // per-round localCheckpoint; without truncation this plan would be
    // hundreds of joins deep by the last round
    time("cc_deep_1000x100") {
      val pairs = spark.range(100000L)
        .filter(col("id") % 100 =!= 99)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val out = Dedup.nearDupClusters(pairs)
      val n = out.count()
      Dedup.releaseClusters(out); n
    }

    // grouping sets at 6M lineitem-ish rows
    time("grouping_sets_6m") {
      val li = spark.range(6000000L).select(
        concat(lit("f"), pmod(col("id"), lit(3))).as("l_returnflag"),
        concat(lit("s"), pmod(col("id"), lit(2))).as("l_linestatus"),
        (pmod(col("id"), lit(50)) + 1).cast("double").as("l_quantity"))
      Relational.groupingSetsTotals(li).count()
    }
    spark.stop()
  }
}
