package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** Round-8 scale probes, closing the two measurement gaps VERDICT r7
  * named: (1) BPE training at a production-shaped merge count (>= 1,000
  * merges over 1M docs) with the checkpoint cadence keeping plans flat,
  * and (2) the swept hot-bucket cap under adversarial skew — one band
  * bucket holding ~30% of the corpus — against the window form it
  * replaced, which buffers that bucket in a single task.
  */
object ProbeRound8 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-round8").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.catalog.clearCache()
    }

    val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()

    // ---- BPE at a realistic merge count (VERDICT r6 #2 / r7 #2) ----
    // 1,000 merges over 1M docs: the corpus explode collapses to the
    // ~1,000-word vocab relation up front, batched rounds accept up to
    // batchK merges per aggregate, and the 25-merge localCheckpoint
    // cadence keeps the plan depth bounded no matter the merge count.
    time("bpe_train_1000_merges_1m") {
      val model = graft.operators.Bpe.train(docs, nMerges = 1000)
      val n = model.merges.count()
      require(n >= 1000L, s"expected >= 1000 merges, got $n")
      // bounded plan depth: the final vocab plan must sit on a
      // checkpoint leaf with at most one uncheckpointed batch of
      // bpe_apply projections stacked above it
      val logical = model.vocab.queryExecution.logical
      val hasCkptLeaf = logical.collectFirst {
        case r: org.apache.spark.sql.execution.LogicalRDD => r
      }.nonEmpty
      require(hasCkptLeaf, "vocab plan is not checkpoint-backed")
      val depth = logical.collect { case p => p }.size
      require(depth <= 2 * graft.operators.Bpe.CheckpointEvery + 8,
        s"vocab plan depth $depth exceeds the checkpoint-bounded budget")
      println(s"PROBE bpe_plan depth=$depth checkpoint_leaf=$hasCkptLeaf")
      model.unpersist()
      n
    }

    // ---- fused unigram+bigram LM scoring (VERDICT r6 #6) ----
    // Both models from ONE corpus scan / one persisted pair stream,
    // against the two stages run separately (two scans, two persisted
    // pair streams) in the SAME session — the r6 SURVEY numbers
    // (23.3 s + 30.8 s) are from a different VM session and this host's
    // timing drifts 1.2-3x between sessions.
    time("lm_separate_unigram_1m") {
      val st = graft.operators.TextAnalysis.lmScoreStage(docs)
      val n = st.result.filter(col("ppl") > 0).count()
      st.unpersist(); n
    }
    time("lm_separate_bigram_1m") {
      val st = graft.operators.TextAnalysis.lmScoreBigramStage(docs)
      val n = st.result.agg(sum(col("ppl"))).collect()(0)
      st.unpersist(); docs.count()
    }
    time("lm_fused_both_models_1m") {
      val st = graft.operators.TextAnalysis.lmFusedStage(docs)
      val n = st.unigram.filter(col("ppl") > 0).count()
      val nb = st.bigram.agg(sum(col("ppl"))).collect()(0)
      st.unpersist(); n
    }

    // ---- hot-bucket cap under 30% skew (VERDICT r7 #1) ----
    // Synthetic band relation, 20M rows, 30% of them in ONE bucket: the
    // groupBy+anti-join cap treats the viral bucket as one map-side
    // partial per task, while the window form it replaced funnels all
    // 6M rows of that bucket through a single WindowExec task.
    val bands = spark.range(20000000L).select(
        col("id").as("doc_id"),
        lit(0).as("band_idx"),
        when(pmod(col("id"), lit(10)) < 3, lit("HOT"))
          .otherwise(conv(col("id").cast("string"), 10, 16)).as("band_hash"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    bands.count()
    time("cap_groupby_antijoin_20m_30pct_hot") {
      Dedup.capHotBuckets(bands, Seq("band_idx", "band_hash"), 50)
        .filter(length(col("band_hash")) >= 0).count()
    }
    time("cap_window_form_20m_30pct_hot") {
      bands.withColumn("bucket_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= 50)
        .filter(length(col("band_hash")) >= 0).count()
    }
    bands.unpersist()

    // ---- the real operator under the same skew ----
    // 1M docs where 30% share IDENTICAL text: every band bucket those
    // docs hash into holds 300k rows, and the cap must drop them without
    // a straggler. (Exact dedup is the operator that CATCHES these; the
    // near-dup stage just has to survive them.)
    val viral = spark.range(1000000L).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) < 3,
          lit((0 until 50).map(j => s"viral$j").mkString(" ")))
          .otherwise(concat_ws(" ", (0 until 50).map(j =>
            concat(lit("w"), pmod(xxhash64(col("id"), lit(100 + j)),
              lit(1000)))): _*)).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    viral.count()
    time("minhash_stage_1m_30pct_viral") {
      val st = Dedup.minhashNearDupsStage(viral, threshold = 0.5)
      val n = st.result.count()
      st.unpersist(); n
    }
    viral.unpersist()

    spark.stop()
  }
}
