package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Bpe, Dedup, Similarity}

/** Round-9 probes, closing the measurement gaps VERDICT r8 named:
  *  1. BPE APPLICATION at production shape — tokenize the 1M-doc probe
  *     corpus with a trained 1,000-merge vocab (the per-epoch inference
  *     cost; training was probed in round 8), direct vs distinct-word
  *     memoized form, tokens/s recorded.
  *  2. Absolute ANN recall@10 at 1M vectors for the shipped index
  *     configs (multi-probe IVF nProbe=2; SRP 64/4) against brute-force
  *     truth on a 64-query deterministic sample.
  *  3. The q52 per-round persist A/B on the deep CC probe graphs, with
  *     shuffle-write record totals (SparkListener) deciding whether
  *     ReuseExchange actually dedupes the doubled large-star subtree.
  *
  * (Gap 4, streaming throughput, lives in ProbeStreaming — it needs its
  * own session config.)
  *
  * Extra sections grown during the round: "bpe2" (open-vocab BPE
  * application — direct vs memo on a 200k-form corpus) and "ann10" (the
  * ANN battery at 10M vectors — the 1M→10M cost-curve check).
  */
object ProbeRound9 {
  def main(args: Array[String]): Unit = {
    // optional section filter: "bpe" | "bpe2" | "ann" | "ann10" | "cc"
    // (default: the three VERDICT-r8 sections)
    val sections: Set[String] =
      if (args.isEmpty) Set("bpe", "ann", "cc") else args.toSet
    val spark = Engine.builder("probe-round9").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.catalog.clearCache()
    }

    // ---- 1. BPE application at production shape (VERDICT r8 #1) ----
    if (sections("bpe")) {
    val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()

    val model = Bpe.train(docs, nMerges = 1000)
    val merges = model.merges.orderBy(col("rank")).select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    model.unpersist()
    spark.catalog.clearCache()
    require(merges.size >= 1000, s"expected >= 1000 merges, got ${merges.size}")

    // total corpus tokens, for the tokens/s figure (50 words x 1M docs)
    var tokensOut = 0L
    time("bpe_encode_direct_1m_1000merges") {
      // one BpeEncode eval per word instance — rank-priority loop, cost
      // independent of merge count
      tokensOut = Bpe.encodeDirect(docs, merges)
        .agg(sum(size(col("pieces")))).collect()(0).getLong(0)
      println(s"PROBE bpe_encode_direct tokens_out=$tokensOut")
      tokensOut
    }
    time("bpe_encode_memo_1m_1000merges") {
      // distinct-word memo + join back: the production form for Zipf text
      val st = Bpe.encodeStage(docs, merges)
      val t = st.result.agg(sum(size(col("pieces")))).collect()(0).getLong(0)
      require(t == tokensOut, s"memoized tokens $t != direct $tokensOut")
      st.unpersist(); t
    }
    docs.unpersist()
    }

    // ---- 1b. BPE application on an OPEN-vocab corpus ----
    // The base synthetic corpus has a ~1,000-word vocab, which makes the
    // distinct-word memo lose to direct encoding (its second corpus scan
    // dominates). Real pretraining text has an open vocabulary; this
    // corpus draws 50 words/doc log-uniformly from 200k forms (Zipf-ish:
    // low ranks dominate) so the memo's distinct-word set is ~200k while
    // the direct path still encodes 50M instances.
    if (sections("bpe2")) {
    val wordCols = (0 until 50).map { p =>
      val u = pmod(xxhash64(col("id"), lit(300 + p)), lit(100000)) / lit(100000.0)
      concat(lit("w"), exp(log(lit(200000.0)) * u).cast("long"))
    }
    val openDocs = spark.range(1000000L)
      .select(col("id").as("doc_id"), concat_ws(" ", wordCols: _*).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    openDocs.count()
    val model2 = Bpe.train(openDocs, nMerges = 1000)
    val merges2 = model2.merges.orderBy(col("rank")).select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    model2.unpersist()
    var tok2 = 0L
    def timeKeep2(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    timeKeep2("bpe_encode_direct_openvocab_1m") {
      tok2 = Bpe.encodeDirect(openDocs, merges2)
        .agg(sum(size(col("pieces")))).collect()(0).getLong(0)
      tok2
    }
    timeKeep2("bpe_encode_memo_openvocab_1m") {
      val st = Bpe.encodeStage(openDocs, merges2)
      val t = st.result.agg(sum(size(col("pieces")))).collect()(0).getLong(0)
      require(t == tok2, s"memoized tokens $t != direct $tok2")
      st.unpersist(); t
    }
    openDocs.unpersist()
    spark.catalog.clearCache()
    }

    // ---- 2. absolute ANN recall@10 at 1M vectors (VERDICT r8 #2) ----
    if (sections("ann")) {
    // timing WITHOUT the shared `time`'s clearCache: the corpus and truth
    // persists must survive across entries, or every entry silently
    // re-pays the 64-xxhash synthetic generation (~150 s — the round-9
    // "fixed cost" that sent the first probe run chasing a phantom; the
    // stage audit in ProbeVecDot shows the operators themselves at ~5 s)
    def timeKeep(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val embs = ScaleProbe.syntheticEmbeddings(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    embs.count()
    // 64 deterministic queries spread across the id range
    def querySample(df: org.apache.spark.sql.DataFrame) =
      df.filter(pmod(col("vec_id"), lit(15625L)) === 0)
    val truth = Similarity.bruteTopK(embs, querySample(embs), k = 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timeKeep("ann_brute_truth_1m_64q") { truth.count() }

    def macroRecall(approx: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.recallAtK(approx, truth)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      r
    }
    timeKeep("ann_recall_ivf_multiprobe_shipped_k4_p2") {
      // the shipped gate config: kCells=KmeansK=4, iters=2, nProbe=2
      val r = macroRecall(Similarity.ivfTopKMultiProbe(embs, querySample,
        k = 10, kCells = graft.SparkEntry.KmeansK,
        iters = graft.SparkEntry.KmeansIters, nProbe = 2))
      println(f"PROBE recall_ivf_k4_p2 recall_at_10=$r%.4f")
      (r * 10000).toLong
    }
    timeKeep("ann_recall_ivf_multiprobe_k64_p2") {
      // production-shaped cell count for a 1M corpus (~15.6k vectors/cell)
      val r = macroRecall(Similarity.ivfTopKMultiProbe(embs, querySample,
        k = 10, kCells = 64, iters = 2, nProbe = 2))
      println(f"PROBE recall_ivf_k64_p2 recall_at_10=$r%.4f")
      (r * 10000).toLong
    }
    timeKeep("ann_recall_srp_64_4") {
      // the probe-scale SRP width (64 bits / 4 bands, 16-bit bands)
      val r = macroRecall(Similarity.srpTopK(embs, querySample(embs),
        k = 10, bits = 64, bands = 4))
      println(f"PROBE recall_srp_64_4 recall_at_10=$r%.4f")
      (r * 10000).toLong
    }
    // nProbe sweep at the production cell count: the recall/cost curve an
    // index rollout actually tunes (recall@10 vs probes-per-query)
    for (np <- Seq(1, 4, 8)) {
      timeKeep(s"ann_recall_ivf_k64_p$np") {
        val r = macroRecall(Similarity.ivfTopKMultiProbe(embs, querySample,
          k = 10, kCells = 64, iters = 2, nProbe = np))
        println(f"PROBE recall_ivf_k64_p$np recall_at_10=$r%.4f")
        (r * 10000).toLong
      }
    }
    // compressed-corpus brute scorer at probe scale (one-pass quant kernel)
    timeKeep("ann_quantized_brute_1m_64q") {
      Similarity.quantizedTopK(embs, querySample(embs), k = 10).count()
    }
    truth.unpersist()
    embs.unpersist()
    }

    // ---- 2b. the same ANN battery one decade up: 10M vectors ----
    // proves the operator family's cost curve holds 10x past the round-9
    // probe scale (kCells=256 keeps ~39k vectors/cell; centroid matrix is
    // 256x64 doubles = 128 KB driver-side)
    if (sections("ann10")) {
    def timeKeep10(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val embs10 = ScaleProbe.syntheticEmbeddings(spark, 10000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    timeKeep10("ann10_generate_persist")(embs10.count())
    def qs10(df: org.apache.spark.sql.DataFrame) =
      df.filter(pmod(col("vec_id"), lit(156250L)) === 0)
    val truth10 = Similarity.bruteTopK(embs10, qs10(embs10), k = 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timeKeep10("ann10_brute_truth_10m_64q") { truth10.count() }
    def recall10(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, truth10)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
    for (np <- Seq(2, 8)) {
      timeKeep10(s"ann10_recall_ivf_k256_p$np") {
        val r = recall10(Similarity.ivfTopKMultiProbe(embs10, qs10,
          k = 10, kCells = 256, iters = 2, nProbe = np))
        println(f"PROBE recall10_ivf_k256_p$np recall_at_10=$r%.4f")
        (r * 10000).toLong
      }
    }
    timeKeep10("ann10_quantized_brute_10m_64q") {
      Similarity.quantizedTopK(embs10, qs10(embs10), k = 10).count()
    }
    truth10.unpersist()
    embs10.unpersist()
    }

    // ---- 3. q52 persist A/B with shuffle metrics (VERDICT r8 #4) ----
    if (sections("cc")) {
    // If ReuseExchange dedupes the doubled large-star subtree, the
    // no-persist run writes the SAME number of shuffle records as the
    // persisted run; if it recomputes, roughly double. The listener
    // totals decide with metrics, not argument.
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleRecords.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    def ccAb(name: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      for ((label, minEdges) <- Seq(("persist", 0L), ("nopersist", Long.MaxValue))) {
        shuffleRecords.set(0L)
        time(s"${name}_$label") {
          val res = Dedup.starClusters(pairs, minEdges)
          val n = res.labels.count()
          Dedup.releaseClusters(res.labels); n
        }
        org.apache.spark.sql.graftbridge.Bridge.waitForListeners(spark.sparkContext)
        println(s"PROBE ${name}_${label} shuffle_records=${shuffleRecords.get}")
      }
    }
    // wide: 1000 paths x diameter 99 (the graph VERDICT r8 #4 names)
    ccAb("cc_ab_1000x100", spark.range(100000L)
      .filter(col("id") % 100 =!= 99)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b")))
    // deep: one path of 100k nodes — worst case for repeated rounds
    ccAb("cc_ab_one_path_100k", spark.range(99999L)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b")))
    }

    spark.stop()
  }
}
