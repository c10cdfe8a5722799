package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-13 probe: IVF-PQ at 1 M vectors (VERDICT r12 #5) — the
  * production-parameter shape of the q129 gate: 8 subspaces × 256 codes
  * (1 byte/subspace → 8 bytes/vector vs 256 for float32×64), a 64-cell
  * coarse quantizer, 64 golden queries, top-10.
  *
  * Recorded (2026-08-14, local[32], DISK_ONLY corpus, warm persists):
  * pq_fit_m8_k256 6.6 s (8 sub-k-means over a 4096-row sample — corpus-
  * size-independent), coarse_fit_k64 0.4 s, pq_encode_1m 2.4 s ≈ 417 k
  * vectors/s (the storage-path write cost; the stored codes are 8 bytes
  * vs 256), float brute truth 64q×top-10 4.1 s, full pqFrontier
  * (encode + truth + ADC brute + IVF-PQ p2/p8) 24.4 s. Mean recall:
  * pq brute 0.19, ivfpq_p8 0.17 at 57% of the candidates, ivfpq_p2
  * 0.13 at 25%. The absolute recall is the EXPECTED math for this
  * corpus, not a defect — synthetic uniform vectors have true-10-NN
  * cosines ≈ 0.5 (the r9 SRP analysis), so 8-byte codes can't separate
  * neighbors from the bulk; on clustered real embeddings PQ recall
  * rises steeply. What the probe establishes is the COST structure:
  * encode amortizes at write time, fit is corpus-size-independent, and
  * the ADC scan prices m=8 table lookups/candidate vs a 64-wide dot.
  */
object ProbeRound13 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-round13").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("merge")) { runMerge(spark); spark.stop(); return }
    if (args.headOption.contains("ingest")) { runIngest(spark); spark.stop(); return }
    if (args.headOption.contains("cards")) { runCards(spark); spark.stop(); return }
    if (args.headOption.contains("zorder")) { runZorder(spark); spark.stop(); return }
    if (args.headOption.contains("semdedup")) { runSemdedup(spark); spark.stop(); return }
    if (args.headOption.contains("gapfill")) { runGapfill(spark); spark.stop(); return }

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13pq $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }

    val embs = ScaleProbe.syntheticEmbeddings(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    embs.count()
    def qs(df: org.apache.spark.sql.DataFrame) =
      df.filter(pmod(col("vec_id"), lit(15625L)) === 0) // 64 queries

    val model = time("pq_fit_m8_k256") {
      Similarity.pqFit(embs, dim = 64, m = 8, k = 256, iters = 2,
        trainN = 4096)
    }
    val coarse = time("coarse_fit_k64") { Similarity.kmeansFit(embs, 64, 2) }
    // residual fit: same sub-k-means over x − c_coarse of the sample —
    // the extra cost over pq_fit is one cell assignment per sample row
    val resModel = time("pq_fit_residual_m8_k256") {
      Similarity.pqFitResidual(embs, coarse, dim = 64, m = 8, k = 256,
        iters = 2, trainN = 4096)
    }

    // encode throughput in isolation (the storage-path write cost); an
    // aggregate over the code array forces evaluation (the ProbeCuration
    // ColumnPruning pitfall)
    time("pq_encode_1m") {
      embs.select(Similarity.pqCodes(col("embedding"), model).as("c"))
        .agg(sum(element_at(col("c"), 1))).head()
    }
    // residual encode pays one extra nearest-cell lookup per row (the
    // fused kernel folds the subtraction into the code argmin)
    time("pq_encode_residual_1m") {
      embs.select(Similarity.pqCodesResidual(col("embedding"),
          element_at(graft.functions.VectorFunctions.nearest_cells(
            col("embedding"), coarse.centroids.toIndexedSeq, 1), 1),
          coarse, resModel).as("c"))
        .agg(sum(element_at(col("c"), 1))).head()
    }

    // float brute anchor for the same 64 queries
    time("float_brute_truth_64q_top10") {
      Similarity.bruteTopK(embs, qs(embs), 10).count()
    }

    // the full gated operator at production parameters: encode + truth +
    // ADC brute + IVF-PQ p2/p8 raw AND residual, recall per variant
    val rows = time("pq_frontier_total_p2_p8") {
      Similarity.pqFrontier(embs, coarse, model, qs, kTop = 10,
        probes = Seq(2, 8), resModel = Some(resModel)).collect()
    }
    rows.groupBy(_.getAs[String]("variant")).toSeq.sortBy(_._1)
      .foreach { case (v, rs) =>
        val recall = rs.map(_.getAs[Double]("recall")).sum / rs.length
        val scored = rs.map(_.getAs[Long]("n_scored")).sum / rs.length
        println(f"PROBE r13pq variant=$v mean_recall=$recall%.4f mean_scored=$scored")
      }
    spark.stop()
  }

  /** `ingest` mode: the q130 daily-ingestion chain at 100×+ the gate SF —
    * a 100 k-doc crawl segment lands as gzip WARC shards, is stream-
    * parsed back, curated (q53's fused kernels + exact-dedup survivor),
    * merged into a 1 M-doc prior snapshot through the INCREMENTAL
    * fingerprint artifact (the production path; q130's gate uses the
    * bootstrap text-scan merge at the tiny SF), and the refreshed corpus
    * ships data cards. Each stage timed; the composition's point is that
    * nothing re-derives an upstream stage and only the batch ever pays
    * text-kernel work after the snapshot bootstraps its artifact.
    *
    * Recorded (2026-08-14, local[32], DISK_ONLY prior corpus; 94,259 of
    * 100 k curated through, all four merge classes present):
    * warc_write_100k 1.2 s, warc_read_curate_100k 3.1 s (stream-gunzip +
    * kernels + fp dedup), merge_incremental 1.8 s against the 1 M-doc
    * artifact, datacard_refreshed 4.7 s (the one full-corpus kernel scan
    * a datacard inherently costs) — the chain's corpus-sized work is
    * exactly the reporting stage, everything upstream is batch-sized.
    *
    * Steady-state re-run (2026-08-14, after q134/q137 landed): the
    * stats-artifact path retires that last corpus text scan too —
    * card_stats_bootstrap 2.1 s ONCE, then datacard_incremental 2.0 s
    * vs 4.9 s for the text recompute; the daily chain now touches
    * corpus text in NO stage (fps artifact for merge classes, stats
    * artifact for cards, both refreshed from the batch).
    */
  private def runIngest(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Curation
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13ingest $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    // ProbeRound11's corpus (sprinkled stopwords → predictable 'en'
    // majority), not ScaleProbe's pure word salad (predLang 'und' would
    // make the lang filter drop everything)
    val prior = ProbeRound11.syntheticCorpus(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"PRIOR ${prior.count()} docs")
    // the stored artifact a production snapshot maintains (bootstrap once)
    val fps = Curation.corpusFingerprints(prior)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    fps.count()
    // today's segment: 100 k docs, half re-deliveries / half new ids
    val incoming = ProbeRound11.syntheticCorpus(spark, 100000L)
      .withColumn("doc_id",
        when(col("doc_id") % 2 === 0, col("doc_id") * 10) // re-delivered ids
          .otherwise(col("doc_id") + 2000000L))           // new ids
    val warcDir = java.nio.file.Files
      .createTempDirectory("probe_ingest_warc_").toString
    time("warc_write_100k") {
      graft.sources.Warc.writeWarc(incoming, warcDir, shards = 16,
        compress = true)
    }
    val curated = time("warc_read_curate_100k") {
      val read = graft.sources.Warc.readWarc(spark, warcDir)
      val c = read.join(
        Curation.curate(read, lang = "en", minQuality = 0.0).select("doc_id"),
        "doc_id").persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      println(s"  curated ${c.count()} of 100000")
      c
    }
    time("merge_incremental") {
      Curation.mergeCorpusIncremental(curated, fps)
        .groupBy(col("change")).count().collect()
        .foreach(r => println(s"  class ${r.getString(0)} = ${r.getLong(1)}"))
    }
    time("datacard_refreshed") {
      // the refreshed corpus's cards: carry rows from the snapshot +
      // the curated batch (the only stage that inherently scans text)
      val refreshed = prior
        .join(curated.select("doc_id"), Seq("doc_id"), "left_anti")
        .select("doc_id", "source", "text")
        .unionByName(curated.select("doc_id", "source", "text"))
      println(s"  cards ${Curation.sourceDatacard(refreshed).count()} sources")
    }
    // the q134/q137 steady state: cards from the stored stats artifact —
    // after this lands, NO stage of the daily chain scans corpus text
    val stats = time("card_stats_bootstrap") {
      val st = Curation.docCardStats(prior.select("doc_id", "source", "text"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      st.count()
      st
    }
    time("datacard_incremental") {
      println(s"  cards ${Curation.sourceDatacardIncremental(
        curated.select("doc_id", "source", "text"), stats).count()} sources")
    }
  }

  /** `merge` mode: the incremental-state merge's value, measured
    * (VERDICT r12 #3 at scale) — a 1 M-doc corpus refreshed with a
    * 50 k-doc batch through (a) the bootstrap text-scan path
    * ([[graft.operators.Curation.mergeCorpus]] — fingerprints the whole
    * corpus per merge) vs (b) the artifact path
    * ([[graft.operators.Curation.mergeCorpusIncremental]] — classifies
    * against the stored 16-byte/doc relation). Also prices the one-off
    * artifact bootstrap itself.
    *
    * Recorded (2026-08-14, local[32], DISK_ONLY corpus, forced via
    * change-class counts; both paths produce identical classes — 25 k
    * refresh / 25 k rewrite / 950 k carry): text-scan merge 4.5 s per
    * refresh, artifact bootstrap 1.4 s ONCE, artifact merge 1.2 s first /
    * 0.8 s steady state — the per-refresh cost drops ~5× at 1 M docs,
    * and the gap is the corpus TEXT scan, so it widens linearly with
    * corpus bytes (at 100 TB the text-scan path is a full-corpus read
    * per day; the artifact path reads 16 B/doc).
    */
  private def runMerge(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Curation
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13merge $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val corpus = ScaleProbe.syntheticDocs(spark, 1000000L)
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(10))))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"CORPUS ${corpus.count()} docs")
    // 50 k incoming: every 20th doc re-delivered, half with drifted text
    val incoming = corpus.filter(col("doc_id") % 20 === 0)
      .withColumn("text",
        when(col("doc_id") % 40 === 0, concat(col("text"), lit(" drift")))
          .otherwise(col("text")))
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("change")).count().collect()
        .foreach(r => println(s"  class ${r.getString(0)} = ${r.getLong(1)}"))
      ()
    }
    time("merge_textscan_1m") {
      force(Curation.mergeCorpus(corpus, incoming)
        .select(col("doc_id"), col("change")))
    }
    val fps = time("artifact_bootstrap_1m") {
      val f = Curation.corpusFingerprints(corpus)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      f.count()
      f
    }
    time("merge_artifact_1m") {
      force(Curation.mergeCorpusIncremental(incoming, fps))
    }
    // second refresh through the artifact (the steady-state daily cost)
    time("merge_artifact_1m_again") {
      force(Curation.mergeCorpusIncremental(incoming, fps))
    }
  }

  /** `cards` mode: the q134 incremental data cards at 1 M prior docs +
    * 100 k batch — the artifact path vs the full text recompute (the
    * stage the r13 ingest probe measured as the chain's only remaining
    * corpus-sized cost). The full path re-runs four text kernels over
    * 1.1 M documents; the artifact path runs them over the 100 k batch
    * and aggregates ~40-byte rows for the rest.
    *
    * Recorded (2026-08-14, local[32], DISK_ONLY corpus): artifact
    * bootstrap 4.8 s ONCE, full recompute 6.2 s per refresh vs
    * incremental 2.2 s first / 1.7 s steady state — ~3.6× at 1 M docs,
    * and the gap is the corpus text-kernel scan, so it widens linearly
    * with corpus bytes (the incremental path's corpus-sized work is an
    * aggregation over ~40-byte rows).
    */
  private def runCards(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Curation
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13cards $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val prior = ProbeRound11.syntheticCorpus(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"PRIOR ${prior.count()} docs")
    val incoming = ProbeRound11.syntheticCorpus(spark, 100000L)
      .withColumn("doc_id",
        when(col("doc_id") % 2 === 0, col("doc_id") * 10)
          .otherwise(col("doc_id") + 2000000L))
      .select("doc_id", "source", "text")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    incoming.count()
    val stats = time("card_stats_bootstrap_1m") {
      val s = Curation.docCardStats(prior.select("doc_id", "source", "text"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      s.count()
      s
    }
    time("cards_full_recompute_1m") {
      val merged = prior
        .join(incoming.select("doc_id"), Seq("doc_id"), "left_anti")
        .select("doc_id", "source", "text")
        .unionByName(incoming)
      println(s"  sources ${Curation.sourceDatacard(merged).count()}")
    }
    time("cards_incremental_1m") {
      println(s"  sources " +
        s"${Curation.sourceDatacardIncremental(incoming, stats).count()}")
    }
    // steady state (kernel JIT warm, artifact cached)
    time("cards_incremental_1m_again") {
      Curation.sourceDatacardIncremental(incoming, stats).count()
      ()
    }
  }

  /** `zorder` mode: the q135 Morton layout at 10 M events — write cost,
    * box-report cost, and the skipping advantage of the curve over a
    * single-column sort for a 2-D box predicate at the same directory
    * count.
    *
    * Recorded (2026-08-14, local[32]): zorder_write_10m 8.1 s (the
    * one-shuffle partitioned write), box_report 1.7 s; for a box
    * covering 1% of user_id × 70% of value, the Morton layout's boxes
    * admit 14 of 64 directories vs 46 of 64 for the value-sorted
    * baseline — 3.3× fewer bytes read, exactly the two-axis precision
    * split the curve promises.
    */
  private def runZorder(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.sources.Writers
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13zorder $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val ev = spark.range(10000000L).select(col("id").as("event_id"),
      pmod(xxhash64(col("id"), lit(3)), lit(100000)).as("user_id"),
      (pmod(xxhash64(col("id"), lit(4)), lit(100000)) / lit(1000.0)).as("value"))
    val dir = java.nio.file.Files
      .createTempDirectory("probe_zorder_").toString + "/events"
    time("zorder_write_10m") {
      Writers.writeZOrdered(ev, dir, "user_id", "value")
    }
    val lay = spark.read.parquet(dir)
    val boxes = time("box_report_10m") {
      lay.groupBy(col("z_file"))
        .agg(count(lit(1)).as("n"),
          min(col("user_id")).as("umn"), max(col("user_id")).as("umx"),
          min(col("value")).as("vmn"), max(col("value")).as("vmx"))
        .collect()
    }
    // a box narrow in user (1% of the range) and wide in value (70%)
    def hit(umn: Long, umx: Long, vmn: Double, vmx: Double) =
      umx >= 49000L && umn <= 50000L && vmx >= 10.0 && vmn <= 80.0
    val zHits = boxes.count(r => hit(r.getAs[Long]("umn"), r.getAs[Long]("umx"),
      r.getAs[Double]("vmn"), r.getAs[Double]("vmx")))
    // the value-sorted baseline at the same directory count, simulated
    // relationally (a linear sort's per-file value ranges are tight,
    // its user ranges are the full domain)
    val nFiles = 1 << (2 * Writers.ZOrderBits)
    val rng = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    val linHits = ev.crossJoin(broadcast(rng))
      .withColumn("lin_file",
        least(greatest(floor((col("value") - col("mn")) /
          (col("mx") - col("mn")) * lit(nFiles.toDouble)), lit(0.0)),
          lit(nFiles - 1.0)).cast("int"))
      .groupBy(col("lin_file"))
      .agg(min(col("user_id")).as("umn"), max(col("user_id")).as("umx"),
        min(col("value")).as("vmn"), max(col("value")).as("vmx"))
      .collect()
      .count(r => hit(r.getAs[Long]("umn"), r.getAs[Long]("umx"),
        r.getAs[Double]("vmn"), r.getAs[Double]("vmx")))
    println(s"PROBE r13zorder dirs=${boxes.length} z_hits=$zHits " +
      s"linear_hits=$linHits")
  }

  /** `gapfill` mode: q139 at 10 M events / 100 k users — the dense-grid
    * generation (sequence+explode) and per-user LOCF window at scale.
    * The output grid is ~72 M rows (100 k users × ~720 hourly buckets);
    * the point is that the window partitions per user (series length
    * calendar-bounded) and the grid is generated, never joined against
    * a global calendar.
    *
    * Recorded (2026-08-14, local[32]): 25.6 s end-to-end — 70.7 M grid
    * rows generated (61.3 M of them filled gaps), ≈ 2.8 M grid
    * rows/s through bucket-agg + explode + LOCF window.
    */
  private def runGapfill(spark: org.apache.spark.sql.SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13gapfill $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val ev = spark.range(10000000L).select(
      timestamp_micros(lit(1704067200000000L) +
        (pmod(xxhash64(col("id"), lit(1)), lit(2592000L)) * 1000000L)).as("ts"),
      pmod(xxhash64(col("id"), lit(3)), lit(100000)).as("user_id"),
      (pmod(xxhash64(col("id"), lit(4)), lit(100000)) / lit(1000.0)).as("value"))
    time("gapfill_10m_events_100k_users") {
      val out = graft.operators.Windows.gapFillLocf(ev)
      val agg = out.agg(count(lit(1)), sum(col("is_gap"))).head()
      println(s"  grid_rows=${agg.getLong(0)} gaps=${agg.getLong(1)}")
    }
  }

  /** `semdedup` mode: q136 at 1 M vectors with production clustering —
    * the paper's cell-size contract (k grows with the corpus so cells
    * stay ~100 vectors; within-cell pairwise is then ~n·cell/2 ≈ 50 M
    * cosines at 1 M, linear in corpus size for fixed cell size). k-means
    * at k=10,000 keeps the literal-expression assignment viable (10k×64
    * doubles ≈ 5 MB per task); beyond ~100k cells the assignment
    * switches to a two-level quantizer or a broadcast-join form — the
    * centroid-cosine stage already joins a broadcast centroid RELATION,
    * so only the assignment kernel changes.
    *
    * Recorded (2026-08-14, local[32], DISK_ONLY corpus): kmeans fit
    * k=10,000 48.0 s, full-corpus flat assignment 109.9–130.7 s (the
    * 10k-centroid argmin is the dominant per-vector cost —
    * ~0.11 ms/vector), **two-level assignment
    * ([[Similarity.assignCellsTwoLevel]], g=100, p=4) 9.6 s — 13.6×**,
    * with 32% flat-argmin agreement on THIS corpus — the structural
    * worst case: uniform vectors make all 10k distances near-ties, so
    * the probed-group heuristic lands on a different, equally-near cell
    * (KMeansSpec pins ≥90% agreement on separated clusters, where real
    * embedding corpora live; for IVF bucketing a near-tie miss is
    * benign — any near-tie cell is an equally good bucket). semanticDedup
    * total (≈50 M within-cell cosines + star CC + survivor argmin)
    * 60.0–93.8 s → 998,088 group members / 8,088 survivors. The near-total group coverage is the EXPECTED
    * geometry, not a defect: cells are similarity-defined, so
    * within-cell cosines of uniform vectors almost always clear the
    * 0.35 gate bar — production SemDeDup runs ≥0.95, where groups are
    * sparse; the probe's point is the COST of the pair+CC+argmin chain
    * at the paper's cell-size contract, which is what scales.
    */
  private def runSemdedup(spark: org.apache.spark.sql.SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r13semdedup $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val embs = ScaleProbe.syntheticEmbeddings(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    embs.count()
    val model = time("kmeans_fit_k10000") {
      Similarity.kmeansFit(embs, k = 10000, iters = 2, trainN = 20000)
    }
    val cells = time("assign_1m") {
      val c = model.cells
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      c.count()
      c
    }
    // the two-level fix this probe's first run named: √k·(1+p) dots per
    // vector instead of k — A/B'd against the flat argmin with agreement
    val idx = Similarity.hierIndex(model) // g = ⌈√k⌉ = 100
    val twoLevel = time("assign_two_level_p4_1m") {
      val c2 = Similarity.assignCellsTwoLevel(embs, model, idx,
          nProbeGroups = 4)
        .withColumnRenamed("cell", "cell2")
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      c2.count()
      c2
    }
    val agree = cells.join(twoLevel, "vec_id")
      .filter(col("cell") === col("cell2")).count()
    println(s"PROBE r13semdedup two_level_p4_agreement=$agree/1000000")
    twoLevel.unpersist()
    time("semdedup_1m_total") {
      val out = Similarity.semanticDedup(embs,
        Similarity.KmeansModel(model.centroids, cells), threshold = 0.35)
      val n = out.count()
      val kept = out.filter(col("keep") === 1).count()
      println(s"  group_members=$n survivors=$kept")
    }
    ()
  }
}
