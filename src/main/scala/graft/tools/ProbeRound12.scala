package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextFunctions._
import graft.operators.TextAnalysis

/** Round-12 probe: attribute the text-kernel codegen port (VERDICT r11
  * #2) with an in-JVM A/B — this host's run-to-run noise is larger than
  * the effect when measured across JVMs (documented 1.2-3× spread), so
  * the same warm JVM alternates `spark.sql.codegen.wholeStage` +
  * `spark.sql.codegen.factoryMode` per measurement, interleaved
  * (codegen, interpreted, codegen, …), min of 3 each. The interpreted
  * side approximates the old CodegenFallback behavior (kernels via
  * nullSafeEval, stage excluded from WSCG); the codegen side is the
  * shipped path.
  *
  * ADVICE r12 correction: the r12 session ran this probe with the
  * non-existent key `spark.sql.wholeStage.codegen.enabled`, so its
  * "isolated kernel" A/B rows compared identical whole-stage configs
  * (factoryMode alone does not affect expressions fused into WSCG) —
  * which could have been why those rows read ~1.0×. Re-recorded with
  * the real key + a plan guard that requires the interpreted leg to be
  * WSCG-free (2026-08-14 r13 session, 1 M synthetic docs, local[32]):
  *  - isolated kernels: codegen buys 0.95-1.32× (lang_predict 1.00×,
  *    stopword 1.00×, punct 1.15×, shingles 1.28×, minhash_k16 1.04×,
  *    sim_hash64 0.95×, chunks 1.06×, quality 1.32×) — so the r12
  *    conclusion survives the corrected A/B: the kernel loop dominates
  *    its own row cost and removing interpreted glue around ONE call is
  *    marginal;
  *  - the stage-level effect is what the port was for: cross-JVM probes
  *    (ProbeCuration / ProbeRound10, old vs new build) showed pred_only
  *    10.6 s → 2.6 s, quality_percentile 8.4 s → 5.3-5.5 s, survivors
  *    9.9 s → 7.2-7.5 s — with CodegenFallback the kernel Project
  *    excluded its WHOLE stage (partial aggregates, hash, join glue)
  *    from whole-stage codegen; now the stage fuses
  *    (TextKernelsSpec pins the WSCG span). Apparent cross-JVM
  *    regressions (source_overlap 23→56 s) did not reproduce (29 s on
  *    re-run) — host noise, which is why this probe interleaves.
  */
object ProbeRound12 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-round12").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("ops")) { runOps(spark); spark.stop(); return }
    if (args.headOption.contains("dag")) { runDag(spark); spark.stop(); return }
    if (args.headOption.contains("compact")) { runCompact(spark); spark.stop(); return }
    val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()

    val dicts = TextAnalysis.StopwordDicts
    def force(c: org.apache.spark.sql.Column): Long =
      docs.select(c.as("x"))
        .agg(count(when(hash(col("x")) =!= 0, 1))).head().getLong(0)

    val cases: Seq[(String, () => Long)] = Seq(
      "lang_predict" -> (() => force(TextAnalysis.predLang(col("text")))),
      "stopword_scores" -> (() => force(stopword_scores(
        split(lower(col("text")), " "), dicts.map(_._2)))),
      "punct_count" -> (() => force(punct_count(lower(col("text"))))),
      "word_shingles" -> (() => force(word_shingles(col("text"), 3))),
      "minhash_k16" -> (() => force(min_hash_sig(
        word_shingles(col("text"), 3), 16))),
      "sim_hash64" -> (() => force(sim_hash64(split(lower(col("text")), " ")))),
      "word_chunks" -> (() => force(word_chunks(col("text"), 64, 32))),
      "quality_score" -> (() => force(TextAnalysis.qualityScore(col("text")))))

    def setMode(codegen: Boolean): Unit =
      if (codegen) {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      } else {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      }
    // fail loudly if a future Spark renames the key (the ADVICE r12 trap:
    // a bogus key silently compares codegen against itself)
    setMode(false)
    locally {
      val plan = docs.select(punct_count(col("text"))).queryExecution.executedPlan
      val wscg = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      require(wscg.isEmpty,
        s"interpreted mode still plans WholeStageCodegen — conf key wrong?\n$plan")
    }

    cases.foreach { case (name, f) =>
      // warm both paths once (JIT + codegen compile)
      setMode(true); f(); setMode(false); f()
      val gen = new Array[Double](3)
      val interp = new Array[Double](3)
      var i = 0
      while (i < 3) { // interleave so host-noise epochs hit both sides
        setMode(true)
        var t0 = System.nanoTime(); f(); gen(i) = (System.nanoTime() - t0) / 1e9
        setMode(false)
        t0 = System.nanoTime(); f(); interp(i) = (System.nanoTime() - t0) / 1e9
        i += 1
      }
      println(f"PROBE r12ab $name codegen=${gen.min}%.2f interp=${interp.min}%.2f speedup=${interp.min / gen.min}%.2fx")
    }
    spark.stop()
  }

  /** `ops` mode: the round-12 reporting operators at 1 M docs.
    * Recorded (2026-08-14, 50-word synthetic docs, local[32]):
    * decontam_1m 5.1-5.7 s (46 M pool shingles against a 1,000-doc
    * benchmark's broadcast fp set), datacard_1m 5.6-5.8 s (kernel scan +
    * 50 M-token rollup + fp dup join + lang argmax), fertility_1m
    * 3.7-4.3 s (1 M-doc encode+rollup under 48 trained merges ≈ 12-13 M
    * words/s through the codegen'd BPE encode; training itself timed
    * separately by the r11 BPE probes), merge_1m_100k 8.1 s (1 M corpus
    * refreshed by a 100 k batch → 905 k carry / 95 k rewrite / 5 k
    * insert), mix_1m 2.3 s (100 k docs selected, budget of 5 M tokens
    * landed exactly).
    */
  /** `dag` mode: the ONE-SCAN fused curation DAG (`curationDagStage`) at
    * 1 M docs on the SAME synthetic corpus ProbeRound11's `dag` mode ran
    * the stage-composed chain on (50.7 s, five text passes) — apples to
    * apples for the r12 shared-projection fusion.
    * Recorded 2026-08-14: 41.5 s end to end vs 50.7 s stage-composed —
    * the saved text passes are worth ~20% even with LSH+CC dominating —
    * and 199,148 packed docs, matching the r11 chain's output exactly
    * (the fusion is a plan change, not a semantic one).
    * CACHED_RDDS_LEFT 0 after release.
    */
  private def runDag(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Curation
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val docs = ProbeRound11.syntheticCorpus(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"CORPUS ${docs.count()} docs")
    val t0 = System.nanoTime()
    val stage = Curation.curationDagStage(docs)
    val rows = stage.result.count()
    println(f"PROBE r12dag fused_1m sec=${(System.nanoTime() - t0) / 1e9}%.1f rows=$rows")
    spark.catalog.clearCache() // covers docs + the shared projections
    stage.release()
    println("CACHED_RDDS_LEFT " +
      (spark.sparkContext.getPersistentRDDs.size - baseline))
  }

  /** `compact` mode: small-file compaction at 10 M events. A 32-task
    * fragmented partitioned write leaves 32 files in each of 30 date
    * dirs; compaction rewrites to 1/partition.
    * Recorded 2026-08-14: 960 files → 30 in 4.1 s, full-layout recount
    * identical (10 M rows).
    */
  private def runCompact(spark: org.apache.spark.sql.SparkSession): Unit = {
    val events = ScaleProbe.syntheticEvents(spark, 10000000L)
    val dir = java.nio.file.Files
      .createTempDirectory("probe_compact_").toString + "/events"
    graft.sources.Writers.writeEventsPartitioned(events.repartition(32), dir)
    val rows0 = spark.read.parquet(dir).count()
    val t0 = System.nanoTime()
    val report = graft.sources.Writers
      .compactPartitioned(spark, dir, "event_date").collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val (fb, fa) = (report.map(_.getAs[Long]("files_before")).sum,
      report.map(_.getAs[Long]("files_after")).sum)
    val rows1 = spark.read.parquet(dir).count()
    println(f"PROBE r12compact rows=$rows0%d files=$fb%d->$fa%d " +
      f"sec=$sec%.1f lossless=${rows0 == rows1}")
  }

  private def runOps(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.{Bpe, Curation, Dedup}
    val n = 1000000L
    val docs = ScaleProbe.syntheticDocs(spark, n)
      .withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"CORPUS ${docs.count()} docs")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE r12ops $name sec=${(System.nanoTime() - t0) / 1e9}%.1f out=$r")
    }
    val isBench = pmod(col("doc_id"), lit(1000)) === 0
    time("decontam_1m") {
      Dedup.decontaminationReport(docs.filter(!isBench), docs.filter(isBench))
        .agg(sum(col("n_hits")), sum(col("n_shingles")),
          sum(col("contaminated"))).head()
    }
    time("datacard_1m") {
      Curation.sourceDatacard(docs)
        .agg(sum(col("n_tokens")), sum(col("n_dup_docs"))).head()
    }
    spark.catalog.clearCache()
    val merges = Bpe.trainMergePairs(docs.filter(col("doc_id") < 100000), 48)
    time("fertility_1m") {
      Bpe.fertilityReport(docs, merges)
        .agg(sum(col("n_pieces")), sum(col("n_words"))).head()
    }
    spark.catalog.clearCache()
    // merge: 1 M-doc corpus refreshed by a 100 k batch (10% of it new
    // ids, the rest re-deliveries with 20% modified) — the asymmetric
    // daily-ingest shape
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) < 1)
      .withColumn("doc_id", col("doc_id") + 50000L) // shift: mix of known/new ids
      .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(" updated"))).otherwise(col("text")))
    time("merge_1m_100k") {
      Curation.mergeCorpus(docs, incoming)
        .groupBy(col("change")).count().collect().toSeq.sortBy(_.toString)
    }
    spark.catalog.clearCache()
    time("mix_1m") {
      Curation.mixToTargets(docs,
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3), 5000000L)
        .agg(sum(col("n_tokens")), count(lit(1))).head()
    }
    spark.catalog.clearCache()
    docs.unpersist()
  }
}
