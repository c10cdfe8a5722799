package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AsOf, Bpe, Curation, Dedup, EventAnalytics, Multimodal, RangeJoin, Relational, Similarity, Skew, Solar, TextAnalysis, Windows}
import graft.sources.Tables

/** Driver contract — see SURVEY.md §7.
  *
  * Every query is a pure function (SparkSession, sfDir) => DataFrame whose
  * column names match its DuckDB oracle exactly (the driver sorts columns by
  * name before hashing). Double-typed outputs are rounded (4 decimals, or 1
  * where the reference itself rounds) in BOTH engines so that
  * summation-order nondeterminism in parallel sums can't flip the hash.
  */
object SparkEntry {

  /** Round a double output column to 4 decimals, keeping its name. */
  private def r4(name: String) = round(col(name), 4).as(name)

  // ---------------------------------------------------------------------
  // Shared CC-labels stage (VERDICT r6 #4): q52 PRODUCES the near-dup
  // component labels and q93 histograms them — in production the labels
  // relation is computed once and both consumers read it, so q93 re-running
  // the full LSH + connected-components pipeline duplicated q52's work
  // (the second-costliest bench entry). q52 always computes fresh (its
  // bench timing stays honest) and publishes the label relation here;
  // q93 consumes the published relation when present — the labels are
  // checkpoint-backed (LogicalRDD leaves), so they survive the session
  // cache clears Bench/Verify issue between queries — and falls back to
  // computing the pipeline itself when run standalone.
  //
  // Lifecycle (ADVICE r7): the memo key is the session UUID (stable and
  // unique — an identityHashCode key could alias a new session to a dead
  // one's labels after GC); superseded labels are released ONE GENERATION
  // LATE (a consumer holding a lazy plan built on the previous labels —
  // e.g. an unevaluated q93 result — cannot recompute through a released
  // localCheckpoint, so replacement N frees generation N-2, never N-1);
  // and entries owned by stopped sessions are evicted on each refresh
  // (their blocks died with the context; eviction drops the driver-side
  // plan pins).
  // ---------------------------------------------------------------------
  private case class CcEntry(session: SparkSession, labels: DataFrame,
                             prev: Option[DataFrame])

  private val ccLabelsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, CcEntry]()

  private def ccKey(s: SparkSession, dir: String): String =
    org.apache.spark.sql.graftbridge.Bridge.sessionUUID(s)
      .getOrElse("ident-" + System.identityHashCode(s)) + "|" + dir

  private def ccLabelsFresh(s: SparkSession, dir: String): DataFrame = {
    val it = ccLabelsMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue.session.sparkContext.isStopped) it.remove()
    // pairs come from the shared LSH stage (VERDICT r10 #1): q11 produced
    // them earlier in a bench/verify run; standalone q52 falls back to
    // producing the stage itself. The CC fixpoint still computes fresh —
    // q52's bench timing prices connected components, not banding.
    val labels = Dedup.nearDupClusters(lshPairsShared(s, dir))
    val key = ccKey(s, dir)
    val old = Option(ccLabelsMemo.get(key))
    old.flatMap(_.prev)
      .filter(p => (p ne labels) && old.forall(p ne _.labels))
      .foreach(Dedup.releaseClusters)
    ccLabelsMemo.put(key,
      CcEntry(s, labels, old.map(_.labels).filter(_ ne labels)))
    labels
  }

  private def ccLabelsShared(s: SparkSession, dir: String): DataFrame =
    Option(ccLabelsMemo.get(ccKey(s, dir))).map(_.labels)
      .getOrElse(ccLabelsFresh(s, dir))

  // ---------------------------------------------------------------------
  // Shared Solar module-aggregate stage (VERDICT r8 #6): q04–q08 all hang
  // off the same module aggregate — the raw-events scan + the one big
  // shuffle — and re-derived it from the scan per query (~5 s of the r8
  // bench). A production driver computes the chain's upstream once; the
  // memo publishes the module relation checkpoint-backed (LogicalRDD
  // leaf, so it survives the clearCache() Bench/Verify issue between
  // queries) and every chain query rebuilds only the panel-cardinality
  // stages below it via Solar.stagesFrom. q02/q03 keep computing fresh
  // (they ARE the module/panel aggregate queries — their bench timings
  // price the stage build itself).
  //
  // Lifecycle is simpler than the cc-labels memo: the module aggregate is
  // a pure function of (session, dir) and no consumer mutates it, so one
  // generation per key suffices — no producer refresh, hence no
  // one-generation-late release dance. Stopped sessions are evicted on
  // each lookup; tests release explicitly via releaseSolarShared.
  // ---------------------------------------------------------------------
  private case class SolarEntry(session: SparkSession, module: DataFrame)

  private val solarModuleMemo =
    new java.util.concurrent.ConcurrentHashMap[String, SolarEntry]()

  private def solarStagesShared(s: SparkSession, dir: String): Solar.Stages = {
    val it = solarModuleMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue.session.sparkContext.isStopped) it.remove()
    val key = ccKey(s, dir)
    // computeIfAbsent (not get-then-put): two concurrent first queries for
    // the same (session, dir) must not each materialize a checkpoint — the
    // loser's RDD blocks would leak since the memo retains only one entry
    // (ADVICE r9). The checkpoint builds inside the mapping function, so
    // the second caller blocks briefly and reads the winner's entry.
    val m = solarModuleMemo.computeIfAbsent(key, _ =>
      SolarEntry(s, Solar.moduleAgg(Tables.events(s, dir)).localCheckpoint(true))
    ).module
    Solar.stagesFrom(m)
  }

  /** Release the memoized Solar module stage for (session, dir): frees the
    * checkpoint's raw-RDD blocks (neither clearCache nor unpersist covers
    * them — the Dedup.releaseClusters rule) and drops the driver-side plan
    * pin. Next chain query recomputes and republishes.
    */
  private[graft] def releaseSolarShared(s: SparkSession, dir: String): Unit =
    Option(solarModuleMemo.remove(ccKey(s, dir))).foreach {
      _.module.queryExecution.logical.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
      }.foreach(_.unpersist(false))
    }

  // ---------------------------------------------------------------------
  // Shared MinHash-LSH pair stage (VERDICT r10 #1): six gated queries hang
  // off the same shingle→signature→band→cap→self-join→verify pipeline —
  // q11 (the verified pairs themselves), q52/q93 (connected components
  // over them), q105 (the unfiltered calibration report), q106 (source
  // overlap of the pairs), q108 (MinHash side of the family agreement) —
  // and each re-derived it from the corpus scan (~8 s of the r10 bench).
  // A production run computes the pair relation once; the memo publishes
  // the UNFILTERED calibration relation (a strict superset of the verified
  // pairs: same banding, same cap, exact Jaccard riding every candidate —
  // Dedup.CalibrationStage scaladoc + DedupSpec equivalence pin), so q105
  // reads it whole and every pair consumer filters `jaccard >= 0.5`
  // (Dedup.pairsFromCalibration — bit-identical to minhashNearDups).
  //
  // Lifecycle mirrors the cc-labels memo exactly: q11 is the PRODUCER —
  // it always computes fresh (its bench timing keeps pricing the LSH
  // build, the q02/q52 discipline) and republishes; consumers read the
  // published checkpoint (LogicalRDD leaf — survives the clearCache
  // Bench/Verify issue between queries) and fall back to producing when
  // run standalone. Superseded generations release one late (a consumer
  // holding a lazy plan on generation N-1 cannot recompute through a
  // released localCheckpoint); stopped sessions evict on refresh.
  // ---------------------------------------------------------------------
  private case class LshEntry(session: SparkSession, calib: DataFrame,
                              prev: Option[DataFrame])

  private val lshCalibMemo =
    new java.util.concurrent.ConcurrentHashMap[String, LshEntry]()

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(false))

  private def lshCalibFresh(s: SparkSession, dir: String): DataFrame = {
    val it = lshCalibMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue.session.sparkContext.isStopped) it.remove()
    val stage = Dedup.minhashCalibrationStage(Tables.documents(s, dir))
    // eager checkpoint: the shingle index cache is consumed here and only
    // here, so the stage handle releases it immediately after
    val calib = stage.result.localCheckpoint(true)
    stage.unpersist()
    val key = ccKey(s, dir)
    val old = Option(lshCalibMemo.get(key))
    old.flatMap(_.prev)
      .filter(p => (p ne calib) && old.forall(p ne _.calib))
      .foreach(releaseCheckpoint)
    lshCalibMemo.put(key,
      LshEntry(s, calib, old.map(_.calib).filter(_ ne calib)))
    calib
  }

  private def lshCalibShared(s: SparkSession, dir: String): DataFrame =
    Option(lshCalibMemo.get(ccKey(s, dir))).map(_.calib)
      .getOrElse(lshCalibFresh(s, dir))

  /** The verified near-dup pairs at the gate's threshold, derived from the
    * shared calibration checkpoint (bit-identical to
    * `Dedup.minhashNearDups(docs, 0.5)` — DedupSpec pins it).
    */
  private def lshPairsShared(s: SparkSession, dir: String): DataFrame =
    Dedup.pairsFromCalibration(lshCalibShared(s, dir), threshold = 0.5)

  /** Release the memoized LSH calibration stage for (session, dir): both
    * live generations' checkpoint blocks plus the driver-side plan pin.
    */
  private[graft] def releaseLshShared(s: SparkSession, dir: String): Unit =
    Option(lshCalibMemo.remove(ccKey(s, dir))).foreach { e =>
      releaseCheckpoint(e.calib)
      e.prev.foreach(releaseCheckpoint)
    }

  // ---------------------------------------------------------------------
  // Date-partitioned event layout (VERDICT r10 #2): q109 exercises the
  // 100 TB scan story END TO END through the gate — Writers writes the
  // hive-partitioned layout, the query reads it back with a date
  // predicate, and the plan must prune (WritersSpec asserts the scan's
  // partition filters + partitions-read metric; the oracle replays the
  // same rollup over the raw table, so pruning provably loses no rows).
  // The write happens once per (session, dir) — a layout is written once
  // and queried many times, the same production shape as the other memos.
  // The layout is IMMUTABLE once written (no generations, no release
  // dance): entries only evict with their stopped session, and the temp
  // dirs die with the JVM.
  // ---------------------------------------------------------------------
  private val partEventsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def partitionedEventsShared(s: SparkSession, dir: String): String = {
    val it = partEventsMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    partEventsMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_events_by_date_").toString
      graft.sources.Writers.writeEventsPartitioned(Tables.events(s, dir), path)
      (s, path)
    })._2
  }

  // Shared IVF coarse quantizer (the lshPairsShared discipline applied
  // to the ANN family): ONE deterministic kmeansFit per (session, dir)
  // feeds q32/q51/q96/q99/q120; q33 is the PRODUCER — it fits FRESH
  // every run (its bench timing keeps pricing the index build) and
  // republishes. The model is a driver-side centroid array plus a LAZY
  // assignment plan — no persisted state, so no release dance at all.
  private val kmeansMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, operators.Similarity.KmeansModel)]()

  private def kmeansShared(s: SparkSession,
                           dir: String): operators.Similarity.KmeansModel = {
    val it = kmeansMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    kmeansMemo.computeIfAbsent(ccKey(s, dir), _ =>
      (s, operators.Similarity.kmeansFit(
        Tables.embeddings(s, dir), KmeansK, KmeansIters)))._2
  }

  private def kmeansPublish(s: SparkSession, dir: String)
      : operators.Similarity.KmeansModel = {
    val m = operators.Similarity.kmeansFit(
      Tables.embeddings(s, dir), KmeansK, KmeansIters)
    kmeansMemo.put(ccKey(s, dir), (s, m))
    m
  }

  /** q135's fixed 2-D predicate box (user_id ∈ [100, 120] — narrow;
    * value ∈ [50, 400] — wide), mirrored literally in the oracle. Chosen
    * so a single-column value sort prunes poorly while the Morton layout
    * prunes on both axes.
    */
  private val ZBoxUMin = 100L
  private val ZBoxUMax = 120L
  private val ZBoxVMin = 50.0
  private val ZBoxVMax = 400.0

  // Z-ordered event layout for q135: (event_id, user_id, value) Morton-
  // partitioned on (user_id, value) — same immutable once-per-(session,
  // dir) lifecycle as the q109 layout.
  private val zorderEventsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def zorderEventsShared(s: SparkSession, dir: String): String = {
    val it = zorderEventsMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    zorderEventsMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_events_zorder_").toString
      graft.sources.Writers.writeZOrdered(
        Tables.events(s, dir).select("event_id", "user_id", "value"),
        path, "user_id", "value")
      (s, path)
    })._2
  }

  // Versioned snapshot store for q143: three committed merges over
  // deterministic slices of `documents` (bootstrap, a rev2 rewrite
  // batch, a re-crawl batch), built ONCE per (session, dir) — the gate
  // then time-travels to every version and must reproduce the DuckDB
  // replay of the same chain.
  private val snapshotStoreMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def snapshotStoreShared(s: SparkSession, dir: String): String = {
    val it = snapshotStoreMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    snapshotStoreMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_snapshots_").toString
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val inc1 = docs.filter(col("doc_id") % 3 =!= 2)
      val inc2 = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("text", concat(col("text"), lit(" rev2")))
      val inc3 = docs.filter(col("doc_id") % 7 === 0)
      var fps = Curation.corpusFingerprints(docs.limit(0))
      Seq(inc1, inc2, inc3).zipWithIndex.foreach { case (inc, i) =>
        val merged = Curation.mergeCorpusIncremental(inc, fps)
          .localCheckpoint(true) // one computation feeds commit + next merge
        graft.sources.SnapshotStore.commit(s, root, i + 1L, merged)
        fps = merged.select("doc_id", "fp")
      }
      (s, root)
    })._2
  }

  // Compacted event layout for q125: a deliberately FRAGMENTED
  // partitioned write (16 tasks per date — streaming-ingest debris)
  // rewritten by Writers.compactPartitioned to one file per partition.
  // The gate reads the compacted layout and must match the raw-table
  // oracle — compaction provably loses/moves no rows. Same immutable
  // once-per-(session, dir) lifecycle as the q109 layout.
  private val compactEventsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def compactedEventsShared(s: SparkSession, dir: String): String = {
    val it = compactEventsMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    compactEventsMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_events_compacted_").toString
      graft.sources.Writers.writeEventsPartitioned(
        Tables.events(s, dir).repartition(16), path)
      graft.sources.Writers
        .compactPartitioned(s, path, "event_date").count()
      (s, path)
    })._2
  }

  // Bucketed join layout for q112 (the other half of the 100 TB scan
  // story next to q109's partition pruning): lineitem and orders are
  // written bucket-by-orderkey ONCE per (session, dir) — the shuffle is
  // paid at write time — and every subsequent join on the bucket key
  // plans with NO exchange on either side (WritersSpec pins the plan;
  // the q112 oracle proves the layout loses nothing). Table names carry
  // the session UUID: the warehouse directory outlives the in-memory
  // catalog, so a fixed name would hit locationAlreadyExists on the next
  // JVM.
  private val bucketedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, (String, String))]()

  private[graft] def bucketedTablesShared(s: SparkSession,
                                          dir: String): (String, String) = {
    val it = bucketedMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    bucketedMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val suffix = java.util.UUID.randomUUID().toString.replace("-", "_")
      val liT = s"li_bkt_$suffix"
      val orT = s"or_bkt_$suffix"
      graft.sources.Writers.writeBucketed(
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
        liT, "l_orderkey", buckets = 8)
      graft.sources.Writers.writeBucketed(
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        orT, "o_orderkey", buckets = 8)
      (s, (liT, orT))
    })._2
  }

  // WARC interchange layout for q110 — same immutable once-per-(session,
  // dir) lifecycle as the partitioned-events layout above.
  private val warcMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def warcShared(s: SparkSession, dir: String): String = {
    val it = warcMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    warcMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_warc_").toString
      // gzip shards (.warc.wet.gz) so the gated round-trip exercises the
      // Hadoop-FS + streaming-gunzip path Common Crawl data arrives on
      graft.sources.Warc.writeWarc(Tables.documents(s, dir), path,
        shards = 8, compress = true)
      (s, path)
    })._2
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_flagship_anomalies")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Solar pipeline stages (SURVEY.md §2 rows 1-16) over the events table,
  // mapped per FIXTURES.md §2: panel=event_type, module=user_id, power=value.
  // ---------------------------------------------------------------------

  private val moduleOut = Seq(col("w_start"), col("panel"), col("module"),
    col("m_cnt"), r4("m_sum_power"), col("m_avg_power"))
  private val panelFinalOut = Seq(col("p_cnt"), r4("p_sum_power"),
    col("p_avg_power"), r4("squares_sum"), r4("variance"), col("deviance"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rows 1-3: parquet scan + projection + filter (pushdown-friendly)
    "q01_scan_project" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type").as("panel"),
          col("user_id").cast("string").as("module"), col("value").as("power"))
        .filter(col("power") > 50.0)),

    // rows 5-7: groupBy + tumbling window + count/sum/round(avg,1)
    "q02_module_window_agg" -> ((s, dir) =>
      Solar.moduleAgg(Tables.events(s, dir)).select(moduleOut: _*)),

    // rows 10-11: window-preserving re-key + per-panel aggregate
    "q03_panel_agg" -> ((s, dir) =>
      Solar.panelAgg(Solar.moduleAgg(Tables.events(s, dir)))
        .select(col("w_start"), col("panel"), col("p_cnt"),
          r4("p_sum_power"), col("p_avg_power"))),

    // row 12: windowed inner join #1 (panel-agg broadcast onto module-agg)
    // q04–q08 consume the shared module-aggregate memo (solarStagesShared):
    // the chain's upstream scan + shuffle runs once per (session, dir).
    "q04_join_panel_module" -> ((s, dir) => {
      val st = solarStagesShared(s, dir)
      Solar.joinPanelModule(st.module, st.panel)
        .select(moduleOut ++ Seq(col("p_cnt"), r4("p_sum_power"), col("p_avg_power")): _*)
    }),

    // row 13: rounded-mean variance / deviance re-aggregation (SURVEY §2.12)
    "q05_variance_deviance" -> ((s, dir) =>
      solarStagesShared(s, dir).panelStats
        .select(Seq(col("w_start"), col("panel")) ++ panelFinalOut: _*)),

    // row 14: windowed inner join #2 (module-agg ⋈ final panel stats)
    "q06_join_module_panel" -> ((s, dir) =>
      solarStagesShared(s, dir).joined
        .select(moduleOut ++ panelFinalOut: _*)),

    // rows 15-16: z-score anomaly predicate + window-unwrap projection
    "q07_anomaly_filter" -> ((s, dir) =>
      Solar.anomalies(solarStagesShared(s, dir).joined)
        .select(col("w_start"), col("panel"), col("module"),
          round(abs(col("m_sum_power") - col("p_avg_power")), 4).as("abs_diff"),
          col("deviance"))),

    // full topology: events → anomalies (batch twin of SolarConsumer.java)
    "q08_flagship_anomalies" -> ((s, dir) =>
      Solar.anomalies(solarStagesShared(s, dir).joined)
        .select(moduleOut ++ panelFinalOut: _*)),

    // rows 2 + 17: JSON decode (from_json) / encode (to_json) round-trip
    "q09_json_roundtrip" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .withColumn("props_json", to_json(struct(col("k"))))),

    // ------------------------------------------------------------------
    // Training-data-pipeline extensions (SURVEY.md §2.14 / §7 phase 3)
    // ------------------------------------------------------------------

    // exact dedup: content-fingerprint groups with canonical survivor
    "q10_dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),

    // MinHash + LSH banding candidates, verified with exact Jaccard.
    // q11 is the shared LSH stage's PRODUCER: it always computes the
    // calibration superset fresh and publishes the checkpoint the other
    // five consumers read (VERDICT r10 #1); its own result is the
    // verified-pair filter of that relation, bit-identical to
    // Dedup.minhashNearDups (DedupSpec pins the equivalence).
    "q11_dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.pairsFromCalibration(lshCalibFresh(s, dir), threshold = 0.5)),

    // 64-bit SimHash near-dup pairs (hamming <= 3) in a doc_id window
    // (labeled NLJ demo — idWindow kept small so the anti-pattern doesn't
    // dominate the bench, VERDICT r8 #5; the scale twin is q31)
    "q12_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDups(Tables.documents(s, dir), maxHamming = 3, idWindow = 25)),

    // exact word-3-gram Jaccard pairs in a doc_id window
    "q13_dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.windowedJaccardPairs(Tables.documents(s, dir), idWindow = 25, threshold = 0.2)),

    // embedding-space near-duplicates (cosine >= 0.35) in a vec_id window
    // (labeled NLJ demo; scale twins q32/q85). Its r8 bench weight was NOT
    // pair volume — it was predicate ORDER: the optimizer folded the
    // cosine filter into the BNLJ condition ahead of the cheap id checks,
    // so all 4M id pairs paid round(cosine). nearDupPairs now builds the
    // conjunction cheap-first in the join condition (VERDICT r8 #5;
    // 3.5 s → ~0.3 s at sf0.1 with the same 4M-pair input)
    "q14_dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables.embeddings(s, dir), threshold = 0.35, idWindow = 25)),

    // exact brute-force cosine top-10 for query vectors vec_id < 8
    "q15_ann_topk_brute" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteTopK(e, e.filter(col("vec_id") < 8), k = 10)
    }),

    // IVF-style ANN: probe only the query's cell (label = coarse quantizer)
    "q16_ann_ivf_label" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), k = 5)
    }),

    // stopword-dictionary language identification
    "q17_text_lang_id" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),

    // length/punctuation/stopword quality scoring
    "q18_text_quality" -> ((s, dir) => TextAnalysis.quality(Tables.documents(s, dir))),

    // whitespace + BPE-ish regex token counting
    "q19_token_count" -> ((s, dir) => TextAnalysis.tokenCounts(Tables.documents(s, dir))),

    // canonical-text md5 fingerprint + 60-bit integer projection
    "q20_text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(Tables.documents(s, dir))),

    // multimodal: opaque binary payload + typed metadata projection
    "q21_multimodal_meta" -> ((s, dir) =>
      Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          lower(substring(hex(col("payload")), 1, 16)).as("header"))),

    // ------------------------------------------------------------------
    // Relational surface beyond the reference (SURVEY.md §2.13 classes)
    // ------------------------------------------------------------------

    // ranking window + top-k per group (WindowGroupLimit at scale)
    "q22_topk_revenue" -> ((s, dir) =>
      Relational.topKRevenue(Tables.lineitem(s, dir), k = 3)),

    // anti join (NOT EXISTS, selective build side)
    "q23_anti_join" -> ((s, dir) =>
      Relational.customersWithoutOrders(Tables.customer(s, dir),
        Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0))),

    // semi join (EXISTS) + aggregate
    "q24_semi_join" -> ((s, dir) =>
      Relational.activeCustomersBySegment(Tables.customer(s, dir), Tables.orders(s, dir))),

    // rollup grouping sets in one Expand pass
    "q25_rollup" -> ((s, dir) => Relational.rollupTotals(Tables.lineitem(s, dir))),

    // exact distinct aggregates
    "q26_distinct_agg" -> ((s, dir) => Relational.distinctCounts(Tables.lineitem(s, dir))),

    // hopping/sliding windows (60s window, 30s slide) over events
    "q27_sliding_window" -> ((s, dir) => Windows.slidingAgg(Tables.events(s, dir))),

    // session windows (1h inactivity gap) per user over events
    "q28_session_window" -> ((s, dir) => Windows.sessionAgg(Tables.events(s, dir))),

    // q139: time-bucket gap filling with LOCF (the time_bucket_gapfill +
    // locf operator of time-series stores): missing hourly buckets
    // between each user's first and last observation are generated via
    // sequence+explode and filled with the last observed value, is_gap
    // in-band; LOCF window partitioned per user, bounded by calendar
    "q139_gapfill_locf" -> ((s, dir) =>
      Windows.gapFillLocf(Tables.events(s, dir))),

    // exact continuous quantiles (median / p95) per group
    "q29_quantiles" -> ((s, dir) => Relational.quantiles(Tables.lineitem(s, dir))),

    // set operation: EXCEPT over customer key sets
    "q30_set_ops" -> ((s, dir) =>
      Relational.exclusivelyHighValueCustomers(Tables.orders(s, dir), threshold = 250000.0)),

    // ------------------------------------------------------------------
    // Scale-path twins of the id-window demos (round-2: equi-join shapes)
    // ------------------------------------------------------------------

    // simhash near-dup via hash-block bucketing: equi-join candidates
    // (pigeonhole over 16-bit blocks), same hamming verification as q12
    "q31_dedup_simhash_bucketed" -> ((s, dir) =>
      Dedup.simhashBucketedNearDups(Tables.documents(s, dir), maxHamming = 3)),

    // embedding near-dup via learned k-means cells: equi-join on cell id,
    // same cosine verification as q14
    "q32_dedup_embedding_cells" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.cellNearDupPairs(e,
        kmeansShared(s, dir).cells, threshold = 0.35)
    }),

    // ANN index build: IVF over cells learned by deterministic seeded
    // k-means (not the pre-assigned label column, closing q16's asterisk)
    // PRODUCER of the shared quantizer: fits fresh (priced here),
    // republishes for q32/q51/q96/q99/q120
    "q33_ann_ivf_kmeans" -> ((s, dir) =>
      Similarity.ivfTopKKmeansModel(Tables.embeddings(s, dir),
        kmeansPublish(s, dir),
        labeled => labeled.filter(col("vec_id") < 8), k = 5)),

    // bounded-memory approximate quantiles (scale path of exact q29) with
    // in-band tolerance flags (oracle expects 1s)
    "q34_quantiles_approx" -> ((s, dir) =>
      Relational.approxQuantiles(Tables.lineitem(s, dir))),

    // as-of (point-in-time) join: trades ⋈ most-recent-quote per user via
    // the union + ordered-window rewrite (one shuffle, no range NLJ)
    "q35_asof_join" -> ((s, dir) =>
      AsOf.tradesWithLatestQuote(Tables.events(s, dir))
        .filter(col("q_id").isNotNull)),

    // HLL++ approximate distinct (scale path of exact q26), in-band flag
    "q36_distinct_approx" -> ((s, dir) =>
      Relational.approxDistinct(Tables.lineitem(s, dir))),

    // CUBE grouping sets (completes rollup/cube family)
    "q37_cube" -> ((s, dir) => Relational.cubeTotals(Tables.lineitem(s, dir))),

    // INTERSECT set operation (completes EXCEPT from q30)
    "q38_intersect" -> ((s, dir) =>
      Relational.mixedValueCustomers(Tables.orders(s, dir), threshold = 250000.0)),

    // interval join: error→purchase-within-1h proximity pairs via
    // bin-bucketed equi-join (no non-equi NLJ; see RangeJoin scaladoc)
    "q39_range_join" -> ((s, dir) =>
      RangeJoin.proximityPairs(Tables.events(s, dir),
        typeA = "error", typeB = "purchase", tolSec = 3600)),

    // q140: the interval join's LEFT OUTER flavor — inner bin-bucketed
    // pairs + an id anti-join for the unmatched left side (null-padded
    // once, not per bin); the oracle is DuckDB's non-equi LEFT JOIN
    "q140_range_join_leftouter" -> ((s, dir) =>
      RangeJoin.proximityPairsLeftOuter(Tables.events(s, dir),
        typeA = "error", typeB = "purchase", tolSec = 3600)),

    // q141: the RIGHT OUTER flavor — unmatched purchases keep one
    // null-padded row (the left-outer anti-join mirrored to id_b)
    "q141_range_join_rightouter" -> ((s, dir) =>
      RangeJoin.proximityPairsRightOuter(Tables.events(s, dir),
        typeA = "error", typeB = "purchase", tolSec = 3600)),

    // q142: FULL OUTER — inner pairs + both unmatched sides null-padded
    // once each, completing the interval-join flavor matrix
    "q142_range_join_fullouter" -> ((s, dir) =>
      RangeJoin.proximityPairsFullOuter(Tables.events(s, dir),
        typeA = "error", typeB = "purchase", tolSec = 3600)),

    // PIVOT with a static value list (one aggregation pass)
    "q41_pivot" -> ((s, dir) => Relational.pivotQuantities(Tables.lineitem(s, dir))),

    // global ORDER BY + LIMIT (TakeOrderedAndProject: per-partition heaps,
    // no full sort/shuffle)
    "q42_global_topn" -> ((s, dir) =>
      Relational.globalTopOrders(Tables.orders(s, dir), n = 20)),

    // salted skew join: result must be IDENTICAL to the plain join (only
    // the partitioning changes) — the oracle is the unsalted join
    "q40_salted_join" -> ((s, dir) => {
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Skew.saltedJoin(
        Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice")),
        dim, "o_custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("sum_price"))
    }),

    // LEFT OUTER join + aggregate (null-extension semantics)
    "q43_outer_join" -> ((s, dir) =>
      Relational.customerOrderTotals(Tables.customer(s, dir), Tables.orders(s, dir))),

    // collect_list with pinned ordering, rendered engine-portably
    "q44_collect_csv" -> ((s, dir) => Relational.orderPricesCsv(Tables.orders(s, dir))),

    // analytic window functions: running sum, lag, ntile
    "q45_window_analytics" -> ((s, dir) =>
      Relational.orderRunningStats(Tables.orders(s, dir))),

    // date scalar functions: year/month extraction + aggregate
    "q46_dates" -> ((s, dir) => Relational.ordersByMonth(Tables.orders(s, dir))),

    // SQL surface end-to-end: the same engine through spark.sql, including
    // GraftExtensions-registered custom expressions (sim_hash16,
    // lang_predict, punct_count) — proves SQL users get bit-identical
    // results to the DataFrame API
    "q47_sql_surface" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql("""SELECT doc_id, sim_hash16(split(lower(text), ' ')) AS simhash,
              |       lang_predict(split(lower(text), ' ')) AS pred_lang,
              |       punct_count(lower(text)) AS n_punct
              |FROM documents_v""".stripMargin)
        .filter(col("simhash").isNotNull)
    }),

    // lateral view / explode: per-document top-3 tokens by frequency
    "q48_top_tokens" -> ((s, dir) =>
      TextAnalysis.topTokens(Tables.documents(s, dir), k = 3)),

    // RANGE-frame analytic window: trailing-1h by event time (tie-safe)
    "q49_range_frame" -> ((s, dir) =>
      Windows.trailingHourStats(Tables.events(s, dir))),

    // scalar string-function battery (upper/substr/reverse/translate/
    // concat_ws/lpad)
    "q50_string_funcs" -> ((s, dir) =>
      TextAnalysis.stringFunctions(Tables.documents(s, dir))),

    // multi-probe IVF ANN: each query scores its top-2 nearest cells,
    // recovering recall lost at cell boundaries with the same equi-join
    // plan shape as q33 (see SimilaritySpec recall assertion)
    "q51_ann_ivf_multiprobe" -> ((s, dir) =>
      Similarity.ivfTopKMultiProbeModel(Tables.embeddings(s, dir),
        kmeansShared(s, dir),
        e => e.filter(col("vec_id") < 8), k = 5, nProbe = 2)),

    // dedup-cluster extraction: connected components over the LSH-verified
    // near-dup pairs (iterative min-label propagation; oracle replays the
    // fixpoint with a recursive CTE)
    "q52_dedup_clusters" -> ((s, dir) => ccLabelsFresh(s, dir)),

    // end-to-end curation: language filter + quality floor + exact-dedup
    // canonical survivor, fused into one scan + one fp64 shuffle
    "q53_curation_pipeline" -> ((s, dir) =>
      Curation.curate(Tables.documents(s, dir), lang = "en", minQuality = 0.5)),

    // deterministic stratified sampling: md5-bucket coin per doc, 10% for
    // the dominant language, 50% for the rest (training-mix rebalance)
    "q54_stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(Tables.documents(s, dir),
        rates = Map("en" -> 10), defaultPct = 50)),

    // int8 embedding quantization with in-band reconstruction-error bound
    "q55_embedding_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir))),

    // bag-semantics set ops: EXCEPT ALL / INTERSECT ALL multiset counts
    "q56_bag_set_ops" -> ((s, dir) =>
      Relational.bagSetOps(Tables.orders(s, dir), threshold = 250000.0)),

    // correlated scalar + EXISTS subqueries through the SQL surface
    // (Catalyst decorrelates both into joins — no per-row re-execution)
    "q57_correlated_subquery" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice,
              |  (SELECT c_mktsegment FROM customer_v c
              |   WHERE c.c_custkey = o.o_custkey) AS seg,
              |  CAST(EXISTS(SELECT 1 FROM lineitem_v l
              |              WHERE l.l_orderkey = o.o_orderkey
              |                AND l.l_quantity >= 45) AS INT) AS has_bulk
              |FROM orders_v o""".stripMargin)
    }),

    // statistical aggregates gated on exact integer moments; native
    // stddev_samp/corr asserted in-band
    "q58_stats_agg" -> ((s, dir) =>
      Relational.statsAggregates(Tables.lineitem(s, dir))),

    // nested-JSON encode/decode round trip (struct + array)
    "q59_json_nested" -> ((s, dir) =>
      Relational.jsonNestedRoundtrip(Tables.orders(s, dir))),

    // corpus length distribution via the custom TypedImperativeAggregate
    // (exact integer histogram, map-side partial aggregation)
    "q60_length_histogram" -> ((s, dir) =>
      TextAnalysis.lengthHistogram(Tables.documents(s, dir))),

    // ranking-function battery under real ties (coarse price buckets)
    "q61_rank_battery" -> ((s, dir) =>
      Relational.rankFunctions(Tables.orders(s, dir))),

    // fixed-size deterministic per-language sample (hash-priority top-k)
    "q62_fixed_sample" -> ((s, dir) =>
      Curation.fixedSizeSample(Tables.documents(s, dir), k = 5)),

    // UNPIVOT: pivot -> melt round trip reproduces the grouped aggregate
    "q63_unpivot" -> ((s, dir) =>
      Relational.unpivotQuantities(Tables.lineitem(s, dir))),

    // MapType round trip (map_from_arrays / element_at / map_keys)
    "q64_map_roundtrip" -> ((s, dir) =>
      Relational.mapRoundtrip(Tables.orders(s, dir))),

    // array higher-order functions (filter/exists/transform/fold)
    "q65_array_functions" -> ((s, dir) =>
      Similarity.arrayFunctions(Tables.embeddings(s, dir))),

    // heavy hitters: exact top-k tokens probed against a Count-Min sketch
    // (custom mergeable sketch aggregate); CMS one-sided bound in-band
    "q66_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(Tables.documents(s, dir))),

    // the custom AGGREGATES through the SQL surface (VERDICT r4 #4):
    // histogram_agg + count_min_agg + cms_query registered by
    // GraftExtensions and reached via spark.sql — the q60 histogram
    // replayed in SQL, with the CMS contract asserted in-band (the
    // sketch estimate of each language's doc count never underestimates
    // and overestimates by at most ~3N/width)
    "q67_sql_aggregates" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql("""WITH h AS (
              |  SELECT lang_predict(split(lower(text), ' ')) AS pred_lang,
              |         size(split(text, ' ')) AS n_words
              |  FROM documents_v),
              |g AS (
              |  SELECT pred_lang, histogram_agg(n_words, 8, 10) AS hist,
              |         count(*) AS n_docs
              |  FROM h GROUP BY pred_lang),
              |sk AS (
              |  SELECT count_min_agg(pred_lang, 4, 256) AS sk,
              |         count(*) AS n_total
              |  FROM h)
              |SELECT g.pred_lang, b.bucket, b.cnt,
              |       CAST(cms_query(sk.sk, g.pred_lang, 4, 256) >= g.n_docs
              |            AS INT) AS cms_lower_ok,
              |       CAST(cms_query(sk.sk, g.pred_lang, 4, 256)
              |            <= g.n_docs + 3.0 * sk.n_total / 256
              |            AS INT) AS cms_upper_ok
              |FROM g CROSS JOIN sk
              |LATERAL VIEW posexplode(g.hist) b AS bucket, cnt""".stripMargin)
    }),

    // multimodal metadata decode: REAL header parsing (PNG IHDR, JPEG SOF
    // marker walk, WAV fmt chunk — graft.functions.MediaHeaders) over
    // spec-conformant payloads whose geometry/sample rate is a closed
    // form of doc_id; the oracle verifies the construct → parse round
    // trip against the closed form
    "q68_multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeMeta(
        Multimodal.syntheticMedia(Tables.documents(s, dir)))),

    // bloom-filter join pre-filter: fixed-size OR-merged bit array over
    // the selective side's keys, broadcast probe at the big side's scan;
    // the no-false-negative contract asserted in-band on every row
    "q69_bloom_join_filter" -> ((s, dir) =>
      Relational.bloomSemiFilter(Tables.customer(s, dir),
        Tables.orders(s, dir), threshold = 300000.0)),

    // Gopher-style repetition quality signals (dup-word fraction,
    // top-bigram fraction) — the curation layer's repetition filters
    "q70_repetition_signals" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, dir))),

    // TF-IDF top-3 terms per document (tf·ln(N/df), deterministic ties)
    "q71_tfidf_topterms" -> ((s, dir) =>
      TextAnalysis.tfIdfTopTerms(Tables.documents(s, dir), k = 3)),

    // explicit GROUPING SETS (non-rollup set list) with grouping_id
    "q72_grouping_sets" -> ((s, dir) =>
      Relational.groupingSetsTotals(Tables.lineitem(s, dir))),

    // int8-quantized ANN: integer dot products on quantized vectors,
    // rescaled — bit-identical cross-engine, no tie-break scaffolding
    "q73_ann_quantized" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.quantizedTopK(e, e.filter(col("vec_id") < 8), k = 10)
    }),

    // benchmark decontamination (GPT-3 appendix-C shape): train docs
    // scored by the fraction of their distinct 5-grams appearing in the
    // held-out split; both sides collapse to 60-bit gram fingerprints
    // before the equi-join
    "q74_contamination" -> ((s, dir) =>
      Curation.contaminationCheck(Tables.documents(s, dir),
        benchSource = "src0")),

    // PII redaction over deterministic synthetic payloads (the corpus
    // itself is word salad, so the gate constructs emails/phones/IPs from
    // doc_id closed forms and the oracle replays the construction)
    "q75_pii_redact" -> ((s, dir) =>
      TextAnalysis.redactPii(
        TextAnalysis.withSyntheticPii(Tables.documents(s, dir)))),

    // fixed-size token chunking via the single-pass WordChunks kernel +
    // posexplode — scan-fused, chunk ordinal free from the explode
    "q76_chunking" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, dir), chunkSize = 32)),

    // concat-and-slice sequence packing, two-level: block-parallel
    // running sums stitched by a broadcast per-block prefix — parallelism
    // scales with nBlocks, not #languages (VERDICT r5 #1)
    "q77_sequence_packing" -> ((s, dir) =>
      Curation.packSequences(Tables.documents(s, dir), ctxTokens = 256)),

    // temperature-based (alpha=0.5) domain rebalancing with TRUE
    // upsampling: targetFrac=1.0 pushes the small strata past 100% so
    // they emit deterministic copies (copy_idx in the key) while the
    // dominant language downsamples — expected output size stays N
    "q78_temperature_resample" -> ((s, dir) =>
      Curation.temperatureResample(Tables.documents(s, dir),
        targetFrac = 1.0)),

    // overlapping (strided) chunking: windows start every 24 tokens,
    // carry 32 — same scan-fused kernel, chunk pairs overlap by 8
    "q79_chunking_strided" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, dir),
        chunkSize = 32, stride = 24)),

    // token-budget selection: whole quality buckets above the cutoff,
    // running sum only inside the boundary bucket — never a global sort
    "q80_token_budget_select" -> ((s, dir) =>
      Curation.tokenBudgetSelect(Tables.documents(s, dir),
        budgetTokens = 10000L)),

    // deterministic epoch shuffle: per-epoch md5 priority, parallel
    // per-shard ranks — reproducible data-loader order without rand()
    "q81_epoch_shuffle" -> ((s, dir) =>
      Curation.epochShuffle(Tables.documents(s, dir), epoch = 3, nShards = 8)),

    // CCNet/C4-style boilerplate chunk removal + ordered reassembly
    "q82_boilerplate_removal" -> ((s, dir) =>
      Dedup.removeBoilerplate(Tables.documents(s, dir),
        chunkTokens = 16, maxDf = 1)),

    // substring-level exact dedup: strided 16-token span fingerprints,
    // per-doc fraction of spans shared with another document (Lee et al.
    // ACL'22 re-expressed as parallel span fingerprints, not a suffix
    // array)
    "q83_span_dedup" -> ((s, dir) =>
      Dedup.spanDedup(Tables.documents(s, dir),
        spanTokens = 16, stride = 8, maxDupFrac = 0.5)),

    // CCNet-style perplexity scoring under a corpus-trained unigram LM
    // (train + score in one job; one scan, 8-byte fingerprint joins)
    "q84_lm_perplexity" -> ((s, dir) =>
      TextAnalysis.lmScore(Tables.documents(s, dir))),

    // signed-random-projection LSH: angular near-dup candidates from
    // 8-bit signature bands (equi-join, never all-pairs), exact-cosine
    // verified — the third near-dup family (MinHash = set overlap,
    // SimHash = token multiset, SRP = raw-embedding angle)
    "q85_srp_lsh" -> ((s, dir) =>
      Similarity.srpBucketedNearDups(Tables.embeddings(s, dir),
        threshold = 0.35)),

    // incremental ingestion dedup: the src0/src1 batch dedups AGAINST the
    // rest of the corpus (fingerprint left-join + bands-vs-index LSH),
    // never corpus-vs-corpus
    "q86_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.dedupAgainstCorpus(
        docs.filter(!col("source").isin("src0", "src1")),
        docs.filter(col("source").isin("src0", "src1")))
    }),

    // EXACT quantiles with bounded memory: histogram pass + ranking only
    // the boundary buckets — q29's answer without buffering any group
    "q87_exact_quantile_twopass" -> ((s, dir) =>
      Relational.exactQuantilesTwoPass(Tables.lineitem(s, dir),
        "l_returnflag", "l_extendedprice", Seq(0.5, 0.95))),

    // bigram-LM perplexity: conditional p(cur|prev), context counts and
    // vocabulary re-folded from one persisted pair stream
    "q88_lm_bigram" -> ((s, dir) =>
      TextAnalysis.lmScoreBigram(Tables.documents(s, dir))),

    // vocabulary coverage curve: exact top-V via TakeOrdered heaps,
    // cumulating windows over the V-row result only
    "q89_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir), topV = 50)),

    // per-source drift monitor: exact smoothed KL vs the corpus unigram
    // distribution, absent-token mass in closed form (never source x vocab)
    "q90_source_divergence" -> ((s, dir) =>
      TextAnalysis.sourceDivergence(Tables.documents(s, dir))),

    // OHLC downsampling: min_by/max_by candles in one aggregation pass,
    // no window, no sort
    "q91_ohlc_downsample" -> ((s, dir) =>
      Windows.ohlcDownsample(Tables.events(s, dir))),

    // deterministic train/val/test split: content-hash coin, docs never
    // migrate between splits as the corpus grows; scan-only
    "q92_train_split" -> ((s, dir) =>
      Curation.splitAssign(Tables.documents(s, dir))),

    // what does near-dedup buy: cluster-size histogram + removable rows
    // over the SHARED q52 component labels (computed once per session+dir,
    // recomputed only when q93 runs standalone — VERDICT r6 #4)
    "q93_dedup_savings" -> ((s, dir) =>
      Dedup.dedupSavings(ccLabelsShared(s, dir))),

    // pre-flight join-key skew diagnosis: hottest-key share + entropy
    "q94_key_profile" -> ((s, dir) =>
      Relational.profileKeys(Tables.orders(s, dir), "o_custkey")),

    // C4-style blocklist filter: whole-token hits via the one-pass
    // stopword kernel, scan-fused, zero shuffle
    "q95_blocklist_filter" -> ((s, dir) =>
      TextAnalysis.blocklistFilter(Tables.documents(s, dir))),

    // mapInPandas-shaped batch feature extraction over binary payloads:
    // mapPartitions in bounded batches, stub decode, oracle-gated so the
    // escape-hatch plumbing provably drops/duplicates/reorders nothing
    "q97_feature_extract_batch" -> ((s, dir) =>
      Multimodal.featureExtractBatches(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),

    // BPE tokenizer TRAINING, fully oracle-gated (VERDICT r12 #1 retires
    // the last exemption): the engine's batched rounds are provably
    // bit-identical to sequential greedy training (the acceptBatch
    // prefix proof + BpeSpec pins), and sequential training IS
    // SQL-expressible with the merge count as a literal — the oracle
    // generates Q98Merges chained CTE rounds, each a pair-count
    // aggregate → argmax with the (cnt DESC, pair ASC) tie-break → a
    // boundary-wrapped-string merge apply (the q118 replace trick).
    "q98_bpe_train" -> ((s, dir) => {
      assertBpeOracleSafe(s, dir)
      Bpe.trainMerges(Tables.documents(s, dir), nMerges = Q98Merges)
    }),

    // ANN recall report (VERDICT r6 #5): the single-probe IVF index's
    // top-5 graded against brute-force truth on the deterministic
    // vec_id < 8 golden query set — exact rationals, hash-portable
    "q99_ann_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.recallAtK(
        Similarity.ivfTopKKmeansModel(e, kmeansShared(s, dir),
          l => l.filter(col("vec_id") < 8), k = 5),
        Similarity.bruteTopK(e, e.filter(col("vec_id") < 8), k = 5))
    }),

    // cross-modal integration: per (embedding k-means cell, language)
    // document quality — the "which clusters hold good data" report; the
    // doc side is scan-fused projections, the join is 8-byte ids
    "q96_cluster_quality" -> ((s, dir) => {
      val cells = kmeansShared(s, dir).cells
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.predLang(col("text")).as("pred_lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      cells.join(docs, cells("vec_id") === docs("doc_id"))
        .groupBy(col("cell"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 4).as("avg_quality"))
    }),

    // q138: the two-level (hierarchical) cell assignment hash-gated
    // against the flat argmin — the custom NearestCellTwoLevel
    // expression end-to-end, with the hier index (driver-clustered over
    // the centroid array) published for the oracle (the q129 learned-
    // artifact pattern). Output carries BOTH assignments + the agree
    // flag, so the gate pins the exact disagreement structure, not just
    // the fast path
    "q138_twolevel_assign" -> ((s, dir) => {
      val model = kmeansShared(s, dir)
      val idx = Similarity.hierIndex(model, groups = 2)
      learnedHierModel = Some((model.centroids.toIndexedSeq, idx))
      val flat = model.cells.withColumnRenamed("cell", "cell_flat")
      Similarity.assignCellsTwoLevel(
          Tables.embeddings(s, dir), model, idx, nProbeGroups = 1)
        .withColumnRenamed("cell", "cell_two_level")
        .join(flat, "vec_id")
        .select(col("vec_id"), col("cell_two_level"), col("cell_flat"),
          when(col("cell_two_level") === col("cell_flat"), 1)
            .otherwise(0).as("agree"))
    }),

    // q136: SemDeDup — semantic duplicate GROUPS (within-cell cosine
    // pairs + q52 star CC over the shared quantizer's cells) with the
    // paper's survivor policy: keep the member LEAST similar to its
    // cell centroid, aggregate-argmin, ties to the smaller vec_id
    "q136_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(Tables.embeddings(s, dir),
        kmeansShared(s, dir), SemDedupThreshold)),

    // Okapi BM25 top-50 retrieval for a fixed query term set: tf/dl from
    // per-row array kernels in the scan, corpus constants one broadcast
    // row, top-N a TakeOrdered heap — nothing shuffles at corpus size
    "q100_bm25_topk" -> ((s, dir) =>
      TextAnalysis.bm25TopK(Tables.documents(s, dir), Bm25Terms)),

    // interpolated Kneser-Ney bigram perplexity: continuation/context
    // counts re-folded from the one persisted LM pair stream
    "q101_lm_kneser_ney" -> ((s, dir) =>
      TextAnalysis.lmScoreKneserNey(Tables.documents(s, dir))),

    // near-dup survivor selection: keep-best-quality per q52 cluster
    // (shared component labels; aggregate-then-join argmax, never a
    // window over a viral cluster)
    "q102_cluster_survivor" -> ((s, dir) =>
      Dedup.clusterSurvivors(ccLabelsShared(s, dir),
        Tables.documents(s, dir))),

    // cross-document shingle novelty: fraction of a doc's distinct
    // 3-gram shingles appearing in no other doc — inter-document
    // boilerplate signal; fingerprint-frequency fold + one equi-join
    "q103_shingle_novelty" -> ((s, dir) =>
      TextAnalysis.shingleNovelty(Tables.documents(s, dir))),

    // per-source quality percentile: midrank over the (source, quality)
    // histogram — windows touch only the metadata-sized histogram, docs
    // pick up their percentile by equi-join
    "q104_quality_percentile" -> ((s, dir) =>
      Curation.qualityPercentile(Tables.documents(s, dir))),

    // MinHash calibration: estimated vs exact Jaccard on every LSH
    // candidate pair — the (k, bands, rows) tuning report. IS the shared
    // LSH stage relation (consumes q11's published checkpoint whole).
    "q105_minhash_calibration" -> ((s, dir) => lshCalibShared(s, dir)),

    // cross-source near-dup overlap matrix: which ingestion streams
    // duplicate each other; pairs from the capped LSH pipeline, matrix
    // one aggregate to <= #sources^2 rows
    // pairs from the shared LSH stage, not a per-query re-derivation
    "q106_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlapFromPairs(Tables.documents(s, dir),
        lshPairsShared(s, dir))),

    // top boilerplate shingles: df fold on fingerprints, TakeOrdered
    // heap, strings rejoin for the N winners only
    "q107_top_boilerplate" -> ((s, dir) =>
      TextAnalysis.topBoilerplate(Tables.documents(s, dir))),

    // cross-family dedup agreement: MinHash vs SimHash pair sets as one
    // row — do the families catch the same near-dups on this corpus?
    // MinHash side from the shared LSH stage; SimHash side derives fresh
    "q108_dedup_agreement" -> ((s, dir) =>
      Dedup.familyAgreementFromPairs(Tables.documents(s, dir),
        lshPairsShared(s, dir))),

    // time-bounded daily rollup over the date-PARTITIONED event layout:
    // the predicate prunes whole date directories at planning time
    // (PartitionFilters — WritersSpec pins the partitions-read metric);
    // the oracle replays the rollup over the raw table, proving the
    // partitioned round-trip loses nothing
    "q109_partitioned_rollup" -> ((s, dir) =>
      s.read.parquet(partitionedEventsShared(s, dir))
        .filter(col("event_date").between(lit("2024-01-05"), lit("2024-01-11")))
        .groupBy(col("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))),

    // q135: the Z-ordered (Morton) event layout read back — one row per
    // z_file directory with its row count, id-sum (losslessness weight),
    // per-column min/max BOX, and the skip/read decision a stats-based
    // reader makes for the fixed 2-D predicate box. The oracle replays
    // the bucket arithmetic + interleave from the raw table, so the gate
    // proves the physical directory assignment IS the closed-form key —
    // no row misplaced, lost, or duplicated (WritersSpec adds the
    // planning-time pruning pin and the skipping advantage vs a
    // single-column sort)
    "q135_zorder_layout" -> ((s, dir) => {
      val lay = s.read.parquet(zorderEventsShared(s, dir))
      lay.groupBy(col("z_file"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("event_id")).as("sum_event_id"),
          min(col("user_id")).as("u_min"), max(col("user_id")).as("u_max"),
          min(col("value")).as("v_min_raw"), max(col("value")).as("v_max_raw"))
        .select(col("z_file"), col("n_rows"), col("sum_event_id"),
          col("u_min"), col("u_max"),
          round(col("v_min_raw"), 4).as("v_min"),
          round(col("v_max_raw"), 4).as("v_max"),
          when(col("u_max") >= ZBoxUMin && col("u_min") <= ZBoxUMax &&
            col("v_max_raw") >= ZBoxVMin && col("v_min_raw") <= ZBoxVMax, 1)
            .otherwise(0).as("hit"))
    }),

    // WARC interchange round-trip: write the corpus as length-framed WARC
    // shards, stream-parse them back, and roll up per (source, lang) —
    // the oracle replays the rollup over the RAW documents table, so any
    // framing bug (payload bytes, header metadata, lost/duplicated
    // records) breaks the hash
    "q110_warc_roundtrip" -> ((s, dir) =>
      graft.sources.Warc.readWarc(s, warcShared(s, dir))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text"))).as("payload_bytes"),
          sum(col("doc_id")).as("sum_doc_id"))),

    // the q110 rollup through the DSv2 `format("warc")` READ path — the
    // same shared gzip layout, so the gate proves the V2 per-shard
    // connector (planInputPartitions over the shard glob + streaming
    // record parse) is lossless exactly as the function-style reader is
    "q132_warc_v2_read" -> ((s, dir) =>
      s.read.format("warc").load(warcShared(s, dir))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text"))).as("payload_bytes"),
          sum(col("doc_id")).as("sum_doc_id"))),

    // trained quality classifier scoring: fixed-order logit over the q18
    // kernel signals under the shipped 6-decimal weight artifact, sigmoid
    // calibration, accept decision on the rounded probability — the
    // oracle replays the identical arithmetic with the same literals
    "q111_quality_classifier" -> ((s, dir) =>
      graft.operators.QualityModel.scoreDocs(Tables.documents(s, dir))),

    // priority rollup over the BUCKETED lineitem⋈orders layout: both
    // sides pre-shuffled on the orderkey at write time, so the join
    // itself plans exchange-free (WritersSpec pins that no exchange
    // hash-partitions an orderkey); oracle = the same join over the raw
    // tables
    "q112_bucketed_join" -> ((s, dir) => {
      val (liT, orT) = bucketedTablesShared(s, dir)
      s.table(liT).join(s.table(orT),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // LSH recall gate (the q99 discipline for dedup): banding misses
    // measured against an id-window ground-truth sample of raw exact
    // Jaccard; caught pairs from the shared LSH stage
    "q113_lsh_recall" -> ((s, dir) =>
      Dedup.lshRecallFromPairs(Tables.documents(s, dir),
        lshPairsShared(s, dir))),

    // per-document top-k similar-doc lookup, served from the shared LSH
    // stage: symmetrized verified pairs ranked by the ROUNDED jaccard
    // (deterministic cross-engine ordering), row_number <= k planning as
    // WindowGroupLimit bounded heaps
    "q114_similar_topk" -> ((s, dir) =>
      Dedup.similarTopK(lshPairsShared(s, dir))),

    // staged conversion funnel (view → click → purchase, strictly-after
    // semantics): chained per-stage window minima over ONE user_id
    // partitioning, per-user collapse reuses it — one shuffle end to end
    "q115_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir))),

    // day-granularity cohort retention: first-active-day cohorts,
    // per-(cohort, offset) distinct active users, broadcast cohort sizes
    "q116_retention_cohorts" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir))),

    // DSIR-shaped importance resampling: hashed-unigram log-likelihood
    // ratio of the target source's distribution vs the pool's, model-first
    // fold (one tokenize pass, vocab-cardinality model join, TakeOrdered
    // selection on the rounded normalized weight)
    "q117_importance_resample" -> ((s, dir) =>
      Curation.importanceResample(Tables.documents(s, dir),
        targetSource = "src0")),

    // BPE tokenizer APPLICATION gate (VERDICT r11 #1 — narrows q98's
    // exemption to the training fixpoint alone): train on the dir's
    // corpus, publish the learned merge table for the oracle builder,
    // then tokenize every document under it. Every corpus word is a
    // training word, where encode == sequential rank-order application
    // (the BpeSpec pin), so the oracle replays the merges as literals —
    // nMerges nested left-to-right `replace` calls over a
    // boundary-wrapped string — and hash-matches the full piece stream.
    "q118_bpe_encode" -> ((s, dir) => {
      // trains FRESH every run (the q11 producer discipline: q118's bench
      // timing keeps pricing the BPE training) and republishes the memo
      // q123 consumes; training is deterministic, so the value only ever
      // changes when the corpus does
      assertBpeOracleSafe(s, dir)
      val merges = Bpe.trainMergePairs(Tables.documents(s, dir), Q118Merges)
      learnedBpeMerges = Some(merges)
      bpeMergesMemo.put(ccKey(s, dir), (s, merges))
      Bpe.encodeDocs(Tables.documents(s, dir), merges)
    }),

    // tokenizer fertility per source under the q118-trained merges
    // (pieces/word, chars/piece — the vocabulary-fit table a token-
    // budgeted run reads before committing to a tokenizer); consumes the
    // q118 memo, training only when it runs standalone
    "q123_bpe_fertility" -> ((s, dir) =>
      Bpe.fertilityReport(Tables.documents(s, dir), bpeMergesShared(s, dir))),

    // the composed four-stage curation DAG (percentile-keep → LSH dedup
    // survivors → token budget → packing) gated as ONE query — the
    // integration, not just each stage, is hash-verified (VERDICT r11
    // #4). The stage's checkpointed dropped-id relation outlives the
    // call (the result plan reads it); a re-run releases the PREVIOUS
    // invocation's, the ccLabelsFresh discipline, so lingering raw-RDD
    // state is bounded at one tiny id relation per (session, corpus).
    "q119_curation_dag" -> ((s, dir) => {
      val it = dagStageMemo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue._1.sparkContext.isStopped) it.remove()
      val stage = Curation.curationDagStage(Tables.documents(s, dir))
      Option(dagStageMemo.put(ccKey(s, dir), (s, stage)))
        .foreach(_._2.release())
      stage.result
    }),

    // ANN recall-vs-cost frontier (VERDICT r11 #5): per (nProbe, golden
    // query), the IVF top-5's recall against brute truth AND the number
    // of candidates that probe level scored — index tuning as a gated
    // table instead of probe output. nProbe=4 scores every cell (kCells
    // = 4), anchoring the frontier at recall 1.
    "q120_ann_frontier" -> ((s, dir) =>
      Similarity.annFrontierModel(Tables.embeddings(s, dir),
        kmeansShared(s, dir),
        e => e.filter(col("vec_id") < 8), k = 5, probes = Seq(1, 2, 4))),

    // IVF-PQ frontier (VERDICT r12 #5): the compressed-layout extension
    // of q120 — float truth anchor, pure-PQ asymmetric-distance brute
    // force, and coarse-pruned IVF-PQ at nProbe 1/2, each with recall +
    // n_scored. Trains the per-subspace codebooks FRESH (the producer
    // pricing discipline) and publishes them for the oracle replay (the
    // q118 learned-artifact pattern); the coarse quantizer is the shared
    // session k-means.
    "q129_pq_frontier" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val coarse = kmeansShared(s, dir)
      val model = Similarity.pqFit(e, dim = EmbDim)
      val resModel = Similarity.pqFitResidual(e, coarse, dim = EmbDim)
      learnedPqModel = Some(model)
      learnedPqResModel = Some(resModel)
      Similarity.pqFrontier(e, coarse, model,
        q => q.filter(col("vec_id") < 8), kTop = 5, probes = Seq(1, 2),
        resModel = Some(resModel))
    }),

    // PCA projection of the embedding corpus (the dimensionality-
    // reduction / whitening prep step before ANN at scale): basis fitted
    // on the deterministic bounded sample driver-side (model-on-driver,
    // the kmeansFit discipline), published for the oracle, projection =
    // one codegen'd dot against literal vectors per component — scan-
    // fused, zero shuffle
    "q133_pca_project" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val model = Similarity.pcaFit(e, k = PcaK)
      learnedPcaModel = Some(model)
      Similarity.pcaProject(e, model)
    }),

    // small-file compaction gated end to end: a fragmented partitioned
    // layout (16 files/partition) is compacted to one file per partition
    // and the FULL-range rollup must still match the raw-table oracle —
    // the rewrite provably loses, moves, and duplicates nothing
    // (WritersSpec pins the file counts; this gate pins the rows)
    "q125_compacted_rollup" -> ((s, dir) =>
      s.read.parquet(compactedEventsShared(s, dir))
        .groupBy(col("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))),

    // source-mixture selection: the data-mixing step between data cards
    // and training — per-source token budgets from target shares, the
    // q80 bucket-wise cutoff partitioned by source, content-hash-coin
    // selection within each source; every row carries its source's
    // budget/spent/unspent so a thin source's shortfall is in-band
    // (VERDICT r12 #7)
    "q127_source_mix" -> ((s, dir) =>
      Curation.mixToTargets(Tables.documents(s, dir),
        MixTargets.toMap, MixBudget)),

    // the q127 mix's per-source accounting REPORT, gated in its own
    // right: one row per TARGET source including the ghost (a target
    // with no corpus presence — spent 0, unspent = full slice), the
    // case the row-riding accounting on q127's selection output
    // structurally cannot show
    "q131_mix_accounting" -> ((s, dir) =>
      Curation.mixAccounting(Tables.documents(s, dir),
        MixTargets.toMap + (MixGhostSource -> MixGhostShare), MixBudget)),

    // corpus snapshot merge (MERGE INTO semantics engine-side): a
    // deterministic refresh scenario — existing = 80% of the corpus,
    // incoming = the even ids with every 10th doc's text modified — so
    // all four change classes (insert/rewrite/refresh/carry) appear and
    // the change tags + final rows hash-gate against the SQL replay
    "q126_corpus_merge" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "text", "lang", "source")
      Curation.mergeCorpus(
        docs.filter(col("doc_id") % 5 =!= 4),
        docs.filter(col("doc_id") % 2 === 0)
          .withColumn("text",
            when(col("doc_id") % 10 === 0,
              concat(col("text"), lit(" updated")))
              .otherwise(col("text"))))
    }),

    // incremental-state corpus merge (VERDICT r12 #3): the q126 scenario
    // merged through the STORED (doc_id, fp) artifact instead of a
    // corpus text scan — output is the refreshed artifact + change audit
    // in one relation. The artifact bootstraps once per (session, dir)
    // behind an eager localCheckpoint, so the gated merge plan reads a
    // LogicalRDD leaf: corpus text is provably absent from the plan
    // (CurationSpec pins it), which is the entire point of the operator.
    "q128_corpus_merge_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "text", "lang", "source")
      val existing = docs.filter(col("doc_id") % 5 =!= 4)
      val incoming = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" updated")))
            .otherwise(col("text")))
      val it = corpusFpsMemo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue._1.sparkContext.isStopped) it.remove()
      val fps = corpusFpsMemo.computeIfAbsent(ccKey(s, dir), _ =>
        (s, Curation.corpusFingerprints(existing).localCheckpoint(true)))._2
      Curation.mergeCorpusIncremental(incoming, fps)
    }),

    // q143: snapshot time travel — the q128 merge chain COMMITTED as
    // versions (delta feeds + manifest; SnapshotStore scaladoc) and
    // membership reconstructed AT EVERY VERSION from the stored chain:
    // the gate proves that what the store replays is bit-for-bit the
    // chain the oracle recomputes from raw text. The store builds once
    // per (session, dir); the gated plan reads only 16-byte feed rows.
    "q143_snapshot_asof" -> ((s, dir) => {
      val root = snapshotStoreShared(s, dir)
      (1L to 3L).map(v =>
        graft.sources.SnapshotStore.corpusAsOf(s, root, v)
          .select(lit(v).as("as_of"), col("doc_id"), col("fp")))
        .reduce(_.unionByName(_))
    }),

    // q134: the REPORTING twin of q128 — data cards of the refreshed
    // corpus from the stored per-doc stats artifact + the daily batch
    // (same prior/incoming split and drift as q128). The r13 ingest
    // probe measured the card stage as the chain's only remaining
    // corpus-sized text scan; through this path corpus text enters the
    // plan nowhere — kernels run over batch text only, carry rows ride
    // the ~40-byte artifact (CurationSpec pins bit-equality with the
    // full recompute and the text-free plan)
    "q134_datacard_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text", "source")
      val incoming = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" updated")))
            .otherwise(col("text")))
      Curation.sourceDatacardIncremental(incoming, cardStatsShared(s, dir))
    }),

    // eval-set decontamination (GPT-3 app. C / Pile §6 discipline):
    // src9 plays the benchmark, every other source is pool; the
    // benchmark's distinct shingle fps broadcast and the pool pays one
    // scan + per-doc count — leaked eval material flagged before it
    // corrupts the measurement it belongs to
    "q122_decontamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.decontaminationReport(
        docs.filter(col("source") =!= DecontamBenchmarkSource),
        docs.filter(col("source") === DecontamBenchmarkSource))
    }),

    // per-source data card (Datasheets-for-Datasets shape): volume,
    // exact-dup exposure, quality share, majority language — every
    // number integer-derived so the hash gate can't flake on summation
    // order; one kernel scan + an 8-byte-fp dup join
    "q124_source_datacard" -> ((s, dir) =>
      Curation.sourceDatacard(Tables.documents(s, dir))),

    // the DAILY INGESTION pipeline gated end to end (VERDICT r12 #6 —
    // q119 proved the curation DAG; this is the ingestion twin): today's
    // crawl segment arrives as gzip WARC shards (the q110 layout), is
    // stream-parsed back, curated (q53's fused lang+quality+exact-dedup
    // survivors), MERGED into the prior corpus snapshot with change
    // auditing (q126), and the refreshed corpus ships its per-source
    // data cards (q124) — four production stages, ONE hash gate over the
    // final cards, each stage replayed and chained in the oracle. A
    // fifth of the incoming text drifts (" recrawled") so the merge
    // exercises rewrite alongside refresh/insert/carry.
    "q130_ingest_chain" -> ((s, dir) => {
      val incoming = graft.sources.Warc.readWarc(s, warcShared(s, dir))
        .filter(col("doc_id") % 2 === 0)
        .withColumn("text",
          when(col("doc_id") % 20 === 0,
            concat(col("text"), lit(" recrawled")))
            .otherwise(col("text")))
        .select("doc_id", "text", "lang", "source")
      val curated = incoming
        .join(Curation.curate(incoming, lang = "en", minQuality = 0.5)
          .select("doc_id"), "doc_id")
      val prior = Tables.documents(s, dir)
        .select("doc_id", "text", "lang", "source")
        .filter(col("doc_id") % 5 =!= 4)
      val merged = Curation.mergeCorpus(prior, curated)
      Curation.sourceDatacard(merged.select("doc_id", "source", "text"))
    }),

    // q137: the q130 ingestion chain through the STEADY-STATE artifact
    // path — same WARC segment, same curation, but the refreshed cards
    // come from the stored per-doc stats artifact + the curated batch
    // (q134's path), so corpus text never enters the plan. The oracle is
    // q130's VERBATIM (shared constant): the production path must
    // hash-equal the bootstrap chain's replay — the strongest form of
    // the CurationSpec equivalence, driver-gated
    "q137_ingest_chain_incremental" -> ((s, dir) => {
      val incoming = graft.sources.Warc.readWarc(s, warcShared(s, dir))
        .filter(col("doc_id") % 2 === 0)
        .withColumn("text",
          when(col("doc_id") % 20 === 0,
            concat(col("text"), lit(" recrawled")))
            .otherwise(col("text")))
        .select("doc_id", "text", "lang", "source")
      val curated = incoming
        .join(Curation.curate(incoming, lang = "en", minQuality = 0.5)
          .select("doc_id"), "doc_id")
      Curation.sourceDatacardIncremental(
        curated.select("doc_id", "source", "text"),
        cardStatsShared(s, dir))
    }),

    // classifier QUALITY gate (VERDICT r11 #6): confusion counts +
    // accuracy/precision/recall/F1 of the shipped q111 artifact per
    // content-hash split — the `test` row is a held-out generalization
    // measurement, all metrics integer-derived and rounded
    "q121_classifier_eval" -> ((s, dir) =>
      graft.operators.QualityModel.evaluateSplits(Tables.documents(s, dir))),
  )

  private val dagStageMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, Curation.CurationDagStage)]()

  // q128's bootstrapped corpus-fingerprint artifact per (session, dir):
  // an eager localCheckpoint, so consumers read a LogicalRDD leaf that
  // survives the Verify/Bench clearCache (the q11 shared-stage
  // discipline) and the merge plan carries no corpus text scan
  private val corpusFpsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, org.apache.spark.sql.DataFrame)]()

  // q134/q137's bootstrapped per-doc card-stats artifact per (session,
  // dir) — the corpusFpsMemo discipline applied to the reporting state
  // relation; the prior snapshot is the q128 split (doc_id % 5 =!= 4)
  private val cardStatsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, org.apache.spark.sql.DataFrame)]()

  private def cardStatsShared(s: SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val it = cardStatsMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    cardStatsMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val prior = Tables.documents(s, dir)
        .select("doc_id", "source", "text")
        .filter(col("doc_id") % 5 =!= 4)
      (s, Curation.docCardStats(prior).localCheckpoint(true))
    })._2
  }

  // q118-trained merge table per (session, dir): q118 produces (fresh
  // each run), q123 consumes; the fallback trains so q123 also runs
  // standalone (the Verify map iterates in arbitrary order)
  private val bpeMergesMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (SparkSession, Seq[(String, String)])]()

  private def bpeMergesShared(s: SparkSession, dir: String): Seq[(String, String)] = {
    val it = bpeMergesMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    val m = bpeMergesMemo.computeIfAbsent(ccKey(s, dir), _ => {
      assertBpeOracleSafe(s, dir)
      (s, Bpe.trainMergePairs(Tables.documents(s, dir), Q118Merges))
    })._2
    learnedBpeMerges = Some(m)
    m
  }

  /** The q118/q123 oracle wraps every corpus word as `|c1||c2|…` and RE2's
    * `.` skips newlines — a corpus word containing '|', '\n', or '\r'
    * would make the SQL replay disagree with an engine that encodes it
    * correctly. Fail LOUDLY on such a corpus instead of hash-mismatching
    * mysteriously (review r12; the fix on such data is a chr(1) wrap
    * char). One cheap aggregate, MEMOIZED per (session, corpus) — the
    * ADVICE r12 fix: q98/q118/q123 each call this, and without the memo
    * every Bench iteration of q118 re-paid a full corpus text scan that
    * skewed its timing comparability across rounds.
    */
  private val bpeSafeMemo = new java.util.concurrent.ConcurrentHashMap[
    String, SparkSession]()

  private def assertBpeOracleSafe(s: SparkSession, dir: String): Unit = {
    val it = bpeSafeMemo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue.sparkContext.isStopped) it.remove()
    bpeSafeMemo.computeIfAbsent(ccKey(s, dir), _ => {
      val hazard = Tables.documents(s, dir)
        .agg(sum(when(col("text").contains("|") || col("text").contains("\n")
          || col("text").contains("\r")
          // supplementary-plane hazard (review r13): the engine seeds BPE
          // symbols as UTF-16 code units (split(word, "") halves an
          // astral char into surrogates) while the DuckDB replay seeds
          // per CODEPOINT — the two would train different merges
          || col("text").rlike("[\\x{10000}-\\x{10FFFF}]"), 1L)
          .otherwise(0L))).head()
      require(hazard.isNullAt(0) || hazard.getLong(0) == 0L,
        "corpus text contains '|', a newline, or a supplementary-plane " +
          "character — the q98/q118/q123 DuckDB replay's boundary wrap " +
          "or codepoint seeding would diverge; switch the oracle to a " +
          "chr(1) wrap / normalize astral chars before gating this corpus")
      s
    })
    ()
  }

  /** q100's fixed query term set: one rare discriminative term plus two
    * mid-frequency terms of the synthetic vocabulary, so the ranking
    * exercises the full IDF spread.
    */
  val Bm25Terms: Seq[String] = Seq("dup", "spark", "window")

  /** q122's benchmark stand-in: one source plays the eval set, the other
    * nineteen are the pool (the q117 target-source convention).
    */
  val DecontamBenchmarkSource = "src9"

  /** q127's mixture recipe: target token shares per source and the output
    * token budget, both mirrored into the oracle as literals. The budget
    * sits below any single source's token inventory at sf0.01 so every
    * source exercises the boundary-bucket cut, not just whole-bucket
    * takes.
    */
  val MixTargets: Seq[(String, Double)] =
    Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
  val MixBudget = 2000L

  /** q131's ghost target: a source absent from every testdata corpus
    * (sources are src0..src19), so the accounting report must surface a
    * zero-spent row for it — the silent-shrink case the gate pins.
    */
  val MixGhostSource = "src_ghost"
  val MixGhostShare = 0.05

  /** q118's merge budget — generous for the synthetic 31-word vocabulary
    * (training stops on its own when no pair remains), small enough that
    * the oracle's nested-replace chain stays shallow.
    */
  val Q118Merges = 48

  /** q98's merge budget. Unlike q118 (which interpolates the LEARNED
    * merges and gates only the apply step), q98's oracle re-runs the
    * whole training loop in SQL, so its cost is linear in this count —
    * 8 keeps the generated CTE chain a few hundred lines while still
    * exercising a multi-char merge (round 6 merges "m"+"er").
    */
  val Q98Merges = 8

  /** The q127/q131 selection replay: budgets from a VALUES relation
    * (floor(budget·share) computed HERE, the same longs the engine
    * folds), the bucket-wise cutoff partitioned by source, boundary
    * buckets ranked by doc_id — ends in a `sel(doc_id, source,
    * n_tokens, hb)` CTE both gates consume.
    */
  private def mixSelCtes(targets: Seq[(String, Double)]): String = {
    val vals = targets.map { case (src, share) =>
      s"('$src', ${math.floor(MixBudget * share).toLong})"
    }.mkString(", ")
    s"""bud AS (SELECT * FROM (VALUES $vals) AS v(source, budget)),
       |t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
       |             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100
       |               AS hb
       |      FROM documents),
       |e AS (SELECT t.doc_id, t.source, t.n_tokens, t.hb, bud.budget
       |      FROM t JOIN bud USING (source)),
       |b AS (SELECT source, hb, CAST(sum(n_tokens) AS BIGINT) AS b_tokens
       |      FROM e GROUP BY 1, 2),
       |bc AS (SELECT source, hb, b_tokens,
       |              CAST(coalesce(sum(b_tokens) OVER (PARTITION BY source
       |                ORDER BY hb
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |                AS BIGINT) AS cum_before
       |       FROM b),
       |j AS (SELECT e.doc_id, e.source, e.n_tokens, e.hb,
       |             bc.b_tokens, bc.cum_before, e.budget
       |      FROM e JOIN bc USING (source, hb)),
       |bnd AS (SELECT doc_id, source, n_tokens, hb FROM (
       |    SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source, hb
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_in
       |    FROM j WHERE cum_before < budget
       |      AND cum_before + b_tokens > budget)
       |  WHERE cum_before + cum_in + n_tokens <= budget),
       |sel AS (
       |  SELECT doc_id, source, n_tokens, hb FROM j
       |  WHERE cum_before + b_tokens <= budget
       |  UNION ALL SELECT * FROM bnd)""".stripMargin
  }

  /** The q98 TRAINING replay (VERDICT r12 #1): sequential greedy BPE as
    * `nMerges` generated CTE rounds. Round r reads the vocabulary in its
    * round-(r-1) segmentation (the q118 boundary-wrapped string form
    * `|s1||s2|…|sn|`), folds all adjacent symbol pairs weighted by word
    * count (overlap allowed — the engine's counting convention), takes
    * the argmax under the engine's exact (cnt DESC, pair ASC) tie-break,
    * and applies the winner with a single left-to-right non-overlapping
    * `replace` (bit-identical to [[graft.functions.BpeApply]]'s scan
    * order; the double separator keeps adjacent matches from sharing
    * characters). The engine's BATCHED rounds equal this sequential
    * replay by the [[graft.operators.Bpe.acceptBatch]] prefix proof
    * (accepted pairs are symbol-disjoint, so earlier batch members
    * cannot change later members' counts) — pinned by BpeSpec.
    * `AS MATERIALIZED` forces linear work: v{r} is referenced twice
    * (p{r+1} and v{r+1}), and an inlining CTE planner would otherwise
    * re-derive the whole chain exponentially. An exhausted vocabulary
    * (no pair left) yields an empty m{r}, the LEFT JOIN carries the
    * segmentation unchanged, and the round contributes no row — the
    * engine's early-stop semantics.
    */
  private def bpeTrainOracleSql(nMerges: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """v0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS wcount,
      |         regexp_replace(word, '(.)', '|\1|', 'g') AS seg
      |  FROM (
      |    SELECT unnest(list_filter(string_split(lower(text), ' '),
      |                              w -> len(w) > 0)) AS word
      |    FROM documents)
      |  GROUP BY 1)""".stripMargin
    for (r <- 1 to nMerges) {
      ctes += s"""p$r AS MATERIALIZED (
        |  SELECT pair, CAST(sum(wcount) AS BIGINT) AS cnt FROM (
        |    SELECT wcount, unnest(list_transform(range(1, len(syms)),
        |      i -> syms[i] || ' ' || syms[i+1])) AS pair
        |    FROM (SELECT wcount, string_split(trim(seg, '|'), '||') AS syms
        |          FROM v${r - 1}))
        |  GROUP BY 1)""".stripMargin
      ctes += s"""m$r AS MATERIALIZED (
        |  SELECT $r AS rnk, string_split(pair, ' ')[1] AS lft,
        |         string_split(pair, ' ')[2] AS rgt, cnt
        |  FROM p$r ORDER BY cnt DESC, pair ASC LIMIT 1)""".stripMargin
      if (r < nMerges)
        ctes += s"""v$r AS MATERIALIZED (
          |  SELECT v.word, v.wcount,
          |         CASE WHEN m.lft IS NULL THEN v.seg
          |              ELSE replace(v.seg, '|' || m.lft || '||' || m.rgt || '|',
          |                           '|' || m.lft || m.rgt || '|') END AS seg
          |  FROM v${r - 1} v LEFT JOIN m$r m ON true)""".stripMargin
    }
    val union = (1 to nMerges).map(r => s"SELECT * FROM m$r").mkString("\nUNION ALL\n")
    "WITH " + ctes.result().mkString(",\n") + "\n" +
      """SELECT CAST(rnk AS INTEGER) AS "rank", lft AS "left", rgt AS "right",
        |       lft || rgt AS merged, cnt AS pair_count
        |FROM (""".stripMargin + union + ")"
  }

  /** q118's learned merge table, published by the query run for the oracle
    * builder — [[Verify]] materializes every query BEFORE it serializes
    * `oracleSql`, so the interpolation always sees the table the gated
    * result was actually produced under (the q111 shipped-artifact
    * discipline, with the artifact learned in-run instead of frozen in
    * code because the merges are corpus-dependent).
    */
  @volatile private[graft] var learnedBpeMerges: Option[Seq[(String, String)]] = None

  /** q129's learned PQ codebooks, published by the query run for the
    * oracle builder — same contract as [[learnedBpeMerges]]: Verify
    * materializes every query before serializing `oracleSql`, so the
    * interpolated literals are exactly the model the gated frontier was
    * scored under. `Double.toString` round-trips bit-exact through SQL
    * literal parsing, so no rounding scaffolding is needed beyond the
    * round-6 the ADC tables already carry.
    */
  @volatile private[graft] var learnedPqModel: Option[operators.Similarity.PqModel] = None

  /** q129's learned RESIDUAL PQ codebooks (trained on x − c_coarse) —
    * published alongside [[learnedPqModel]]; the oracle recomputes the
    * residual codes, per-cell reconstructed norms, and q·c_coarse terms
    * in SQL from these literals plus the replayed coarse centroids.
    */
  @volatile private[graft] var learnedPqResModel: Option[operators.Similarity.PqModel] = None

  /** q138's published artifacts: the session quantizer's centroid matrix
    * plus the driver-clustered hier index (group centroids + member
    * lists) — all Double.toString round-trip literals for the oracle.
    */
  @volatile private[graft] var learnedHierModel
      : Option[(IndexedSeq[Seq[Double]], operators.Similarity.HierIndex)] = None

  /** The q129 IVF-PQ frontier replay: PQ codes from the interpolated
    * codebooks (same `|c|² − 2·dot` + (dist, code) tie-break as the
    * engine's NearestCells slices), per-query round-6 ADC tables
    * recomputed in SQL with the identical index-order folds, the
    * fixed-order m-term lookup sums, and the q120 coarse-probe prefix
    * machinery for the IVF-PQ variants.
    */
  private def pqFrontierOracleSql(model: operators.Similarity.PqModel,
                                  rModel: operators.Similarity.PqModel)
      : String = {
    val m = model.m
    val kk = model.k
    val sub = model.subDim
    val cbRows = (for (mi <- 0 until m; j <- 0 until kk) yield
      s"($mi, $j, [${model.codebooks(mi)(j).mkString(", ")}]::DOUBLE[])")
      .mkString(",\n    ")
    val nFlat = model.cnorm2Flat.mkString(", ")
    def adcTerms(t: String, codes: String) = (0 until m)
      .map(mi => s"$t[${mi * kk} + $codes[${mi + 1}] + 1]").mkString(" + ")
    // residual-variant literals/terms (ivfpq_res_pN): same shapes over
    // the residual codebooks; the per-cell reconstructed-norm and
    // q·c_coarse tables are REPLAYED from c$KmeansIters rather than
    // interpolated, so the oracle derives them the way the engine does
    val mr = rModel.m
    val kkr = rModel.k
    val subR = rModel.subDim
    val cbrRows = (for (mi <- 0 until mr; j <- 0 until kkr) yield
      s"($mi, $j, [${rModel.codebooks(mi)(j).mkString(", ")}]::DOUBLE[])")
      .mkString(",\n    ")
    def adcTermsR(t: String, codes: String) = (0 until mr)
      .map(mi => s"$t[${mi * kkr} + $codes[${mi + 1}] + 1]").mkString(" + ")
    kmeansCtes.stripSuffix("\n") + ",\n" +
      s"""cb AS (SELECT * FROM (VALUES
         |    $cbRows) AS t(mi, j, c)),
         |nlit AS (SELECT [$nFlat]::DOUBLE[] AS n2),
         |pcodes AS (
         |  SELECT vec_id, list(code ORDER BY mi) AS codes FROM (
         |    SELECT vec_id, mi, code FROM (
         |      SELECT v.vec_id, cb.mi, cb.j AS code,
         |             row_number() OVER (PARTITION BY v.vec_id, cb.mi ORDER BY
         |               list_sum(list_transform(cb.c, x -> x*x))
         |               - 2 * list_sum(list_transform(range(1, ${sub + 1}),
         |                     i -> v.emb[cb.mi * $sub + i] * cb.c[i])),
         |               cb.j) AS rn
         |      FROM v CROSS JOIN cb) WHERE rn = 1)
         |  GROUP BY vec_id),
         |cbr AS (SELECT * FROM (VALUES
         |    $cbrRows) AS t(mi, j, c)),
         |rcodes AS (
         |  SELECT vec_id, cell, list(code ORDER BY mi) AS codes FROM (
         |    SELECT vec_id, cell, mi, code FROM (
         |      SELECT v.vec_id, cl.cell, cbr.mi, cbr.j AS code,
         |             row_number() OVER (PARTITION BY v.vec_id, cbr.mi ORDER BY
         |               list_sum(list_transform(cbr.c, x -> x*x))
         |               - 2 * list_sum(list_transform(range(1, ${subR + 1}),
         |                     i -> (v.emb[cbr.mi * $subR + i]
         |                           - cc.c[cbr.mi * $subR + i]) * cbr.c[i])),
         |               cbr.j) AS rn
         |      FROM v JOIN cells cl ON cl.vec_id = v.vec_id
         |      JOIN c$KmeansIters cc ON cc.cell = cl.cell
         |      CROSS JOIN cbr) WHERE rn = 1)
         |  GROUP BY vec_id, cell),
         |trq AS (
         |  SELECT v.vec_id AS q_id, cbr.mi, cbr.j,
         |         round(list_sum(list_transform(range(1, ${subR + 1}),
         |               i -> v.emb[cbr.mi * $subR + i] * cbr.c[i])), 6) AS t
         |  FROM v CROSS JOIN cbr WHERE v.vec_id < 8),
         |trl AS (SELECT q_id, list(t ORDER BY mi, j) AS t FROM trq GROUP BY 1),
         |qcr AS (
         |  SELECT v.vec_id AS q_id, cc.cell,
         |         round(list_sum(list_transform(range(1, ${EmbDim + 1}),
         |               i -> v.emb[i] * cc.c[i])), 6) AS qc
         |  FROM v CROSS JOIN c$KmeansIters cc WHERE v.vec_id < 8),
         |nres AS (
         |  SELECT cc.cell, cbr.mi, cbr.j,
         |         round(list_sum(list_transform(range(1, ${subR + 1}),
         |           i -> (cc.c[cbr.mi * $subR + i] + cbr.c[i])
         |              * (cc.c[cbr.mi * $subR + i] + cbr.c[i]))), 6) AS n2
         |  FROM c$KmeansIters cc CROSS JOIN cbr),
         |nresl AS (SELECT cell, list(n2 ORDER BY mi, j) AS n2
         |          FROM nres GROUP BY 1),
         |tq AS (
         |  SELECT v.vec_id AS q_id, cb.mi, cb.j,
         |         round(list_sum(list_transform(range(1, ${sub + 1}),
         |               i -> v.emb[cb.mi * $sub + i] * cb.c[i])), 6) AS t
         |  FROM v CROSS JOIN cb WHERE v.vec_id < 8),
         |tl AS (SELECT q_id, list(t ORDER BY mi, j) AS t FROM tq GROUP BY 1),
         |qn AS (SELECT vec_id AS q_id,
         |              round(sqrt(list_sum(list_transform(emb, x -> x*x))), 6) AS qnorm
         |       FROM v WHERE vec_id < 8),
         |pqs AS (
         |  SELECT q_id, vec_id,
         |         CASE WHEN cn > 0 AND qnorm > 0
         |              THEN adc / (qnorm * sqrt(cn)) ELSE -2.0 END AS cos
         |  FROM (
         |    SELECT tl.q_id, cd.vec_id, qn.qnorm,
         |           (${adcTerms("tl.t", "cd.codes")}) AS adc,
         |           (${adcTerms("nlit.n2", "cd.codes")}) AS cn
         |    FROM pcodes cd
         |    CROSS JOIN tl
         |    JOIN qn ON qn.q_id = tl.q_id
         |    CROSS JOIN nlit
         |    WHERE cd.vec_id <> tl.q_id)),
         |bs AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         |         ${cosineSql("q.embedding", "c.embedding")} AS cos
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8),
         |bt AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
         |    FROM bs) WHERE rank <= 5),
         |pqtop AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
         |    FROM pqs) WHERE rank <= 5),
         |qprobe AS (
         |  SELECT vec_id, cell, rn FROM (
         |    SELECT v.vec_id, cc.cell,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             list_sum(list_transform(cc.c, x -> x*x))
         |             - 2 * list_sum(list_transform(range(1, ${EmbDim + 1}),
         |                              i -> v.emb[i] * cc.c[i])),
         |             cc.cell) AS rn
         |    FROM v CROSS JOIN c$KmeansIters cc WHERE v.vec_id < 8)
         |  WHERE rn <= 2),
         |lv AS (SELECT unnest([1, 2]) AS n_probe),
         |icand AS (
         |  SELECT l.n_probe, qp.vec_id AS q_id, cc.vec_id AS vec_id
         |  FROM lv l JOIN qprobe qp ON qp.rn <= l.n_probe
         |  JOIN cells cc ON cc.cell = qp.cell AND cc.vec_id <> qp.vec_id),
         |ins AS (SELECT n_probe, q_id, CAST(count(*) AS BIGINT) AS n_scored
         |        FROM icand GROUP BY 1, 2),
         |itop AS (
         |  SELECT n_probe, q_id, vec_id FROM (
         |    SELECT ic.n_probe, ps.q_id, ps.vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY ic.n_probe, ps.q_id
         |             ORDER BY round(ps.cos, 6) DESC, ps.vec_id ASC) AS rank
         |    FROM icand ic JOIN pqs ps
         |      ON ps.q_id = ic.q_id AND ps.vec_id = ic.vec_id)
         |  WHERE rank <= 5),
         |rpqs AS (
         |  SELECT n_probe, q_id, vec_id,
         |         CASE WHEN cn > 0 AND qnorm > 0
         |              THEN s / (qnorm * sqrt(cn)) ELSE -2.0 END AS cos
         |  FROM (
         |    SELECT ic.n_probe, ic.q_id, ic.vec_id, qn.qnorm,
         |           (qcr.qc + (${adcTermsR("trl.t", "rc.codes")})) AS s,
         |           (${adcTermsR("nl.n2", "rc.codes")}) AS cn
         |    FROM icand ic
         |    JOIN rcodes rc ON rc.vec_id = ic.vec_id
         |    JOIN nresl nl ON nl.cell = rc.cell
         |    JOIN trl ON trl.q_id = ic.q_id
         |    JOIN qn ON qn.q_id = ic.q_id
         |    JOIN qcr ON qcr.q_id = ic.q_id AND qcr.cell = rc.cell)),
         |ritop AS (
         |  SELECT n_probe, q_id, vec_id FROM (
         |    SELECT n_probe, q_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY n_probe, q_id
         |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
         |    FROM rpqs) WHERE rank <= 5),
         |rih AS (SELECT ritop.n_probe, bt.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |        FROM bt JOIN ritop USING (q_id, vec_id) GROUP BY 1, 2),
         |i8 AS (
         |  SELECT vec_id, amax,
         |         list_transform(emb, x -> floor(x * (127.0 / amax) + 0.5)) AS q
         |  FROM (SELECT vec_id, emb,
         |               list_max(list_transform(emb, x -> abs(x))) AS amax
         |        FROM v)
         |  WHERE amax > 0.0),
         |i8s AS (
         |  SELECT qq.vec_id AS q_id, c.vec_id AS vec_id,
         |         list_sum(list_transform(range(1, ${EmbDim + 1}),
         |           i -> qq.q[i] * c.q[i]))
         |           * (qq.amax / 127.0) * (c.amax / 127.0) AS qcos
         |  FROM i8 qq JOIN i8 c ON c.vec_id <> qq.vec_id
         |  WHERE qq.vec_id < 8),
         |i8top AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |             ORDER BY round(qcos, 6) DESC, vec_id ASC) AS rank
         |    FROM i8s) WHERE rank <= 5),
         |i8h AS (SELECT bt.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |        FROM bt JOIN i8top USING (q_id, vec_id) GROUP BY 1),
         |i8n AS (SELECT CAST(count(*) AS BIGINT) - 1 AS n FROM i8),
         |tcnt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth
         |         FROM bt GROUP BY 1),
         |ph AS (SELECT bt.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |       FROM bt JOIN pqtop USING (q_id, vec_id) GROUP BY 1),
         |ih AS (SELECT itop.n_probe, bt.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |       FROM bt JOIN itop USING (q_id, vec_id) GROUP BY 1, 2),
         |ntot AS (SELECT CAST(count(*) AS BIGINT) - 1 AS n FROM embeddings)
         |SELECT 'float' AS variant, t.q_id, t.n_truth, t.n_truth AS n_hit,
         |       round(t.n_truth / CAST(t.n_truth AS DOUBLE), 4) AS recall,
         |       ntot.n AS n_scored
         |FROM tcnt t CROSS JOIN ntot
         |UNION ALL
         |SELECT 'int8', t.q_id, t.n_truth,
         |       CAST(coalesce(i8h.n_hit, 0) AS BIGINT),
         |       round(coalesce(i8h.n_hit, 0) / CAST(t.n_truth AS DOUBLE), 4),
         |       i8n.n
         |FROM tcnt t LEFT JOIN i8h USING (q_id) CROSS JOIN i8n
         |UNION ALL
         |SELECT 'pq', t.q_id, t.n_truth,
         |       CAST(coalesce(ph.n_hit, 0) AS BIGINT),
         |       round(coalesce(ph.n_hit, 0) / CAST(t.n_truth AS DOUBLE), 4),
         |       ntot.n
         |FROM tcnt t LEFT JOIN ph USING (q_id) CROSS JOIN ntot
         |UNION ALL
         |SELECT 'ivfpq_p' || CAST(l.n_probe AS VARCHAR), t.q_id, t.n_truth,
         |       CAST(coalesce(ih.n_hit, 0) AS BIGINT),
         |       round(coalesce(ih.n_hit, 0) / CAST(t.n_truth AS DOUBLE), 4),
         |       coalesce(ins.n_scored, 0)
         |FROM lv l CROSS JOIN tcnt t
         |LEFT JOIN ih ON ih.n_probe = l.n_probe AND ih.q_id = t.q_id
         |LEFT JOIN ins ON ins.n_probe = l.n_probe AND ins.q_id = t.q_id
         |UNION ALL
         |SELECT 'ivfpq_res_p' || CAST(l.n_probe AS VARCHAR), t.q_id, t.n_truth,
         |       CAST(coalesce(rih.n_hit, 0) AS BIGINT),
         |       round(coalesce(rih.n_hit, 0) / CAST(t.n_truth AS DOUBLE), 4),
         |       coalesce(ins.n_scored, 0)
         |FROM lv l CROSS JOIN tcnt t
         |LEFT JOIN rih ON rih.n_probe = l.n_probe AND rih.q_id = t.q_id
         |LEFT JOIN ins ON ins.n_probe = l.n_probe AND ins.q_id = t.q_id""".stripMargin
  }

  /** k-means parameters for q32/q33, mirrored in the oracle replay. */
  val KmeansK = 4
  val KmeansIters = 2

  /** q136's near-dup cosine threshold (q32's candidate bar), mirrored in
    * the oracle.
    */
  private val SemDedupThreshold = 0.35

  /** q133's component count. */
  val PcaK = 4

  /** q133's fitted PCA basis, published by the query run for the oracle
    * builder (the learnedBpeMerges contract).
    */
  @volatile private[graft] var learnedPcaModel: Option[operators.Similarity.PcaModel] = None
  private val KmeansTrainN = operators.Similarity.DefaultTrainN
  private val EmbDim = 64

  // ---------------------------------------------------------------------
  // DuckDB oracles — same math, same names, same rounding.
  // ---------------------------------------------------------------------

  /** Shared CTE chain mirroring [[Solar]] stage for stage. */
  private val solarCtes: String =
    """WITH module_agg AS (
      |  SELECT CAST(floor(epoch(ts)/30)*30 AS BIGINT) AS w_start,
      |         event_type AS panel, CAST(user_id AS VARCHAR) AS module,
      |         count(*) AS m_cnt, sum(value) AS m_sum_power,
      |         round(avg(value), 1) AS m_avg_power
      |  FROM events GROUP BY 1, 2, 3),
      |panel_agg AS (
      |  SELECT w_start, panel, count(*) AS p_cnt,
      |         sum(m_sum_power) AS p_sum_power,
      |         round(avg(m_sum_power), 1) AS p_avg_power
      |  FROM module_agg GROUP BY 1, 2),
      |j1 AS (
      |  SELECT m.w_start, m.panel, m.module, m.m_cnt, m.m_sum_power,
      |         m.m_avg_power, p.p_cnt, p.p_sum_power, p.p_avg_power
      |  FROM module_agg m JOIN panel_agg p
      |    ON m.w_start = p.w_start AND m.panel = p.panel),
      |panel_final AS (
      |  SELECT w_start, panel, count(*) AS p_cnt,
      |         max(p_sum_power) AS p_sum_power, max(p_avg_power) AS p_avg_power,
      |         sum(pow(m_sum_power - p_avg_power, 2)) AS squares_sum
      |  FROM j1 GROUP BY 1, 2),
      |panel_final2 AS (
      |  SELECT *, squares_sum / p_cnt AS variance,
      |         round(sqrt(squares_sum / p_cnt), 1) AS deviance
      |  FROM panel_final),
      |j2 AS (
      |  SELECT m.w_start, m.panel, m.module, m.m_cnt, m.m_sum_power,
      |         m.m_avg_power, p.p_cnt, p.p_sum_power, p.p_avg_power,
      |         p.squares_sum, p.variance, p.deviance
      |  FROM module_agg m JOIN panel_final2 p
      |    ON m.w_start = p.w_start AND m.panel = p.panel)
      |""".stripMargin

  /** Shared document CTEs: tokenization and word-3-gram shingles, mirroring
    * [[TextAnalysis.tokens]] / [[Dedup.shingles]]. DuckDB `range(a, b)` is
    * end-exclusive and empty when b <= a, matching the Spark `when` guard.
    */
  private val docCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks,
      |         string_split(lower(text), ' ') AS ltoks
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
      |  FROM toks)
      |""".stripMargin

  /** Normalized-text fingerprint, mirroring [[TextAnalysis.normalized]]
    * (DuckDB regexp_replace needs the explicit 'g' flag to match Spark's
    * global-by-default behavior).
    */
  private val fpSql =
    "md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))"

  /** SQL array literal for a stopword dictionary. */
  private def dictSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def stopCountSql(toksExpr: String, dict: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> list_contains(${dictSql(dict)}, t)))"

  /** Per-language score select-list + argmax CASE, shared by every oracle
    * that replays [[TextAnalysis.predLang]] (q17/q47/q53/q54/q60).
    */
  private lazy val langScoreSqls: Seq[String] =
    TextAnalysis.StopwordDicts.map { case (l, d) =>
      s"${stopCountSql("ltoks", d)} AS score_$l"
    }

  /** The q124 data-card replay parameterized over its source relation —
    * q124 runs it over `documents`; q130 runs the IDENTICAL chain over
    * the merged-corpus CTE, so the two gates can never drift apart.
    * Emits the CTE body only (caller prepends `WITH ` / prior CTEs).
    */
  private def datacardOracleBody(src: String): String = {
    val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
    val thr = graft.operators.QualityModel.HeuristicLabelThreshold
    s"""dc_toks AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks,
       |         string_split(lower(text), ' ') AS ltoks
       |  FROM $src),
       |dc_scored AS (SELECT doc_id, ${langScoreSqls.mkString(", ")} FROM dc_toks),
       |dc_pl AS (SELECT doc_id, $predLangCaseSql AS pred_lang FROM dc_scored),
       |dc_enr AS (
       |  SELECT doc_id, source, len(toks) AS n_words,
       |         round(0.4 * least(len(toks) / 100.0, 1.0)
       |             + 0.3 * (1.0 - len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
       |                            / NULLIF(length(text), 0))
       |             + 0.3 * least($stop / len(toks) * 5.0, 1.0), 4) AS quality,
       |         ('0x' || substr($fpSql, 1, 15))::BIGINT AS fp64
       |  FROM (SELECT d.doc_id, d.source, d.text, t.toks, t.ltoks
       |        FROM $src d JOIN dc_toks t USING (doc_id))),
       |dc_dup AS (SELECT fp64 FROM dc_enr GROUP BY 1 HAVING count(*) > 1),
       |dc_b AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(n_words) AS BIGINT) AS n_tokens,
       |         CAST(sum(CASE WHEN fp64 IN (SELECT fp64 FROM dc_dup)
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       |         CAST(sum(CASE WHEN quality >= ${thr}e0 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_hi_quality
       |  FROM dc_enr GROUP BY 1),
       |dc_lc AS (SELECT e.source, p.pred_lang, count(*) AS lc
       |          FROM dc_enr e JOIN dc_pl p USING (doc_id) GROUP BY 1, 2),
       |dc_lm AS (SELECT source, max(lc) AS mc FROM dc_lc GROUP BY 1),
       |dc_tl AS (SELECT dc_lc.source, dc_lm.mc, min(pred_lang) AS top_lang
       |          FROM dc_lc JOIN dc_lm ON dc_lc.source = dc_lm.source
       |                                AND dc_lc.lc = dc_lm.mc
       |          GROUP BY 1, 2)
       |SELECT dc_b.source, dc_b.n_docs, dc_b.n_tokens,
       |       round(dc_b.n_tokens / CAST(dc_b.n_docs AS DOUBLE), 4)
       |         AS mean_doc_tokens,
       |       dc_b.n_dup_docs,
       |       round(dc_b.n_dup_docs / CAST(dc_b.n_docs AS DOUBLE), 4) AS pct_dup,
       |       dc_b.n_hi_quality,
       |       round(dc_b.n_hi_quality / CAST(dc_b.n_docs AS DOUBLE), 4)
       |         AS pct_hi_quality,
       |       dc_tl.top_lang,
       |       round(dc_tl.mc / CAST(dc_b.n_docs AS DOUBLE), 4) AS top_lang_share
       |FROM dc_b JOIN dc_tl USING (source)""".stripMargin
  }
  /** The q130 ingestion-chain replay, shared VERBATIM by q137 (the
    * steady-state artifact path must reproduce the bootstrap chain's
    * cards bit-for-bit): incoming from the raw table (q110's hash gate
    * already proves the WARC round trip is lossless), q53's curation
    * fragment, the merge's ROW semantics, and the exact q124 card body
    * over the merged corpus.
    */
  private lazy val ingestChainOracleSql: String = {
    val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
    s"""WITH inc0 AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 20 = 0 THEN text || ' recrawled'
       |              ELSE text END AS text,
       |         lang, source
       |  FROM documents WHERE doc_id % 2 = 0),
       |ct AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks,
       |         string_split(lower(text), ' ') AS ltoks
       |  FROM inc0),
       |cenr0 AS (
       |  SELECT doc_id, length(text) AS n_chars_m, len(toks) AS n_words,
       |         len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
       |         $stop AS n_stop,
       |         ${langScoreSqls.mkString(",\n         ")},
       |         (('0x' || substr($fpSql, 1, 15))::BIGINT) AS fp64
       |  FROM ct),
       |cenr AS (
       |  SELECT doc_id, fp64,
       |         round(0.4 * least(n_words / 100.0, 1.0)
       |             + 0.3 * (1.0 - n_punct / NULLIF(n_chars_m, 0))
       |             + 0.3 * least(n_stop / n_words * 5.0, 1.0), 4) AS quality,
       |         $predLangCaseSql AS pred_lang
       |  FROM cenr0),
       |ckept AS (
       |  SELECT doc_id, pred_lang, quality,
       |         min(doc_id) OVER (PARTITION BY fp64) AS keep_id
       |  FROM cenr),
       |cur AS (
       |  SELECT i.doc_id, i.text, i.lang, i.source
       |  FROM inc0 i JOIN ckept k USING (doc_id)
       |  WHERE k.doc_id = k.keep_id AND k.pred_lang = 'en'
       |    AND k.quality >= 0.5),
       |ex AS (
       |  SELECT doc_id, text, lang, source FROM documents
       |  WHERE doc_id % 5 <> 4),
       |merged AS (
       |  SELECT doc_id, text, source FROM cur
       |  UNION ALL
       |  SELECT doc_id, text, source FROM ex
       |  WHERE doc_id NOT IN (SELECT doc_id FROM cur)),
       |""".stripMargin + datacardOracleBody("merged")
  }

  private lazy val predLangCaseSql: String = {
    val langs = TextAnalysis.StopwordDicts.map(_._1)
    val m = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    langs.map(l => s"WHEN score_$l = $m AND $m > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
  }

  /** MinHash signature + LSH band CTEs mirroring [[Dedup.minhashSignature]]
    * / [[Dedup.lshBands]] (bands unrolled as a UNION ALL).
    */
  private val lshCtes: String = {
    val bandSelects = (0 until Dedup.LshBands).map { b =>
      val idx = (1 to Dedup.LshRows).map(r => s"sig[${b * Dedup.LshRows + r}]")
      s"SELECT doc_id, $b AS band_idx, md5(${idx.mkString(" || '|' || ")}) AS band_hash FROM sig"
    }
    // bands mirrors Dedup.lshCandidates' maxBucket cap: buckets larger than
    // the cap are dropped in BOTH engines (without the QUALIFY, a bucket
    // over the cap at a larger SF would silently diverge the gate)
    s"""sig AS (
       |  SELECT doc_id, list_transform(range(0, ${Dedup.MinhashK}),
       |           j -> list_min(list_transform(sh, s -> md5(j::VARCHAR || '|' || s)))) AS sig
       |  FROM sh WHERE len(sh) > 0),
       |bands_raw AS (
       |${bandSelects.mkString("  ", "\n  UNION ALL ", "")}),
       |bands AS (
       |  SELECT doc_id, band_idx, band_hash FROM bands_raw
       |  QUALIFY count(*) OVER (PARTITION BY band_idx, band_hash) <= ${Dedup.DefaultMaxBucket}),
       |""".stripMargin
  }

  /** Exact-Jaccard SQL over two distinct-shingle list expressions,
    * mirroring [[Dedup.jaccard]] (list_intersect, like array_intersect,
    * dedups — inputs are distinct already).
    */
  private def jaccardSql(a: String, b: String): String = {
    val inter = s"len(list_intersect($a, $b))"
    s"round($inter / (len($a) + len($b) - $inter), 4)"
  }

  /** 16-bit SimHash SQL mirroring [[Dedup.simhash]]: per-token 16-bit hash
    * from the first 4 md5 hex digits, sign-of-votes per bit.
    */
  private val simhashCtes: String = {
    val bits = (0 until Dedup.SimhashBits).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $j) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }
    s"""hashes AS (
       |  SELECT doc_id, list_transform(ltoks,
       |           t -> (('0x' || substr(md5(t), 1, 4))::INT)) AS hs
       |  FROM toks WHERE len(ltoks) > 0),
       |simhash_t AS (
       |  SELECT doc_id, CAST(${bits.mkString(" + ")} AS BIGINT) AS simhash
       |  FROM hashes),
       |""".stripMargin
  }

  /** DuckDB replay of [[Similarity.kmeansCells]] (k = [[KmeansK]], iters =
    * [[KmeansIters]], training sample = the [[KmeansTrainN]] lowest
    * vec_ids), one CTE pair (assign, means) per Lloyd iteration over the
    * `vt` sample, then one final full-corpus assignment ending in
    * `cells(vec_id, cell)`.
    *
    * Bit-reproducibility: the assignment distance `|c|² − 2·(emb·c)` uses
    * the same sequential left-to-right folds on both engines (the q15/q16
    * gates already prove list_sum(list_transform(...)) ≡ VectorDot), and
    * centroid means are computed as a sequential fold over SORTED values in
    * both engines (list_sum(list_sort(list(v))) here ≡ aggregate(array_sort
    * (collect_list(v))) in Spark) — the pre-rounding doubles are therefore
    * bit-identical, and the round(·, 6) is belt-and-braces rather than the
    * sole defense against partial-sum ordering. The mean's divisor is
    * count(emb[pos]) — null-skipping, exactly like Spark's
    * size(collect_list) — though both engines also assume non-NULL
    * embedding elements (a NULL would diverge the sorted folds first).
    * Assumes every cell stays non-empty during training (holds for the
    * seeded testdata; Spark's getOrElse fallback has no SQL twin here).
    */
  private def kmeansCtes: String = {
    def assign(name: String, src: String, c: String) =
      s"""$name AS (
         |  SELECT vec_id, emb, cell FROM (
         |    SELECT v.vec_id, v.emb, cc.cell,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             list_sum(list_transform(cc.c, x -> x*x))
         |             - 2 * list_sum(list_transform(range(1, ${EmbDim + 1}),
         |                              i -> v.emb[i] * cc.c[i])),
         |             cc.cell) AS rn
         |    FROM $src v CROSS JOIN $c cc) WHERE rn = 1)""".stripMargin
    def means(name: String, a: String) =
      s"""$name AS (
         |  SELECT cell, list(m ORDER BY pos) AS c FROM (
         |    SELECT a.cell, p.pos,
         |           round(list_sum(list_sort(list(a.emb[p.pos]))) / count(a.emb[p.pos]), 6) AS m
         |    FROM $a a CROSS JOIN (SELECT unnest(range(1, ${EmbDim + 1})) AS pos) p
         |    GROUP BY a.cell, p.pos)
         |  GROUP BY cell)""".stripMargin
    val iterCtes = (1 to KmeansIters).flatMap(i => Seq(
      assign(s"a$i", "vt", if (i == 1) "c0" else s"c${i - 1}"),
      means(s"c$i", s"a$i")))
    (Seq(
      s"""v AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
         |  FROM embeddings)""".stripMargin,
      s"""vt AS (
         |  SELECT vec_id, emb FROM v ORDER BY vec_id LIMIT $KmeansTrainN)""".stripMargin,
      s"""c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS c
         |  FROM (SELECT vec_id, emb FROM vt ORDER BY vec_id LIMIT $KmeansK))""".stripMargin)
      ++ iterCtes
      :+ assign("cells_a", "v", s"c$KmeansIters")
      :+ "cells AS (SELECT vec_id, cell FROM cells_a)")
      .mkString("WITH ", ",\n", "\n")
  }

  /** 64-bit SimHash SQL mirroring [[Dedup.simhash]] / [[graft.functions
    * .SimHash64]]: the per-token 64-bit md5 prefix is carried as two 32-bit
    * halves (`('0x' || substr(md5(t),1,8))::BIGINT` = bits 63..32,
    * `substr(..,9,8)` = bits 31..0) because a full 16-hex-digit literal can
    * overflow signed BIGINT; bit j of the fingerprint reads the matching
    * half. The bit-63 weight (−2^63) makes DuckDB promote the sum to
    * HUGEINT, so the outer CAST back to BIGINT restores the two's-
    * complement long that Spark produces.
    */
  private val simhash64Ctes: String = {
    val bits = (0 until 64).map { j =>
      val src = if (j >= 32) s"h >> ${j - 32}" else s"h >> $j"
      val half = if (j >= 32) "hhi" else "hlo"
      s"(CASE WHEN list_sum(list_transform($half, h -> (($src) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }
    s"""hashes AS (
       |  SELECT doc_id,
       |         list_transform(ltoks, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hhi,
       |         list_transform(ltoks, t -> ('0x' || substr(md5(t), 9, 8))::BIGINT) AS hlo
       |  FROM toks WHERE len(ltoks) > 0),
       |simhash_t AS (
       |  SELECT doc_id, CAST(${bits.mkString(" + ")} AS BIGINT) AS simhash
       |  FROM hashes),
       |""".stripMargin
  }

  /** Double-precision cosine SQL over two float-list expressions (widened
    * to double), mirroring [[Similarity.cosine]].
    */
  /** The q52 connected-components oracle (recursive reachability +
    * min-label), shared by q93's savings histogram.
    */
  private lazy val clusterLabelsSql: String =
    docCtes.stripSuffix("\n").replaceFirst("WITH ", "WITH RECURSIVE ") + ",\n" + lshCtes +
      s"""cands AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh),
         |nd AS (
         |  SELECT id_a, id_b
         |  FROM cands JOIN shd a ON cands.id_a = a.doc_id
         |             JOIN shd b ON cands.id_b = b.doc_id
         |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM nd
         |  UNION ALL SELECT id_b, id_a FROM nd),
         |walk(id, reach) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach)
         |SELECT id AS doc_id, min(reach) AS cluster FROM walk GROUP BY id""".stripMargin

  /** q86's band CTEs: the q11/lshCtes construction with `source` carried
    * through so the corpus/incoming split can happen after banding.
    */
  private val incrementalBandsSql: String = {
    val bandSelects = (0 until Dedup.LshBands).map { b =>
      val idx = (1 to Dedup.LshRows).map(r => s"sig[${b * Dedup.LshRows + r}]")
      s"SELECT doc_id, source, $b AS band_idx, " +
        s"md5(${idx.mkString(" || '|' || ")}) AS band_hash FROM sig"
    }
    s"""toks AS (
       |  SELECT doc_id, text, source, string_split(text, ' ') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, source, list_transform(range(1, len(toks) - 1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id, source, list_transform(range(0, ${Dedup.MinhashK}),
       |           j -> list_min(list_transform(sh,
       |                  s -> md5(j::VARCHAR || '|' || s)))) AS sig
       |  FROM sh WHERE len(sh) > 0),
       |bands_raw AS (
       |${bandSelects.mkString("  ", "\n  UNION ALL ", "")}),
       |""".stripMargin
  }

  /** [[operators.Similarity.srpPlanes]] rendered as DuckDB VALUES rows —
    * the oracle scores against the exact constants the engine uses.
    */
  private def srpPlanesSql: String =
    operators.Similarity.srpPlanes.take(operators.Similarity.SrpBits)
      .zipWithIndex.map { case (pl, b) =>
        s"  ($b, [${pl.map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")}])"
      }.mkString(",\n")

  private def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($x) + 1), i -> ($x[i]::DOUBLE) * ($y[i]::DOUBLE)))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  private val moduleOutSql =
    "w_start, panel, module, m_cnt, round(m_sum_power, 4) AS m_sum_power, m_avg_power"
  private val panelFinalOutSql =
    "p_cnt, round(p_sum_power, 4) AS p_sum_power, p_avg_power, " +
      "round(squares_sum, 4) AS squares_sum, round(variance, 4) AS variance, deviance"

  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT event_id, event_type AS panel, CAST(user_id AS VARCHAR) AS module,
        |       value AS power
        |FROM events WHERE value > 50.0""".stripMargin,

    "q02_module_window_agg" ->
      (solarCtes + s"SELECT $moduleOutSql FROM module_agg"),

    "q03_panel_agg" ->
      (solarCtes + "SELECT w_start, panel, p_cnt, round(p_sum_power, 4) AS p_sum_power, " +
        "p_avg_power FROM panel_agg"),

    "q04_join_panel_module" ->
      (solarCtes + s"SELECT $moduleOutSql, p_cnt, round(p_sum_power, 4) AS p_sum_power, " +
        "p_avg_power FROM j1"),

    "q05_variance_deviance" ->
      (solarCtes + s"SELECT w_start, panel, $panelFinalOutSql FROM panel_final2"),

    "q06_join_module_panel" ->
      (solarCtes + s"SELECT $moduleOutSql, $panelFinalOutSql FROM j2"),

    "q07_anomaly_filter" ->
      (solarCtes + """SELECT w_start, panel, module,
        |       round(abs(m_sum_power - p_avg_power), 4) AS abs_diff, deviance
        |FROM j2 WHERE abs(m_sum_power - p_avg_power) > 1.0 * deviance""".stripMargin),

    "q08_flagship_anomalies" ->
      (solarCtes + s"SELECT $moduleOutSql, $panelFinalOutSql FROM j2 " +
        "WHERE abs(m_sum_power - p_avg_power) > 1.0 * deviance"),

    // to_json(struct(k)) omits null fields and emits '{}' — mirror that
    // instead of letting '||' string concat go NULL on a missing key
    "q09_json_roundtrip" ->
      """SELECT event_id, k,
        |       CASE WHEN k IS NULL THEN '{}' ELSE '{"k":' || k || '}' END AS props_json
        |FROM (SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |      FROM events)""".stripMargin,

    // grouped on the compact 60-bit key; n_fp = distinct full fingerprints
    // per group (collision check, expected 1)
    "q10_dedup_exact" ->
      s"""SELECT fp64, min(doc_id) AS keep_id, count(*) AS dup_cnt,
         |       count(DISTINCT fp) AS n_fp
         |FROM (SELECT doc_id, $fpSql AS fp,
         |        (('0x' || substr($fpSql, 1, 15))::BIGINT) AS fp64
         |      FROM documents) GROUP BY fp64""".stripMargin,

    "q11_dedup_minhash_lsh" ->
      (docCtes.stripSuffix("\n") + ",\n" + lshCtes +
        s"""cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id),
           |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh)
           |SELECT id_a, id_b, ${jaccardSql("a.dsh", "b.dsh")} AS jaccard
           |FROM cands JOIN shd a ON cands.id_a = a.doc_id
           |           JOIN shd b ON cands.id_b = b.doc_id
           |WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5""".stripMargin),

    "q12_dedup_simhash" ->
      (docCtes.stripSuffix("\n") + ",\n" + simhash64Ctes +
        """pairs AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          |  FROM simhash_t a JOIN simhash_t b
          |    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 25)
          |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin),

    // kept-shingle Jaccard: shingles with document frequency above the cap
    // are dropped from BOTH the intersection and the set sizes, mirroring
    // Dedup.windowedJaccardPairs' posting-list truncation
    "q13_dedup_ngram_jaccard" ->
      (docCtes.stripSuffix("\n") + ",\n" +
        s"""inv AS (
           |  SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh
           |  WHERE len(list_distinct(sh)) > 0),
           |kept AS (
           |  SELECT doc_id, s FROM inv
           |  QUALIFY count(*) OVER (PARTITION BY s) <= ${Dedup.DefaultMaxShingleDf}),
           |shd AS (
           |  SELECT doc_id, list(s) AS dsh FROM kept GROUP BY doc_id)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       ${jaccardSql("a.dsh", "b.dsh")} AS jaccard
           |FROM shd a JOIN shd b
           |  ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 25
           |WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.2""".stripMargin),

    "q14_dedup_embedding_cosine" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(${cosineSql("a.embedding", "b.embedding")}, 4) AS cos
         |FROM embeddings a JOIN embeddings b
         |  ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 25
         |WHERE round(${cosineSql("a.embedding", "b.embedding")}, 4) >= 0.35""".stripMargin,

    "q15_ann_topk_brute" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         |         ${cosineSql("q.embedding", "c.embedding")} AS cos
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY q_id
         |           ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, vec_id, CAST(rank AS INTEGER) AS rank, round(cos, 4) AS cos
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q16_ann_ivf_label" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         |         ${cosineSql("q.embedding", "c.embedding")} AS cos
         |  FROM embeddings q JOIN embeddings c
         |    ON c.label = q.label AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY q_id
         |           ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, vec_id, CAST(rank AS INTEGER) AS rank, round(cos, 4) AS cos
         |FROM ranked WHERE rank <= 5""".stripMargin,

    "q17_text_lang_id" -> {
      val langs = TextAnalysis.StopwordDicts.map(_._1)
      docCtes +
        s"""SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
           |       $predLangCaseSql AS pred_lang
           |FROM (SELECT doc_id, ${langScoreSqls.mkString(", ")} FROM toks)""".stripMargin
    },

    "q18_text_quality" -> {
      val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
      docCtes +
        s"""SELECT doc_id, n_chars_m, n_words, n_punct, n_stop,
           |       round(n_punct / NULLIF(n_chars_m, 0), 4) AS punct_ratio,
           |       round(n_stop / n_words, 4) AS stop_ratio,
           |       round(0.4 * least(n_words / 100.0, 1.0)
           |           + 0.3 * (1.0 - n_punct / NULLIF(n_chars_m, 0))
           |           + 0.3 * least(n_stop / n_words * 5.0, 1.0), 4) AS quality
           |FROM (SELECT doc_id, length(text) AS n_chars_m, len(toks) AS n_words,
           |        len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
           |        $stop AS n_stop
           |      FROM toks)""".stripMargin
    },

    "q19_token_count" ->
      (docCtes +
        s"""SELECT doc_id, len(toks) AS ws_tokens,
           |       len(regexp_extract_all(lower(text), '${TextAnalysis.TokenPattern}')) AS re_tokens
           |FROM toks""".stripMargin),

    "q20_text_fingerprint" ->
      s"""SELECT doc_id, $fpSql AS fp,
         |       (('0x' || substr($fpSql, 1, 15))::BIGINT) AS fp64
         |FROM documents""".stripMargin,

    "q21_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |       octet_length(text::BLOB) AS n_bytes,
        |       lower(substr(hex(text::BLOB), 1, 16)) AS header
        |FROM documents""".stripMargin,

    "q22_topk_revenue" ->
      """WITH rev AS (
        |  SELECT l_returnflag, l_orderkey,
        |         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |  FROM lineitem GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY revenue DESC, l_orderkey ASC) AS INTEGER) AS rank
        |  FROM rev)
        |SELECT l_returnflag, l_orderkey, revenue, rank FROM ranked WHERE rank <= 3""".stripMargin,

    "q23_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin,

    "q24_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_active FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY 1""".stripMargin,

    "q25_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q26_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,

    // each event belongs to exactly two 60s/30s windows: the 30s-aligned
    // bucket it falls in and the one before it
    "q27_sliding_window" ->
      """WITH expanded AS (
        |  SELECT event_type AS panel, value,
        |         unnest([CAST(floor(epoch(ts)/30)*30 AS BIGINT) - 30,
        |                 CAST(floor(epoch(ts)/30)*30 AS BIGINT)]) AS w_start
        |  FROM events)
        |SELECT w_start, panel, count(*) AS cnt, round(sum(value), 4) AS sum_power
        |FROM expanded GROUP BY 1, 2""".stripMargin,

    // gaps-and-islands: a new session starts when the per-user gap from the
    // previous event exceeds 1h; end = last event + gap (Spark semantics)
    "q28_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, value, epoch_us(ts) AS t,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
        |              >= 3600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sessions AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT min(t) AS s_start, max(t) + 3600000000 AS s_end, user_id,
        |       count(*) AS cnt, round(sum(value), 4) AS sum_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin,

    // q139: hourly buckets (epoch-aligned, like Spark's window()), the
    // per-user dense grid from range(), LOCF via IGNORE NULLS last_value
    "q139_gapfill_locf" ->
      """WITH b AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS b_start,
        |         round(avg(value), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(range(mn, mx + 3600, 3600)) AS b_start
        |  FROM (SELECT user_id, min(b_start) AS mn, max(b_start) AS mx
        |        FROM b GROUP BY 1)),
        |j AS (
        |  SELECT g.user_id, g.b_start, b.v
        |  FROM grid g LEFT JOIN b USING (user_id, b_start))
        |SELECT user_id, b_start,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |         ORDER BY b_start ROWS UNBOUNDED PRECEDING) AS v_filled,
        |       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM j""".stripMargin,

    "q29_quantiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        |       round(quantile_cont(l_discount, 0.5), 4) AS p50_disc
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q30_set_ops" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice <= 250000.0""".stripMargin,

    // hash-block bucketing (4 blocks of 16 bits): any pair with hamming <= 3
    // agrees exactly on >= 1 block — candidates are an equi-join. Arithmetic
    // >> then & mask reads the same 16 bits in both engines regardless of
    // the fingerprint's sign bit.
    "q31_dedup_simhash_bucketed" ->
      (docCtes.stripSuffix("\n") + ",\n" + simhash64Ctes +
        """blocks AS (
          |  SELECT doc_id, simhash, p.block_idx,
          |         (simhash >> (p.block_idx * 16)) & 65535 AS block_val
          |  FROM simhash_t CROSS JOIN (SELECT unnest(range(0, 4)) AS block_idx) p)
          |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          |FROM blocks a JOIN blocks b
          |  ON b.block_idx = a.block_idx AND b.block_val = a.block_val
          | AND b.doc_id > a.doc_id
          |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin),

    "q32_dedup_embedding_cells" ->
      (kmeansCtes.stripSuffix("\n") + ",\n" +
        s"""pairs AS (
           |  SELECT ca.vec_id AS id_a, cb.vec_id AS id_b,
           |         round(${cosineSql("a.embedding", "b.embedding")}, 4) AS cos
           |  FROM cells ca JOIN cells cb
           |    ON cb.cell = ca.cell AND cb.vec_id > ca.vec_id
           |  JOIN embeddings a ON a.vec_id = ca.vec_id
           |  JOIN embeddings b ON b.vec_id = cb.vec_id)
           |SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.35""".stripMargin),

    "q33_ann_ivf_kmeans" ->
      (kmeansCtes.stripSuffix("\n") + ",\n" +
        s"""scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           |         ${cosineSql("q.embedding", "c.embedding")} AS cos
           |  FROM embeddings q
           |  JOIN cells qc ON qc.vec_id = q.vec_id
           |  JOIN cells cc ON cc.cell = qc.cell
           |  JOIN embeddings c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |ranked AS (
           |  SELECT q_id, vec_id, cos,
           |         ROW_NUMBER() OVER (PARTITION BY q_id
           |           ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT q_id, vec_id, CAST(rank AS INTEGER) AS rank, round(cos, 4) AS cos
           |FROM ranked WHERE rank <= 5""".stripMargin),

    // exact quantiles checked exactly; the approx sketch is asserted
    // in-band (flags must be 1) — see Relational.approxQuantiles
    "q34_quantiles_approx" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        |       1 AS p50_ok, 1 AS p95_ok
        |FROM lineitem GROUP BY 1""".stripMargin,

    // mirrors AsOf.asOfJoin's union + ordered-window rewrite stage for
    // stage (same tie semantics: equal-time quotes visible, max q_id wins).
    // The payload travels as ONE struct through last_value, exactly like
    // the engine's struct-atomic `last(_p)` — per-column last_value would
    // mix fields from two quotes whenever a quote carries a NULL field
    // (ADVICE r3; testdata has no NULL values, but the oracle should
    // mirror the semantics, not rely on the data)
    "q35_asof_join" ->
      """WITH base AS (
        |  SELECT event_id, epoch_us(ts) AS t, user_id, value FROM events),
        |u AS (
        |  SELECT user_id, t, 1 AS side, NULL::BIGINT AS ord,
        |         event_id, round(value, 4) AS value,
        |         NULL::STRUCT(q_id BIGINT, q_value DOUBLE) AS qs
        |  FROM base WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT user_id, t, 0 AS side, event_id AS ord,
        |         NULL::BIGINT, NULL::DOUBLE,
        |         struct_pack(q_id := event_id, q_value := round(value, 4))
        |  FROM base WHERE event_id % 2 = 1),
        |j AS (
        |  SELECT event_id, user_id, t, value, side,
        |         last_value(qs IGNORE NULLS) OVER (PARTITION BY user_id
        |           ORDER BY t, side, ord ROWS UNBOUNDED PRECEDING) AS a_qs
        |  FROM u)
        |SELECT event_id, user_id, t, value, a_qs.q_id AS q_id, a_qs.q_value AS q_value
        |FROM j WHERE side = 1 AND a_qs.q_id IS NOT NULL""".stripMargin,

    // exact distinct counts checked exactly; HLL asserts in-band
    "q36_distinct_approx" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, 1 AS hll_ok
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q37_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q38_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice <= 250000.0""".stripMargin,

    "q39_range_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id
        | AND a.event_type = 'error' AND b.event_type = 'purchase'
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 3600000000""".stripMargin,

    // q140: the q39 interval join as LEFT OUTER — unmatched errors keep
    // one null-padded row; DuckDB's non-equi LEFT JOIN is the semantic
    // truth the inner+anti-join formulation must reproduce
    "q140_range_join_leftouter" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a LEFT JOIN events b
        |  ON b.user_id = a.user_id
        | AND b.event_type = 'purchase'
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 3600000000
        |WHERE a.event_type = 'error'""".stripMargin,

    // q141: RIGHT OUTER mirror — user_id must come from the kept (right)
    // side, since a is null on unmatched rows
    "q141_range_join_rightouter" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b, b.user_id,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a RIGHT JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'error'
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 3600000000
        |WHERE b.event_type = 'purchase'""".stripMargin,

    // q142: FULL OUTER — the type filters must live in subqueries (a
    // WHERE over a FULL JOIN would delete the null-padded rows)
    "q142_range_join_fullouter" ->
      """SELECT a.id_a, b.id_b, coalesce(a.user_id, b.user_id) AS user_id,
        |       b.t_b - a.t_a AS dt_us
        |FROM (SELECT event_id AS id_a, user_id, epoch_us(ts) AS t_a
        |      FROM events WHERE event_type = 'error') a
        |FULL JOIN (SELECT event_id AS id_b, user_id, epoch_us(ts) AS t_b
        |           FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND abs(b.t_b - a.t_a) <= 3600000000""".stripMargin,

    "q40_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 4) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    // pivot = conditional aggregation with a static value list
    "q41_pivot" ->
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_f,
        |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_o
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q42_global_topn" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders ORDER BY round(o_totalprice, 4) DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q43_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       coalesce(round(sum(o_totalprice), 4), 0.0) AS sum_price
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "q44_collect_csv" ->
      """SELECT o_custkey,
        |       string_agg(CAST(round(o_totalprice) AS BIGINT), ','
        |         ORDER BY CAST(round(o_totalprice) AS BIGINT)) AS prices_csv
        |FROM orders GROUP BY 1""".stripMargin,

    "q45_window_analytics" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
        |       round(sum(round(o_totalprice, 4)) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING), 4) AS running_total,
        |       coalesce(lag(round(o_totalprice, 4), 1) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderkey), 0.0) AS prev_price,
        |       CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INTEGER)
        |         AS quartile
        |FROM orders""".stripMargin,

    "q46_dates" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |       count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
        |FROM orders GROUP BY 1, 2""".stripMargin,

    // same simhash/lang/punct math as the DataFrame gates, reached through
    // the SQL surface (registered kernels)
    "q47_sql_surface" -> {
      docCtes.stripSuffix("\n") + ",\n" + simhashCtes +
        s"""scored AS (SELECT doc_id, ${langScoreSqls.mkString(", ")} FROM toks),
           |pl AS (SELECT doc_id, $predLangCaseSql AS pred_lang FROM scored),
           |pc AS (SELECT doc_id,
           |         len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct
           |       FROM toks)
           |SELECT s.doc_id, s.simhash, pl.pred_lang, pc.n_punct
           |FROM simhash_t s JOIN pl ON pl.doc_id = s.doc_id
           |                 JOIN pc ON pc.doc_id = s.doc_id""".stripMargin
    },

    "q48_top_tokens" ->
      """WITH toks2 AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |cnt AS (SELECT doc_id, tok, count(*) AS n FROM toks2 GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |  ORDER BY n DESC, tok ASC) AS INTEGER) AS rn FROM cnt)
        |SELECT doc_id, tok, n, rn FROM r WHERE rn <= 3""".stripMargin,

    "q49_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS t,
        |       count(*) OVER w AS n_trailing,
        |       round(sum(value) OVER w, 4) AS sum_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // minhash-LSH pairs (the q11 chain) as edges, then the connected-
    // component fixpoint as a recursive CTE: reach = transitive closure,
    // cluster = min reachable id — the same unique fixpoint the engine's
    // min-label propagation converges to
    "q52_dedup_clusters" -> clusterLabelsSql,

    // the q52 cluster labels wrapped in the size histogram; the recursive
    // CTE nests as a subquery
    "q93_dedup_savings" ->
      s"""SELECT sz AS cluster_size, count(*) AS n_clusters,
         |       CAST(sz * count(*) AS BIGINT) AS n_docs,
         |       CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
         |FROM (SELECT cluster, count(*) AS sz
         |      FROM ($clusterLabelsSql) GROUP BY 1)
         |GROUP BY sz""".stripMargin,

    // one-pass enrichment (quality + language + fingerprint), survivor
    // window over fp64, then the language/quality filters — mirrors
    // Curation.curate stage for stage
    "q53_curation_pipeline" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""enr0 AS (
           |  SELECT doc_id, length(text) AS n_chars_m, len(toks) AS n_words,
           |         len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
           |         ${stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)} AS n_stop,
           |         ${langScoreSqls.mkString(",\n         ")},
           |         (('0x' || substr($fpSql, 1, 15))::BIGINT) AS fp64
           |  FROM toks),
           |enr AS (
           |  SELECT doc_id, fp64, n_words,
           |         round(0.4 * least(n_words / 100.0, 1.0)
           |             + 0.3 * (1.0 - n_punct / NULLIF(n_chars_m, 0))
           |             + 0.3 * least(n_stop / n_words * 5.0, 1.0), 4) AS quality,
           |         $predLangCaseSql AS pred_lang
           |  FROM enr0),
           |kept AS (
           |  SELECT doc_id, pred_lang, quality, n_words,
           |         count(*) OVER (PARTITION BY fp64) AS dup_cnt,
           |         min(doc_id) OVER (PARTITION BY fp64) AS keep_id
           |  FROM enr)
           |SELECT doc_id, pred_lang, quality, n_words, dup_cnt
           |FROM kept WHERE doc_id = keep_id AND pred_lang = 'en' AND quality >= 0.5""".stripMargin
    },

    // md5-bucket sampling coin, per-language rate
    "q54_stratified_sample" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""scored AS (SELECT doc_id, ${langScoreSqls.mkString(", ")} FROM toks),
           |p AS (SELECT doc_id, $predLangCaseSql AS pred_lang FROM scored)
           |SELECT doc_id, pred_lang, bucket FROM (
           |  SELECT doc_id, pred_lang,
           |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 AS bucket
           |  FROM p)
           |WHERE bucket < CASE WHEN pred_lang = 'en' THEN 10 ELSE 50 END""".stripMargin
    },

    // element-wise / order-free math only (max, not sum), so every double
    // is bit-identical to the Spark side; floor(x+0.5) is the portable
    // half-up (round() tie behavior differs between engines)
    "q55_embedding_quantize" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
         |  FROM embeddings),
         |a AS (
         |  SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS amax
         |  FROM e),
         |qz AS (
         |  SELECT vec_id, emb, amax,
         |         list_transform(emb, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT)) AS q
         |  FROM a WHERE amax > 0.0),
         |err AS (
         |  SELECT vec_id, amax, q,
         |         list_max(list_transform(range(1, ${EmbDim + 1}),
         |           i -> abs(emb[i] - q[i] / (127.0 / amax)))) AS max_err
         |  FROM qz)
         |SELECT vec_id, round(amax, 6) AS amax, CAST(list_sum(q) AS BIGINT) AS q_sum,
         |       round(max_err, 6) AS max_err,
         |       CAST(max_err <= (0.5 + 1e-9) / (127.0 / amax) AS INT) AS err_ok
         |FROM err""".stripMargin,

    "q56_bag_set_ops" ->
      """WITH high AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0),
        |low AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice <= 250000.0),
        |ex AS (SELECT custkey, count(*) AS n_except
        |       FROM (SELECT * FROM high EXCEPT ALL SELECT * FROM low) GROUP BY 1),
        |ia AS (SELECT custkey, count(*) AS n_intersect
        |       FROM (SELECT * FROM high INTERSECT ALL SELECT * FROM low) GROUP BY 1)
        |SELECT coalesce(ex.custkey, ia.custkey) AS custkey,
        |       coalesce(n_except, 0) AS n_except,
        |       coalesce(n_intersect, 0) AS n_intersect
        |FROM ex FULL OUTER JOIN ia ON ex.custkey = ia.custkey""".stripMargin,

    "q57_correlated_subquery" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice,
        |  (SELECT c_mktsegment FROM customer c
        |   WHERE c.c_custkey = o.o_custkey) AS seg,
        |  CAST(EXISTS(SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 45) AS INT) AS has_bulk
        |FROM orders o""".stripMargin,

    // identical formula text over exact integer moments (see
    // Relational.statsAggregates) — the derived values are bit-identical
    // across engines; the native-implementation flags are asserted in-band
    "q58_stats_agg" ->
      """WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
        |         sum(l_quantity) AS sum_q,
        |         sum(l_quantity * l_quantity) AS sum_qq,
        |         sum(d) AS sum_d, sum(d * d) AS sum_dd,
        |         sum(l_quantity * d) AS sum_qd
        |  FROM (SELECT l_returnflag, l_quantity,
        |          CAST(CAST(round(l_discount * 100) AS BIGINT) AS DOUBLE) AS d
        |        FROM lineitem)
        |  GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  round(sqrt((n * sum_qq - sum_q * sum_q) / (n * (n - 1.0))), 6) AS sd_qty,
        |  round((n * sum_qd - sum_q * sum_d) /
        |        (sqrt(n * sum_qq - sum_q * sum_q) * sqrt(n * sum_dd - sum_d * sum_d)), 6)
        |    AS corr_qty_disc,
        |  1 AS sd_ok, 1 AS corr_ok
        |FROM m""".stripMargin,

    // replay of HistogramAgg's bucket math (floor division, last bucket
    // open, negatives clamped — n_words >= 1 here so no clamp case) with
    // zero buckets restored via a lang x bucket grid
    "q60_length_histogram" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""scored AS (SELECT doc_id, len(toks) AS n_words,
           |             ${langScoreSqls.mkString(", ")} FROM toks),
           |p AS (SELECT $predLangCaseSql AS pred_lang, n_words FROM scored),
           |b AS (SELECT pred_lang, least(n_words // 10, 7) AS bucket, count(*) AS cnt
           |      FROM p GROUP BY 1, 2),
           |grid AS (SELECT pred_lang, unnest(range(0, 8)) AS bucket
           |         FROM (SELECT DISTINCT pred_lang FROM p))
           |SELECT g.pred_lang, CAST(g.bucket AS INT) AS bucket,
           |       coalesce(b.cnt, 0) AS cnt
           |FROM grid g LEFT JOIN b
           |  ON b.pred_lang = g.pred_lang AND b.bucket = g.bucket""".stripMargin
    },

    "q61_rank_battery" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr,
        |       CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket_price,
        |       rank() OVER w AS rnk,
        |       dense_rank() OVER w AS drnk,
        |       round(percent_rank() OVER w, 6) AS prnk,
        |       round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY year(o_orderdate)
        |             ORDER BY CAST(floor(o_totalprice / 10000) AS BIGINT))""".stripMargin,

    "q62_fixed_sample" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""scored AS (SELECT doc_id, ${langScoreSqls.mkString(", ")} FROM toks),
           |p AS (SELECT doc_id, $predLangCaseSql AS pred_lang FROM scored),
           |r AS (SELECT doc_id, pred_lang,
           |        CAST(row_number() OVER (PARTITION BY pred_lang
           |          ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS INT) AS rn
           |      FROM p)
           |SELECT doc_id, pred_lang, rn FROM r WHERE rn <= 5""".stripMargin
    },

    // long form of the q41 pivot: the round trip must reproduce the
    // grouped aggregate. Spark unpivot RETAINS null measure cells
    // (verified empirically + RelationalSpec), so the UNION ALL branches
    // carry them too instead of filtering — no coincidental agreement on
    // all-combos-present data
    "q63_unpivot" ->
      """WITH pv AS (
        |  SELECT l_returnflag,
        |         round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_f,
        |         round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_o
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'F' AS l_linestatus, qty_f AS sum_qty FROM pv
        |UNION ALL
        |SELECT l_returnflag, 'O' AS l_linestatus, qty_o AS sum_qty FROM pv""".stripMargin,

    // identity oracle: the map layer must lose nothing
    "q64_map_roundtrip" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS price, o_custkey AS cust,
        |       'price,cust' AS keys_csv, 2 AS n_entries
        |FROM orders""".stripMargin,

    "q65_array_functions" ->
      """SELECT vec_id,
        |       len(list_filter(list_transform(embedding, x -> x::DOUBLE), x -> x > 0)) AS n_pos,
        |       CAST(len(list_filter(list_transform(embedding, x -> x::DOUBLE),
        |                            x -> abs(x) > 0.3)) > 0 AS INT) AS any_big,
        |       round(list_sum(list_transform(list_transform(embedding, x -> x::DOUBLE),
        |                                     x -> abs(x))), 4) AS l1_norm,
        |       round((list_transform(embedding, x -> x::DOUBLE))[1], 4) AS first_dim
        |FROM embeddings""".stripMargin,

    // the q60 histogram replay (same bucket math), flags literal 1 per
    // the CMS contract — the sketch itself has no SQL twin, its
    // guarantees are what the gate checks
    "q67_sql_aggregates" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""scored AS (SELECT doc_id, len(toks) AS n_words,
           |             ${langScoreSqls.mkString(", ")} FROM toks),
           |p AS (SELECT $predLangCaseSql AS pred_lang, n_words FROM scored),
           |b AS (SELECT pred_lang, least(n_words // 10, 7) AS bucket, count(*) AS cnt
           |      FROM p GROUP BY 1, 2),
           |grid AS (SELECT pred_lang, unnest(range(0, 8)) AS bucket
           |         FROM (SELECT DISTINCT pred_lang FROM p))
           |SELECT g.pred_lang, CAST(g.bucket AS INT) AS bucket,
           |       coalesce(b.cnt, 0) AS cnt,
           |       1 AS cms_lower_ok, 1 AS cms_upper_ok
           |FROM grid g LEFT JOIN b
           |  ON b.pred_lang = g.pred_lang AND b.bucket = g.bucket""".stripMargin
    },

    // closed-form replay of syntheticMedia's construction: the Spark side
    // must RECOVER these values by parsing the header bytes it built
    "q68_multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'png'
        |            WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS kind,
        |       CASE WHEN doc_id % 3 = 0 THEN 29
        |            WHEN doc_id % 3 = 1 THEN 39 ELSE 36 END AS n_bytes,
        |       CASE WHEN doc_id % 3 = 0 THEN 'png'
        |            WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 640 + 1
        |                 WHEN doc_id % 3 = 1 THEN doc_id % 1024 + 1
        |            END AS INT) AS width,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 480 + 1
        |                 WHEN doc_id % 3 = 1 THEN doc_id % 768 + 1
        |            END AS INT) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 2 THEN
        |              [8000, 16000, 22050, 44100, 48000][CAST(doc_id % 5 AS INT) + 1]
        |            END AS INT) AS sample_rate,
        |       CAST(CASE WHEN doc_id % 3 = 2 THEN 16 ELSE 8 END AS INT) AS bit_depth
        |FROM documents""".stripMargin,

    // gid replayed as a CASE over the aggregated-away keys (Spark
    // grouping_id: bit per grouping column, first = most significant;
    // the data has no NULL flag/status, so IS NULL means aggregated)
    "q72_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(CASE WHEN l_returnflag IS NOT NULL
        |                  AND l_linestatus IS NOT NULL THEN 0
        |                 WHEN l_returnflag IS NULL
        |                  AND l_linestatus IS NOT NULL THEN 2
        |                 ELSE 3 END AS BIGINT) AS gid,
        |       count(*) AS n_rows, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())""".stripMargin,

    // the quantization replay is q55's (floor(x*scale + 0.5), bit-exact
    // scales); the dot product is INTEGER-valued so list_sum is exact
    // under any order, and the rescale multiplies in the same association
    "q73_ann_quantized" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
         |  FROM embeddings),
         |a AS (
         |  SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS amax
         |  FROM e),
         |qz AS (
         |  SELECT vec_id, amax,
         |         list_transform(emb, x -> floor(x * (127.0 / amax) + 0.5)) AS q
         |  FROM a WHERE amax > 0.0),
         |sc AS (
         |  SELECT qq.vec_id AS q_id, c.vec_id AS vec_id,
         |         list_sum(list_transform(range(1, ${EmbDim + 1}),
         |           i -> qq.q[i] * c.q[i])) AS idot,
         |         qq.amax AS q_amax, c.amax AS amax
         |  FROM qz qq JOIN qz c ON c.vec_id <> qq.vec_id
         |  WHERE qq.vec_id < 8),
         |sc2 AS (
         |  SELECT q_id, vec_id, idot,
         |         idot * (q_amax / 127.0) * (amax / 127.0) AS qcos
         |  FROM sc),
         |r AS (
         |  SELECT q_id, vec_id, CAST(idot AS BIGINT) AS q_dot, qcos,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY round(qcos, 6) DESC, vec_id ASC) AS INT) AS rank
         |  FROM sc2)
         |SELECT q_id, vec_id, rank, q_dot, round(qcos, 4) AS qcos
         |FROM r WHERE rank <= 10""".stripMargin,

    // distinct-5-gram fingerprints both sides (same 60-bit md5-prefix
    // key as the Spark side), LEFT JOIN against the held-out split's
    // distinct grams, per-doc rollup; sub-n-word docs carry NULL frac
    "q74_contamination" ->
      """WITH lt AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS lt
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |         unnest(list_distinct(list_transform(range(1, len(lt) - 3),
        |           i -> lt[i] || ' ' || lt[i+1] || ' ' || lt[i+2] || ' ' ||
        |                lt[i+3] || ' ' || lt[i+4]))) AS g
        |  FROM lt),
        |gh AS (SELECT doc_id, source,
        |              ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
        |       FROM g),
        |bench AS (SELECT DISTINCT gh FROM gh WHERE source = 'src0'),
        |stats AS (
        |  SELECT t.doc_id, count(*) AS n_grams,
        |         CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_hit
        |  FROM gh t LEFT JOIN bench b ON b.gh = t.gh
        |  WHERE t.source <> 'src0'
        |  GROUP BY 1)
        |SELECT d.doc_id, coalesce(s.n_grams, 0) AS n_grams,
        |       coalesce(s.n_hit, 0) AS n_hit,
        |       CASE WHEN s.n_grams > 0
        |            THEN round(s.n_hit / CAST(s.n_grams AS DOUBLE), 4)
        |       END AS contam_frac,
        |       CAST(CASE WHEN s.n_grams > 0
        |                  AND round(s.n_hit / CAST(s.n_grams AS DOUBLE), 4)
        |                      >= 0.2
        |                 THEN 1 ELSE 0 END AS INT) AS flagged
        |FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
        |WHERE d.source <> 'src0'""".stripMargin,

    // the oracle replays withSyntheticPii's construction, then applies
    // the same ordered pattern list (counts on PRE-redaction text;
    // DuckDB regexp_replace needs the explicit 'g' flag)
    "q75_pii_redact" -> {
      val mk =
        """substr(text, 1, 40) || ' Reach U' || doc_id || '+Tag@Mail' ||
          |           (doc_id % 10) || '.OrG ssn ' ||
          |           lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
          |           lpad((doc_id % 100)::VARCHAR, 2, '0') || '-' ||
          |           lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
          |           ' ph 555' ||
          |           CASE WHEN doc_id % 2 = 0 THEN '-' ELSE '.' END ||
          |           lpad((doc_id % 1000)::VARCHAR, 3, '0') ||
          |           CASE WHEN doc_id % 2 = 0 THEN '-' ELSE '.' END ||
          |           lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
          |           ' cc 4' ||
          |           lpad((doc_id % 1000)::VARCHAR, 3, '0') ||
          |           CASE WHEN doc_id % 2 = 0 THEN ' ' ELSE '-' END ||
          |           lpad(((doc_id * 3) % 10000)::VARCHAR, 4, '0') ||
          |           CASE WHEN doc_id % 2 = 0 THEN ' ' ELSE '-' END ||
          |           lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') ||
          |           CASE WHEN doc_id % 2 = 0 THEN ' ' ELSE '-' END ||
          |           lpad(((doc_id * 9) % 10000)::VARCHAR, 4, '0') ||
          |           ' at 10.' || (doc_id % 256) || '.' ||
          |           ((doc_id * 7) % 256) || '.' ||
          |           ((doc_id * 13) % 256) || ' end'""".stripMargin
      val pats = TextAnalysis.PiiPatterns
      val red = pats.foldLeft("text") { case (e, (p, r)) =>
        s"regexp_replace($e, '$p', '$r', 'g')"
      }
      // each class counts at its chain point (earlier classes already
      // replaced) — mirrors TextAnalysis.redactPii exactly
      val counts = pats.zipWithIndex.map { case ((p, r), i) =>
        val prior = pats.take(i).foldLeft("text") { case (e, (pp, rr)) =>
          s"regexp_replace($e, '$pp', '$rr', 'g')"
        }
        val nm = "n_" + r.stripPrefix("<").stripSuffix(">").toLowerCase
        s"len(regexp_extract_all($prior, '$p')) AS $nm"
      }.mkString(",\n        |       ")
      s"""WITH s AS (
         |  SELECT doc_id, $mk AS text
         |  FROM documents)
         |SELECT doc_id, $red AS red_text,
         |       $counts
         |FROM s""".stripMargin
    },

    // DuckDB zips parallel unnests in one SELECT, giving the chunk
    // ordinal and text in lockstep; list_slice is end-inclusive so the
    // window is [i*32+1, (i+1)*32]
    "q76_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         unnest(range(0, CAST(ceil(len(toks) / 32.0) AS INT)))
        |           AS chunk_idx,
        |         unnest(list_transform(
        |           range(0, CAST(ceil(len(toks) / 32.0) AS INT)),
        |           i -> array_to_string(
        |                  list_slice(toks, i*32 + 1, (i+1)*32), ' ')))
        |           AS chunk_text
        |  FROM t)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_text,
        |       len(string_split(chunk_text, ' ')) AS n_tokens
        |FROM c""".stripMargin,

    // ONE window ordered by (block, doc_id) — the semantic spec the
    // engine's two-level packing (block-parallel sums + broadcast prefix
    // stitch) must reproduce bit-for-bit; ROWS ... 1 PRECEDING is the
    // exclusive running sum, coalesced to 0 for the first document
    "q77_sequence_packing" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT
        |           % ${Curation.DefaultPackBlocks} AS block
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |         CAST(coalesce(sum(n_tokens) OVER (
        |           PARTITION BY lang ORDER BY block, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, cum_before,
        |       CAST(floor(cum_before / 256.0) AS BIGINT) AS seq_id,
        |       cum_before % 256 AS offset,
        |       CAST(cum_before % 256 + n_tokens > 256 AS INT)
        |         AS spans_boundary
        |FROM c""".stripMargin,

    // sqrt(n_l) is IEEE-exact both engines; the share is rounded to 6
    // decimals before flooring so aggregation-order last-ulp jitter in
    // sum_sqrt cannot flip the floor; the hash-bucket coin is q54's.
    // True upsampling: floor(pct/100) copies + a coin for the remainder,
    // replayed via generate_series (empty when copies = 0)
    "q78_temperature_resample" ->
      """WITH byl AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        |tot AS (SELECT sum(sqrt(n_l)) AS sum_sqrt,
        |               CAST(sum(n_l) AS BIGINT) AS n_total
        |        FROM byl),
        |probs AS (
        |  SELECT lang, n_l,
        |         CAST(floor(round(
        |           100.0 * n_total / (sum_sqrt * sqrt(n_l)), 6)) AS INT)
        |           AS accept_pct
        |  FROM byl CROSS JOIN tot),
        |b AS (
        |  SELECT d.doc_id, d.lang,
        |         ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 4))::INT % 100
        |           AS bucket,
        |         p.accept_pct, p.n_l
        |  FROM documents d JOIN probs p ON p.lang = d.lang),
        |c AS (
        |  SELECT *, accept_pct // 100 +
        |         CASE WHEN bucket < accept_pct % 100 THEN 1 ELSE 0 END
        |           AS copies
        |  FROM b),
        |u AS (
        |  SELECT doc_id, lang, bucket, accept_pct, n_l,
        |         unnest(generate_series(1, copies)) AS ci
        |  FROM c WHERE copies >= 1)
        |SELECT doc_id, lang, bucket, accept_pct, n_l,
        |       CAST(ci AS INT) AS copy_idx
        |FROM u""".stripMargin,

    // strided windows: starts every 24 tokens carrying 32, count =
    // 1 + ceil((len-32)/24) for len > 32 (no pure-suffix trailing
    // window), 1 otherwise; list_slice is end-inclusive so window i is
    // [i*24+1, i*24+32]
    "q79_chunking_strided" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |t2 AS (
        |  SELECT doc_id, toks,
        |         CASE WHEN len(toks) <= 32 THEN 1
        |              ELSE 1 + CAST(ceil((len(toks) - 32) / 24.0) AS INT)
        |         END AS nc
        |  FROM t),
        |c AS (
        |  SELECT doc_id,
        |         unnest(range(0, nc)) AS chunk_idx,
        |         unnest(list_transform(range(0, nc),
        |           i -> array_to_string(
        |                  list_slice(toks, i*24 + 1, i*24 + 32), ' ')))
        |           AS chunk_text
        |  FROM t2)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_text,
        |       len(string_split(chunk_text, ' ')) AS n_tokens
        |FROM c""".stripMargin,

    // same quality formula as q53 (established bit-exact), bucket totals
    // + descending prefix over the <=101-row bucket relation, running sum
    // confined to the boundary bucket — mirrors budgetStage branch for
    // branch (whole UNION ALL boundary)
    "q80_token_budget_select" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""enr0 AS (
           |  SELECT doc_id, length(text) AS n_chars_m, len(toks) AS n_words,
           |         len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
           |         ${stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)} AS n_stop
           |  FROM toks),
           |enr AS (
           |  SELECT doc_id, n_words AS n_tokens,
           |         round(0.4 * least(n_words / 100.0, 1.0)
           |             + 0.3 * (1.0 - n_punct / NULLIF(n_chars_m, 0))
           |             + 0.3 * least(n_stop / n_words * 5.0, 1.0), 4) AS q
           |  FROM enr0),
           |e2 AS (SELECT doc_id, n_tokens, q, CAST(floor(q * 100) AS INT) AS qb
           |       FROM enr WHERE q IS NOT NULL),
           |b AS (SELECT qb, CAST(sum(n_tokens) AS BIGINT) AS b_tokens
           |      FROM e2 GROUP BY 1),
           |bc AS (SELECT qb, b_tokens,
           |              CAST(coalesce(sum(b_tokens) OVER (ORDER BY qb DESC
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                AS BIGINT) AS cum_before
           |       FROM b),
           |j AS (SELECT e2.doc_id, e2.q, e2.qb, e2.n_tokens,
           |             bc.b_tokens, bc.cum_before
           |      FROM e2 JOIN bc ON bc.qb = e2.qb),
           |bnd AS (
           |  SELECT doc_id, q, qb, n_tokens FROM (
           |    SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY qb
           |      ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_in
           |    FROM j WHERE cum_before < 10000 AND cum_before + b_tokens > 10000)
           |  WHERE cum_before + cum_in + n_tokens <= 10000)
           |SELECT doc_id, q, qb, n_tokens FROM j
           |WHERE cum_before + b_tokens <= 10000
           |UNION ALL SELECT * FROM bnd""".stripMargin
    },

    // epoch-salted md5 priority. ONE rank ordered by (block, h, doc_id)
    // — the semantic spec the engine's two-level ranking (block-parallel
    // row_numbers + broadcast prefix-count stitch) must reproduce exactly
    "q81_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5('3|' || doc_id::VARCHAR) AS h FROM documents),
        |s AS (SELECT doc_id, h,
        |             ('0x' || substr(h, 1, 4))::INT % 8 AS shard,
        |             ('0x' || substr(h, 5, 4))::INT % 16 AS block FROM h)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |         ORDER BY block, h, doc_id) AS INT) AS pos
        |FROM s""".stripMargin,

    // chunk construction mirrors word_chunks(lower(text), 16); the df
    // window here is semantically the engine's groupBy+join occurrence
    // count over the SAME 60-bit fingerprint (DuckDB has no skew concern
    // at oracle scale); ordered string_agg replays the sorted-collect
    // reassembly, coalesced to '' when every chunk was boilerplate
    "q82_boilerplate_removal" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         unnest(range(0, CAST(ceil(len(toks) / 16.0) AS INT))) AS pos,
        |         unnest(list_transform(
        |           range(0, CAST(ceil(len(toks) / 16.0) AS INT)),
        |           i -> array_to_string(
        |                  list_slice(toks, i*16 + 1, (i+1)*16), ' ')))
        |           AS chunk
        |  FROM t),
        |d AS (
        |  SELECT doc_id, pos, chunk,
        |         count(*) OVER (PARTITION BY
        |           ('0x' || substr(md5(chunk), 1, 15))::BIGINT) AS df
        |  FROM c)
        |SELECT doc_id, count(*) AS n_chunks,
        |       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_removed,
        |       coalesce(string_agg(chunk, ' ' ORDER BY pos)
        |         FILTER (WHERE df <= 1), '') AS clean_text
        |FROM d GROUP BY 1""".stripMargin,

    // the exact semi-join bit is oracle-checked exactly; the bloom's
    // no-false-negative contract is the in-band flag (false positives
    // are allowed by the contract and rate-checked in the spec instead)
    "q69_bloom_join_filter" ->
      """SELECT c_custkey,
        |       CAST(EXISTS(SELECT 1 FROM orders o
        |                   WHERE o.o_custkey = c.c_custkey
        |                     AND o.o_totalprice > 300000.0) AS INT) AS is_member,
        |       1 AS no_false_neg
        |FROM customer c""".stripMargin,

    // bigram construction mirrors word_shingles(n=2) over the lowered
    // single-space tokens; docs with < 2 tokens carry NULL fraction
    "q70_repetition_signals" ->
      (docCtes.stripSuffix("\n") + ",\n" +
        """bg AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(ltoks)),
          |           i -> ltoks[i] || ' ' || ltoks[i+1])) AS b
          |  FROM toks WHERE len(ltoks) >= 2),
          |bgc AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
          |bga AS (SELECT doc_id, max(n) AS top_n,
          |               CAST(sum(n) AS BIGINT) AS total_bg
          |        FROM bgc GROUP BY 1)
          |SELECT t.doc_id, len(ltoks) AS n_words,
          |       round(1.0 - len(list_distinct(ltoks)) / len(ltoks), 4)
          |         AS dup_word_frac,
          |       round(bga.top_n / CAST(bga.total_bg AS DOUBLE), 4)
          |         AS top_bigram_frac
          |FROM toks t LEFT JOIN bga ON bga.doc_id = t.doc_id""".stripMargin),

    // same integer tf/df/N on both sides; the ln/division formula text is
    // identical and the rank orders by round(raw, 6) with a term
    // tie-break, the q15 pattern for cross-engine double ordering
    "q71_tfidf_topterms" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |         tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)) AS raw
        |  FROM tf JOIN df USING (tok) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, tok, tf, df, round(raw, 4) AS tfidf,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |           ORDER BY round(raw, 6) DESC, tok ASC) AS INT) AS rn
        |  FROM sc)
        |SELECT doc_id, tok, tf, df, tfidf, rn FROM r WHERE rn <= 3""".stripMargin,

    // exact top-k is oracle-checked exactly; the CMS flags assert the
    // sketch's never-underestimate / bounded-overestimate contract
    "q66_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS exact_cnt FROM t GROUP BY 1)
        |SELECT tok, exact_cnt, 1 AS lower_ok, 1 AS upper_ok
        |FROM c ORDER BY exact_cnt DESC, tok LIMIT 10""".stripMargin,

    // the oracle is the identity — encode->decode must lose nothing
    "q59_json_nested" ->
      """SELECT o_orderkey, o_custkey AS ck, round(o_totalprice, 4) AS tp,
        |       o_custkey AS arr1
        |FROM orders""".stripMargin,

    // same kmeans replay as q32/q33 plus a probe ranking: each query's top-2
    // cells by the same |c|^2 - 2*(emb.c) distance and (dist, cell) tie-break
    "q51_ann_ivf_multiprobe" ->
      (kmeansCtes.stripSuffix("\n") + ",\n" +
        s"""qprobe AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT v.vec_id, cc.cell,
           |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |             list_sum(list_transform(cc.c, x -> x*x))
           |             - 2 * list_sum(list_transform(range(1, ${EmbDim + 1}),
           |                              i -> v.emb[i] * cc.c[i])),
           |             cc.cell) AS rn
           |    FROM v CROSS JOIN c$KmeansIters cc WHERE v.vec_id < 8) WHERE rn <= 2),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           |         ${cosineSql("q.embedding", "c.embedding")} AS cos
           |  FROM embeddings q
           |  JOIN qprobe qp ON qp.vec_id = q.vec_id
           |  JOIN cells cc ON cc.cell = qp.cell
           |  JOIN embeddings c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT q_id, vec_id, cos,
           |         ROW_NUMBER() OVER (PARTITION BY q_id
           |           ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT q_id, vec_id, CAST(rank AS INTEGER) AS rank, round(cos, 4) AS cos
           |FROM ranked WHERE rank <= 5""".stripMargin),

    "q50_string_funcs" ->
      """SELECT doc_id,
        |       upper(substr(text, 1, 12)) AS head_upper,
        |       reverse(substr(text, 1, 8)) AS head_rev,
        |       length(replace(replace(replace(replace(replace(text,
        |         'a',''),'e',''),'i',''),'o',''),'u','')) AS n_consonant_chars,
        |       'doc' || '|' || doc_id || '|' || length(text) AS tagged,
        |       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id
        |FROM documents""".stripMargin,

    // span construction mirrors word_chunks(lower(text), 16, 8); DISTINCT
    // pairs replay the engine's first aggregate, so the df count(*) is a
    // document count on both sides
    "q83_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |t2 AS (
        |  SELECT doc_id, toks,
        |         CASE WHEN len(toks) <= 16 THEN 1
        |              ELSE 1 + CAST(ceil((len(toks) - 16) / 8.0) AS INT)
        |         END AS nc
        |  FROM t),
        |sp AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(0, nc),
        |           i -> array_to_string(
        |                  list_slice(toks, i*8 + 1, i*8 + 16), ' ')))
        |           AS span
        |  FROM t2),
        |p AS (SELECT DISTINCT doc_id,
        |        ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_fp
        |      FROM sp),
        |d AS (SELECT span_fp, count(*) AS span_df FROM p GROUP BY 1)
        |SELECT p.doc_id, count(*) AS n_spans,
        |       CAST(sum(CASE WHEN span_df > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS dup_spans,
        |       round(sum(CASE WHEN span_df > 1 THEN 1 ELSE 0 END)
        |             / count(*), 4) AS dup_frac,
        |       CAST(sum(CASE WHEN span_df > 1 THEN 1 ELSE 0 END)
        |            / count(*) <= 0.5 AS INT) AS keep
        |FROM p JOIN d USING (span_fp) GROUP BY 1""".stripMargin,

    // same tf/cnt/N/V integers on both sides; the Laplace-smoothed
    // -ln((cnt+1)/(N+V)) formula text is identical, outputs rounded at 4
    // (the q71 cross-engine double discipline)
    "q84_lm_perplexity" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id,
        |         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS tok_fp,
        |         count(*) AS k
        |       FROM tk GROUP BY 1, 2),
        |c AS (SELECT tok_fp, CAST(sum(k) AS BIGINT) AS cnt
        |      FROM tf GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS v FROM c)
        |SELECT tf.doc_id, CAST(sum(tf.k) AS BIGINT) AS n_tokens,
        |       round(sum(tf.k * -ln((c.cnt + 1)
        |                            / CAST(t.n + t.v AS DOUBLE)))
        |             / sum(tf.k), 4) AS avg_nll,
        |       round(exp(sum(tf.k * -ln((c.cnt + 1)
        |                                / CAST(t.n + t.v AS DOUBLE)))
        |                 / sum(tf.k)), 4) AS ppl
        |FROM tf JOIN c USING (tok_fp) CROSS JOIN t
        |GROUP BY 1""".stripMargin,

    // the plane literals are the SAME compile-time constants the engine
    // projects against (Similarity.srpPlanes); ±1 entries keep every
    // product a sign-flip of the float element, and both engines fold the
    // dot in index order, so each signature bit matches exactly
    "q85_srp_lsh" ->
      s"""WITH p AS (SELECT * FROM (VALUES
         |$srpPlanesSql) AS t(bit, pl)),
         |d AS (
         |  SELECT v.vec_id, p.bit,
         |         list_sum(list_transform(range(1, ${Similarity.SrpDim + 1}),
         |           i -> (v.embedding[i]::DOUBLE) * p.pl[i])) AS dt
         |  FROM embeddings v CROSS JOIN p),
         |bands AS (
         |  SELECT vec_id, bit // ${Similarity.SrpBits / Similarity.SrpBands}
         |           AS band_idx,
         |         CAST(sum(CASE WHEN dt >= 0 THEN 1 ELSE 0 END
         |           * (1 << (bit % ${Similarity.SrpBits / Similarity.SrpBands})))
         |           AS INTEGER) AS band_val
         |  FROM d GROUP BY 1, 2),
         |capped AS (
         |  SELECT vec_id, band_idx, band_val FROM bands
         |  QUALIFY count(*) OVER (PARTITION BY band_idx, band_val)
         |    <= ${Similarity.SrpMaxBucket}),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM capped a JOIN capped b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |   AND b.vec_id > a.vec_id)
         |SELECT id_a, id_b,
         |       round(${cosineSql("a.embedding", "b.embedding")}, 4) AS cos
         |FROM cand
         |JOIN embeddings a ON a.vec_id = cand.id_a
         |JOIN embeddings b ON b.vec_id = cand.id_b
         |WHERE round(${cosineSql("a.embedding", "b.embedding")}, 4) >= 0.35""".stripMargin,

    // corpus band index capped like lshStage (QUALIFY); the incoming batch
    // is never self-joined and the corpus never pairs with itself
    "q86_incremental_dedup" ->
      ("WITH " + incrementalBandsSql +
        s"""cb AS (
           |  SELECT doc_id, band_idx, band_hash FROM bands_raw
           |  WHERE source NOT IN ('src0', 'src1')
           |  QUALIFY count(*) OVER (PARTITION BY band_idx, band_hash)
           |    <= ${Dedup.DefaultMaxBucket}),
           |ib AS (SELECT doc_id, band_idx, band_hash FROM bands_raw
           |       WHERE source IN ('src0', 'src1')),
           |cand AS (
           |  SELECT DISTINCT ib.doc_id AS doc_id, cb.doc_id AS corp_id
           |  FROM ib JOIN cb USING (band_idx, band_hash)),
           |dsh AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh),
           |near AS (
           |  SELECT c.doc_id, count(*) AS n_near
           |  FROM cand c JOIN dsh a ON a.doc_id = c.doc_id
           |              JOIN dsh b ON b.doc_id = c.corp_id
           |  WHERE round(${jaccardSql("a.dsh", "b.dsh")}, 4) >= 0.5
           |  GROUP BY 1),
           |cfp AS (SELECT DISTINCT ('0x' || substr($fpSql, 1, 15))::BIGINT
           |          AS fp64
           |        FROM documents WHERE source NOT IN ('src0', 'src1')),
           |inc AS (SELECT doc_id, ('0x' || substr($fpSql, 1, 15))::BIGINT
           |          AS fp64
           |        FROM documents WHERE source IN ('src0', 'src1'))
           |SELECT inc.doc_id,
           |       CASE WHEN cfp.fp64 IS NOT NULL THEN 1 ELSE 0 END
           |         AS exact_dup,
           |       CAST(coalesce(near.n_near, 0) AS BIGINT) AS n_near,
           |       CAST(cfp.fp64 IS NULL AND coalesce(near.n_near, 0) = 0
           |            AS INT) AS keep
           |FROM inc LEFT JOIN cfp ON cfp.fp64 = inc.fp64
           |         LEFT JOIN near ON near.doc_id = inc.doc_id""".stripMargin),

    // quantile_cont = the same p(n-1) interpolation the two-pass engine
    // path reproduces from histogram + boundary-bucket ranking
    "q87_exact_quantile_twopass" ->
      """SELECT l_returnflag, 0.5 AS p,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS q
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, 0.95 AS p,
        |       round(quantile_cont(l_extendedprice, 0.95), 4) AS q
        |FROM lineitem GROUP BY 1""".stripMargin,

    // bigram construction mirrors q70's; prev comes from the bigram
    // string (split at the first space) so both engines fingerprint the
    // same bytes; sub-2-token docs carry NULLs on both sides
    "q88_lm_bigram" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS ltoks
        |            FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ltoks)),
        |           i -> ltoks[i] || ' ' || ltoks[i+1])) AS b
        |  FROM tk WHERE len(ltoks) >= 2),
        |pairs AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(b), 1, 15))::BIGINT AS b_fp,
        |         ('0x' || substr(md5(split_part(b, ' ', 1)), 1, 15))::BIGINT
        |           AS p_fp,
        |         count(*) AS k
        |  FROM bg GROUP BY 1, 2, 3),
        |c2 AS (SELECT b_fp, CAST(sum(k) AS BIGINT) AS c2
        |       FROM pairs GROUP BY 1),
        |c1 AS (SELECT p_fp, CAST(sum(k) AS BIGINT) AS c1
        |       FROM pairs GROUP BY 1),
        |t AS (SELECT count(*) AS v FROM c1),
        |sc AS (
        |  SELECT pairs.doc_id, CAST(sum(k) AS BIGINT) AS nb,
        |         sum(k * -ln((c2.c2 + 1) / CAST(c1.c1 + t.v AS DOUBLE)))
        |           AS nll
        |  FROM pairs JOIN c2 USING (b_fp) JOIN c1 USING (p_fp) CROSS JOIN t
        |  GROUP BY 1)
        |SELECT tk.doc_id, coalesce(sc.nb, 0) AS n_bigrams,
        |       round(sc.nll / sc.nb, 4) AS avg_nll,
        |       round(exp(sc.nll / sc.nb), 4) AS ppl
        |FROM tk LEFT JOIN sc ON sc.doc_id = tk.doc_id""".stripMargin,

    "q89_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total, count(*) AS vocab
        |      FROM c),
        |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT)
        |         AS rank,
        |       tok, cnt,
        |       round(sum(cnt) OVER (ORDER BY cnt DESC, tok
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             / t.n_total, 4) AS cum_cov,
        |       vocab
        |FROM top CROSS JOIN t""".stripMargin,

    // identical factored formula on both sides: present-token sums from
    // the pair join, absent-token mass via the closed form from the
    // one-row (N, V, sum_ln_cp1) constants
    "q90_source_divergence" ->
      """WITH tk AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |pairs AS (
        |  SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS tok_fp,
        |         count(*) AS k
        |  FROM tk GROUP BY 1, 2),
        |corpus AS (SELECT tok_fp, CAST(sum(k) AS BIGINT) AS c
        |           FROM pairs GROUP BY 1),
        |consts AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v,
        |                  sum(ln(CAST(c + 1 AS DOUBLE))) AS slc
        |           FROM corpus),
        |j AS (SELECT pairs.source, pairs.k, corpus.c,
        |             consts.n, consts.v, consts.slc
        |      FROM pairs JOIN corpus USING (tok_fp) CROSS JOIN consts),
        |g AS (
        |  SELECT source, CAST(sum(k) AS BIGINT) AS n_tokens,
        |         count(*) AS n_distinct,
        |         any_value(v) AS v, any_value(n) AS n, any_value(slc) AS slc,
        |         sum((k + 1) * (ln(CAST(k + 1 AS DOUBLE))
        |             - ln((c + 1) / CAST(n + v AS DOUBLE)))) AS a_raw,
        |         sum(ln((c + 1) / CAST(n + v AS DOUBLE))) AS slqp
        |  FROM j GROUP BY 1)
        |SELECT source, n_tokens, n_distinct,
        |       round((a_raw - (n_tokens + n_distinct)
        |                * ln(CAST(n_tokens + v AS DOUBLE)))
        |               / CAST(n_tokens + v AS DOUBLE)
        |             + (-ln(CAST(n_tokens + v AS DOUBLE)) * (v - n_distinct)
        |                - ((slc - v * ln(CAST(n + v AS DOUBLE))) - slqp))
        |               / CAST(n_tokens + v AS DOUBLE), 4) AS kl
        |FROM g""".stripMargin,

    // open/close replayed as rank-1 rows over the (ts, event_id) order —
    // the window formulation is the semantic spec for min_by/max_by
    "q91_ohlc_downsample" ->
      """WITH b AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
        |         ts, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY user_id, w_start
        |           ORDER BY ts, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY user_id, w_start
        |           ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM b)
        |SELECT user_id, w_start,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       count(*) AS n_events,
        |       round(avg(value), 4) AS mean_value
        |FROM r GROUP BY 1, 2""".stripMargin,

    // same hash coin as q54's stratified sampling; split thresholds
    // replay splitAssign(valPct=10, testPct=10)
    "q92_train_split" -> {
      docCtes.stripSuffix("\n") + ",\n" +
        s"""scored AS (SELECT doc_id, ${langScoreSqls.mkString(", ")} FROM toks),
           |p AS (SELECT doc_id, $predLangCaseSql AS pred_lang FROM scored)
           |SELECT doc_id, pred_lang,
           |       CASE WHEN b < 10 THEN 'test'
           |            WHEN b < 20 THEN 'val'
           |            ELSE 'train' END AS split
           |FROM (SELECT doc_id, pred_lang,
           |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100
           |          AS b
           |      FROM p)""".stripMargin
    },

    // H = ln n - sum(c ln c)/n from the count relation; top-k by
    // (count desc, key) like the engine's TakeOrdered
    "q94_key_profile" ->
      """WITH c AS (SELECT o_custkey AS k, count(*) AS c
        |           FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS n_distinct,
        |             sum(c * ln(CAST(c AS DOUBLE))) AS clogc
        |      FROM c),
        |tk AS (SELECT max(c) AS top1, CAST(sum(c) AS BIGINT) AS topk
        |       FROM (SELECT c FROM c ORDER BY c DESC, k LIMIT 10))
        |SELECT t.n, t.n_distinct,
        |       round(tk.top1 / CAST(t.n AS DOUBLE), 4) AS top1_frac,
        |       round(tk.topk / CAST(t.n AS DOUBLE), 4) AS topk_frac,
        |       round(ln(CAST(t.n AS DOUBLE)) - t.clogc / t.n, 4)
        |         AS entropy_nats
        |FROM t CROSS JOIN tk""".stripMargin,

    // whole-token membership via the shared stopword-count formulation
    "q95_blocklist_filter" ->
      (docCtes.stripSuffix("\n") + "\n" +
        s"""SELECT doc_id,
           |       ${stopCountSql("ltoks", TextAnalysis.DemoBlocklist)}
           |         AS n_blocked,
           |       CAST(${stopCountSql("ltoks", TextAnalysis.DemoBlocklist)}
           |            <= 0 AS INT) AS keep
           |FROM toks""".stripMargin),

    // the stub decode is md5-based by design, so the declarative replay
    // checks the mapPartitions batch stage value-for-value
    "q97_feature_extract_batch" -> {
      val fCols = (0 until operators.Multimodal.FeatureDim).map { i =>
        s"round(('0x' || substr(md5(text), ${4 * i + 1}, 4))::INT / 65535.0, 6) AS f$i"
      }
      s"""SELECT doc_id AS media_id,
         |       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
         |         AS kind,
         |       ${fCols.mkString(",\n       ")}
         |FROM documents""".stripMargin
    },

    // kmeans cells replayed as in q32/q33; quality + pred_lang replayed
    // as in q53/q54 (CTE renamed to avoid colliding with kmeansCtes)
    "q96_cluster_quality" ->
      (kmeansCtes.stripSuffix("\n") + ",\n" +
        s"""toksq AS (
           |  SELECT doc_id, text, string_split(text, ' ') AS toks,
           |         string_split(lower(text), ' ') AS ltoks
           |  FROM documents),
           |enr0 AS (
           |  SELECT doc_id, length(text) AS n_chars_m, len(toks) AS n_words,
           |         len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
           |           AS n_punct,
           |         ${stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)} AS n_stop,
           |         ${langScoreSqls.mkString(",\n         ")}
           |  FROM toksq),
           |enr AS (
           |  SELECT doc_id,
           |         round(0.4 * least(n_words / 100.0, 1.0)
           |             + 0.3 * (1.0 - n_punct / NULLIF(n_chars_m, 0))
           |             + 0.3 * least(n_stop / n_words * 5.0, 1.0), 4)
           |           AS quality,
           |         $predLangCaseSql AS pred_lang
           |  FROM enr0)
           |SELECT cells.cell, enr.pred_lang, count(*) AS n_docs,
           |       round(avg(enr.quality), 4) AS avg_quality
           |FROM cells JOIN enr ON enr.doc_id = cells.vec_id
           |GROUP BY 1, 2""".stripMargin),

    // q136: the q32 within-cell pair replay feeding the q52 recursive-
    // reachability CC, centroid cosines against the final Lloyd-iteration
    // centroid relation, survivor = (min c2c, then min vec_id) via
    // min-aggregate + join-back — the same argmin the Spark struct-min
    // computes
    "q136_semantic_dedup" ->
      (kmeansCtes.stripSuffix("\n")
        .replaceFirst("WITH ", "WITH RECURSIVE ") + ",\n" +
        s"""pairs AS (
           |  SELECT ca.vec_id AS id_a, cb.vec_id AS id_b
           |  FROM cells ca JOIN cells cb
           |    ON cb.cell = ca.cell AND cb.vec_id > ca.vec_id
           |  JOIN embeddings a ON a.vec_id = ca.vec_id
           |  JOIN embeddings b ON b.vec_id = cb.vec_id
           |  WHERE round(${cosineSql("a.embedding", "b.embedding")}, 4)
           |        >= $SemDedupThreshold),
           |sedges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |swalk(id, reach) AS (
           |  SELECT src, src FROM sedges
           |  UNION
           |  SELECT w.id, e.dst FROM swalk w JOIN sedges e ON e.src = w.reach),
           |lbl AS (SELECT id AS vec_id, min(reach) AS cluster
           |        FROM swalk GROUP BY id),
           |cc2 AS (
           |  SELECT l.cluster, l.vec_id,
           |         round(${cosineSql("e.embedding", "ct.c")}, 6) AS c2c
           |  FROM lbl l
           |  JOIN cells s ON s.vec_id = l.vec_id
           |  JOIN c$KmeansIters ct ON ct.cell = s.cell
           |  JOIN embeddings e ON e.vec_id = l.vec_id),
           |bmin AS (SELECT cluster, min(c2c) AS mc FROM cc2 GROUP BY 1),
           |bsid AS (
           |  SELECT cc2.cluster, min(cc2.vec_id) AS sid
           |  FROM cc2 JOIN bmin ON bmin.cluster = cc2.cluster
           |                    AND cc2.c2c = bmin.mc
           |  GROUP BY 1)
           |SELECT cc2.cluster, cc2.vec_id, round(cc2.c2c, 4) AS cos_centroid,
           |       CASE WHEN cc2.vec_id = bsid.sid THEN 1 ELSE 0 END AS keep
           |FROM cc2 JOIN bsid ON bsid.cluster = cc2.cluster""".stripMargin),

    // recall@5 of the single-probe IVF index vs brute-force truth on the
    // vec_id < 8 golden queries: brute ranking replayed as in q15 (k=5),
    // IVF ranking as in q33, then per-query hit counts — exact integers
    // and a ratio rounded at 4, hash-portable by construction
    "q99_ann_recall" ->
      (kmeansCtes.stripSuffix("\n") + ",\n" +
        s"""bs AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           |         ${cosineSql("q.embedding", "c.embedding")} AS cos
           |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |bt AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY q_id
           |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
           |    FROM bs) WHERE rank <= 5),
           |ivs AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           |         ${cosineSql("q.embedding", "c.embedding")} AS cos
           |  FROM embeddings q
           |  JOIN cells qc ON qc.vec_id = q.vec_id
           |  JOIN cells cc ON cc.cell = qc.cell
           |  JOIN embeddings c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |iv AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY q_id
           |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
           |    FROM ivs) WHERE rank <= 5),
           |t AS (SELECT q_id, count(*) AS n_truth FROM bt GROUP BY 1),
           |h AS (SELECT bt.q_id, count(*) AS n_hit
           |      FROM bt JOIN iv USING (q_id, vec_id) GROUP BY 1)
           |SELECT t.q_id, CAST(t.n_truth AS BIGINT) AS n_truth,
           |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           |       round(coalesce(h.n_hit, 0)
           |             / CAST(t.n_truth AS DOUBLE), 4) AS recall
           |FROM t LEFT JOIN h USING (q_id)""".stripMargin),

    // literals in e-notation (0.5e0, …) are DOUBLE in DuckDB — decimal
    // literals would pull the score into DECIMAL arithmetic and off the
    // engine's bit pattern; the sum chain is spelled term 0 first, the
    // same fixed order the Scala reduce folds
    "q100_bm25_topk" -> {
      val terms = Bm25Terms
      // constants interpolated from the Scala defaults (ADVICE r10 —
      // hardcoded literals would desynchronize on a parameter change);
      // Double.toString is the shortest round-trip decimal, so DuckDB
      // parses each literal back to the bit-identical double the engine
      // folded (1.2 + 1.0 etc. are computed HERE, same as bm25TopK does)
      import graft.operators.TextAnalysis.{Bm25K1, Bm25B, Bm25TopN}
      val k1p1 = s"${(Bm25K1 + 1.0).toString}e0"
      val k1L = s"${Bm25K1.toString}e0"
      val oneMinusB = s"${(1.0 - Bm25B).toString}e0"
      val bL = s"${Bm25B.toString}e0"
      val tfDefs = terms.indices.map(i =>
        s"len(list_filter(ltoks, x -> x = '${terms(i)}')) AS tf_$i").mkString(",\n         ")
      val dfDefs = terms.indices.map(i =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(",\n         ")
      val scoreTerms = terms.indices.map { i =>
        s"""ln(1e0 + (n_docs - df_$i + 0.5e0) / (df_$i + 0.5e0))
           | * ((tf_$i * $k1p1) / (tf_$i + $k1L * ($oneMinusB + $bL * (dl / avgdl))))"""
          .stripMargin.replace("\n", "")
      }.mkString("\n           + ")
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ltoks
         |  FROM documents),
         |pd AS (
         |  SELECT doc_id, len(ltoks) AS dl,
         |         $tfDefs
         |  FROM tk),
         |c AS (
         |  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         |         $dfDefs
         |  FROM pd)
         |SELECT doc_id, dl, ${terms.indices.map(i => s"tf_$i").mkString(", ")},
         |       round($scoreTerms, 4) AS score
         |FROM pd CROSS JOIN c
         |ORDER BY score DESC, doc_id LIMIT $Bm25TopN""".stripMargin
    },

    // all model counts are integers (exact across engines); the KN
    // probability is one fixed-order double expression on both sides
    "q101_lm_kneser_ney" ->
      """WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS ltoks
        |            FROM documents),
        |bgp AS (
        |  SELECT doc_id, unnest(range(1, len(ltoks))) AS i, ltoks
        |  FROM tk WHERE len(ltoks) >= 2),
        |pairs AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(ltoks[i]), 1, 15))::BIGINT AS p_fp,
        |         ('0x' || substr(md5(ltoks[i+1]), 1, 15))::BIGINT AS c_fp,
        |         count(*) AS k
        |  FROM bgp GROUP BY 1, 2, 3),
        |c2 AS (SELECT p_fp, c_fp, CAST(sum(k) AS BIGINT) AS c2
        |       FROM pairs GROUP BY 1, 2),
        |ctx AS (SELECT p_fp, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS nf
        |        FROM c2 GROUP BY 1),
        |cont AS (SELECT c_fp, count(*) AS nr FROM c2 GROUP BY 1),
        |t AS (SELECT count(*) AS tt FROM c2),
        |sc AS (
        |  SELECT pairs.doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
        |         sum(k * -ln(((c2.c2 - 0.75e0) / c1)
        |                     + (((0.75e0 * nf) / c1)
        |                        * (nr / CAST(tt AS DOUBLE))))) AS nll
        |  FROM pairs JOIN c2 USING (p_fp, c_fp) JOIN ctx USING (p_fp)
        |       JOIN cont USING (c_fp) CROSS JOIN t
        |  GROUP BY 1)
        |SELECT tk.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |       round(sc.nll / sc.n_bigrams, 4) AS avg_nll,
        |       round(exp(sc.nll / sc.n_bigrams), 4) AS ppl
        |FROM tk LEFT JOIN sc ON sc.doc_id = tk.doc_id""".stripMargin,

    // survivor = exact-max quality (bit-identical rounded doubles on
    // both engines), min doc_id among ties — over the q52 label oracle
    "q102_cluster_survivor" -> {
      val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
      s"""WITH lab AS (SELECT * FROM ($clusterLabelsSql)),
         |tq AS (
         |  SELECT doc_id,
         |         round(0.4 * least(len(toks) / 100.0, 1.0)
         |             + 0.3 * (1.0 - len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
         |                            / NULLIF(length(text), 0))
         |             + 0.3 * least($stop / len(toks) * 5.0, 1.0), 4) AS quality
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks,
         |               string_split(lower(text), ' ') AS ltoks
         |        FROM documents)),
         |j AS (SELECT lab.cluster, lab.doc_id, tq.quality
         |      FROM lab JOIN tq USING (doc_id)),
         |m AS (SELECT cluster, max(quality) AS quality, count(*) AS cluster_size
         |      FROM j GROUP BY 1)
         |SELECT m.cluster, min(j.doc_id) AS survivor_id, m.quality,
         |       m.cluster_size
         |FROM j JOIN m ON j.cluster = m.cluster AND j.quality = m.quality
         |GROUP BY 1, 3, 4""".stripMargin
    },

    "q103_shingle_novelty" ->
      (docCtes.stripSuffix("\n") + ",\n" +
        """ds AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh),
          |f AS (SELECT doc_id,
          |             ('0x' || substr(md5(s), 1, 15))::BIGINT AS s_fp
          |      FROM ds),
          |dfr AS (SELECT s_fp, count(*) AS df FROM f GROUP BY 1)
          |SELECT doc_id, count(*) AS n_shingles,
          |       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_unique,
          |       round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
          |             / count(*), 4) AS novelty
          |FROM f JOIN dfr USING (s_fp)
          |GROUP BY 1""".stripMargin),

    // quality replayed from the q18/q53 expressions; the cumulative
    // window runs over the (source, quality) histogram only
    "q104_quality_percentile" -> {
      val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
      s"""WITH q0 AS (
         |  SELECT doc_id, source,
         |         round(0.4 * least(len(toks) / 100.0, 1.0)
         |             + 0.3 * (1.0 - len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
         |                            / NULLIF(length(text), 0))
         |             + 0.3 * least($stop / len(toks) * 5.0, 1.0), 4) AS quality
         |  FROM (SELECT doc_id, source, text,
         |               string_split(text, ' ') AS toks,
         |               string_split(lower(text), ' ') AS ltoks
         |        FROM documents)),
         |-- mirror the engine's NULL-quality filter: a NULL histogram row
         |-- would sort NULLS FIRST in Spark but NULLS LAST here
         |q AS (SELECT * FROM q0 WHERE quality IS NOT NULL),
         |h AS (SELECT source, quality, count(*) AS cnt FROM q GROUP BY 1, 2),
         |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
         |hh AS (
         |  SELECT source, quality, cnt,
         |         sum(cnt) OVER (PARTITION BY source ORDER BY quality
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h)
         |SELECT q.doc_id, q.source, q.quality,
         |       round((hh.cum - 0.5e0 * hh.cnt) / n.n, 4) AS pctl
         |FROM q JOIN hh USING (source, quality) JOIN n USING (source)""".stripMargin
    },

    // the estimate is a fixed-order sum of k integer signature-equality
    // terms over the SAME md5 signatures the q11 oracle builds; exact
    // Jaccard replayed over the distinct shingle sets
    "q105_minhash_calibration" -> {
      val agreeSql = (1 to Dedup.MinhashK)
        .map(i => s"(CASE WHEN sa.sig[$i] = sb.sig[$i] THEN 1 ELSE 0 END)")
        .mkString("\n             + ")
      docCtes.stripSuffix("\n") + ",\n" + lshCtes +
        s"""cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id),
           |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh)
           |SELECT id_a, id_b,
           |       round(($agreeSql) / ${Dedup.MinhashK}e0, 4) AS est_jaccard,
           |       ${jaccardSql("da.dsh", "db.dsh")} AS jaccard,
           |       round(abs(round(($agreeSql) / ${Dedup.MinhashK}e0, 4)
           |                 - ${jaccardSql("da.dsh", "db.dsh")}), 4) AS abs_err
           |FROM cands
           |JOIN sig sa ON sa.doc_id = cands.id_a
           |JOIN sig sb ON sb.doc_id = cands.id_b
           |JOIN shd da ON da.doc_id = cands.id_a
           |JOIN shd db ON db.doc_id = cands.id_b""".stripMargin
    },

    // the q52 nd CTE (capped bands + exact-Jaccard >= 0.5 verify)
    // re-used; sources attach by doc_id, unordered pair via least/greatest
    "q106_source_overlap" ->
      (docCtes.stripSuffix("\n") + ",\n" + lshCtes +
        s"""cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id),
           |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh),
           |nd AS (
           |  SELECT id_a, id_b
           |  FROM cands JOIN shd a ON cands.id_a = a.doc_id
           |             JOIN shd b ON cands.id_b = b.doc_id
           |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5)
           |SELECT least(da.source, db.source) AS source_x,
           |       greatest(da.source, db.source) AS source_y,
           |       count(*) AS n_pairs
           |FROM nd JOIN documents da ON da.doc_id = nd.id_a
           |        JOIN documents db ON db.doc_id = nd.id_b
           |GROUP BY 1, 2""".stripMargin),

    "q107_top_boilerplate" ->
      (docCtes.stripSuffix("\n") + ",\n" +
        """pd AS (
          |  SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh),
          |f AS (SELECT s, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s_fp
          |      FROM pd),
          |top AS (
          |  SELECT s_fp, count(*) AS df FROM f GROUP BY 1
          |  ORDER BY df DESC, s_fp LIMIT 20),
          |n AS (SELECT count(*) AS n_docs FROM documents)
          |SELECT min(f.s) AS shingle, CAST(top.df AS BIGINT) AS df,
          |       round(top.df / n.n_docs, 4) AS doc_share
          |FROM f JOIN top USING (s_fp) CROSS JOIN n
          |GROUP BY top.s_fp, top.df, n.n_docs""".stripMargin),

    // both pair pipelines replayed (q11's nd + q31's block join), counts
    // as scalar one-row CTEs; NULLIF guards the 0/0 (NaN-vs-NULL) edge
    "q108_dedup_agreement" ->
      (docCtes.stripSuffix("\n") + ",\n" + lshCtes + simhash64Ctes +
        s"""cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id),
           |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh),
           |mh AS (
           |  SELECT id_a, id_b
           |  FROM cands JOIN shd a ON cands.id_a = a.doc_id
           |             JOIN shd b ON cands.id_b = b.doc_id
           |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5),
           |blocks AS (
           |  SELECT doc_id, simhash, p.block_idx,
           |         (simhash >> (p.block_idx * 16)) & 65535 AS block_val
           |  FROM simhash_t CROSS JOIN (SELECT unnest(range(0, 4)) AS block_idx) p),
           |sp AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM blocks a JOIN blocks b
           |    ON b.block_idx = a.block_idx AND b.block_val = a.block_val
           |   AND b.doc_id > a.doc_id
           |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
           |nm AS (SELECT count(*) AS n_minhash FROM mh),
           |ns AS (SELECT count(*) AS n_simhash FROM sp),
           |nb AS (SELECT count(*) AS n_both
           |       FROM mh JOIN sp USING (id_a, id_b))
           |SELECT CAST(n_minhash AS BIGINT) AS n_minhash,
           |       CAST(n_simhash AS BIGINT) AS n_simhash,
           |       CAST(n_both AS BIGINT) AS n_both,
           |       round(n_both / NULLIF(n_minhash + n_simhash - n_both, 0), 4)
           |         AS pair_jaccard
           |FROM nm CROSS JOIN ns CROSS JOIN nb""".stripMargin),

    // q109 reads the PARTITIONED layout in Spark; the oracle replays the
    // rollup over the raw table — a value mismatch would mean the
    // partition round-trip (to_date, directory encoding) lost or moved
    // rows. UTC session timezone on the Spark side makes to_date(ts)
    // equal DuckDB's naive CAST(ts AS DATE).
    "q109_partitioned_rollup" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
        |GROUP BY 1, 2""".stripMargin,

    // q110 reads the WARC layout in Spark; the oracle rolls up the raw
    // table. strlen = BYTE length in DuckDB (Spark octet_length); sums
    // cast back to BIGINT (DuckDB widens BIGINT sums to HUGEINT).
    "q110_warc_roundtrip" ->
      """SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // q132: identical oracle to q110 — the layout and rollup are the
    // same; only the ENGINE-side read path differs (DSv2 vs binaryFiles)
    "q132_warc_v2_read" ->
      """SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // q135: the Morton key replayed from the raw table — identical
    // equi-width bucket arithmetic (global min/max from a subquery, the
    // same IEEE-754 term order) and the same generated interleave
    // expression the writer uses; box + hit from raw min/max, rounded at
    // the output only
    "q135_zorder_layout" -> {
      val bits = graft.sources.Writers.ZOrderBits
      val n = (1 << bits).toDouble
      def bucketSql(x: String, mn: String, mx: String) =
        s"CAST(least(greatest(floor(($x - $mn) / " +
          s"(CASE WHEN $mx > $mn THEN $mx - $mn ELSE 1.0 END) * $n), 0.0), " +
          s"${n - 1.0}) AS INT)"
      val mortonSql = (0 until bits).map { j =>
        s"(((ba & ${1 << j}) << $j) | ((bb & ${1 << j}) << ${j + 1}))"
      }.mkString(" | ")
      s"""WITH rng AS (
         |  SELECT min(CAST(user_id AS DOUBLE)) AS amn,
         |         max(CAST(user_id AS DOUBLE)) AS amx,
         |         min(value) AS bmn, max(value) AS bmx FROM events),
         |k AS (
         |  SELECT event_id, user_id, value,
         |         ${bucketSql("CAST(user_id AS DOUBLE)", "amn", "amx")} AS ba,
         |         ${bucketSql("value", "bmn", "bmx")} AS bb
         |  FROM events CROSS JOIN rng),
         |z AS (SELECT event_id, user_id, value, $mortonSql AS z_file FROM k)
         |SELECT z_file, count(*) AS n_rows,
         |       CAST(sum(event_id) AS BIGINT) AS sum_event_id,
         |       min(user_id) AS u_min, max(user_id) AS u_max,
         |       round(min(value), 4) AS v_min, round(max(value), 4) AS v_max,
         |       CASE WHEN max(user_id) >= $ZBoxUMin AND min(user_id) <= $ZBoxUMax
         |             AND max(value) >= $ZBoxVMin AND min(value) <= $ZBoxVMax
         |            THEN 1 ELSE 0 END AS hit
         |FROM z GROUP BY 1""".stripMargin
    },

    // q111: the weight literals interpolate from the shipped artifact
    // (Double.toString round-trips, so DuckDB folds the identical
    // doubles); the z chain is spelled left-to-right exactly as the
    // Scala reduce folds it, and `accept` branches on the ROUNDED
    // probability in both engines
    "q111_quality_classifier" -> {
      val w = graft.operators.QualityModel.DefaultWeights
      val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
      docCtes.stripSuffix("\n") + ",\n" +
        s"""f AS (
           |  SELECT doc_id,
           |         least(len(toks) / 100.0, 1.0) AS x1,
           |         CASE WHEN length(text) > 0
           |              THEN len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
           |                   / length(text)
           |              ELSE 0.0e0 END AS x2,
           |         least($stop / len(toks) * 5.0, 1.0) AS x3
           |  FROM toks),
           |s AS (
           |  SELECT doc_id,
           |         ${w(0)}e0 * 1.0e0 + ${w(1)}e0 * x1
           |           + ${w(2)}e0 * x2 + ${w(3)}e0 * x3 AS z
           |  FROM f)
           |SELECT doc_id, round(z, 4) AS logit,
           |       round(1.0e0 / (1.0e0 + exp(-z)), 4) AS p_good,
           |       CASE WHEN round(1.0e0 / (1.0e0 + exp(-z)), 4) >= 0.5e0
           |            THEN 1 ELSE 0 END AS accept
           |FROM s""".stripMargin
    },

    // q112 reads the bucketed catalog tables in Spark; the oracle joins
    // the raw parquet — a mismatch means the bucketed write/read moved
    // or lost rows
    "q112_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // q113: truth = raw exact Jaccard over the id-window pair sample;
    // caught = the q11 LSH pipeline (lshCtes bands + cap) restricted to
    // the same window; NULLIF guards the empty-truth edge like q108
    "q113_lsh_recall" ->
      (docCtes.stripSuffix("\n") + ",\n" + lshCtes +
        s"""shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh
           |        WHERE len(list_distinct(sh)) > 0),
           |truth AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM shd a JOIN shd b
           |    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 25
           |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5),
           |cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id),
           |caught AS (
           |  SELECT id_a, id_b
           |  FROM cands JOIN shd a ON cands.id_a = a.doc_id
           |             JOIN shd b ON cands.id_b = b.doc_id
           |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5
           |    AND id_b - id_a <= 25),
           |nt AS (SELECT count(*) AS n_truth FROM truth),
           |nc AS (SELECT count(*) AS n_caught
           |       FROM truth JOIN caught USING (id_a, id_b))
           |SELECT CAST(n_truth AS BIGINT) AS n_truth,
           |       CAST(n_caught AS BIGINT) AS n_caught,
           |       round(n_caught / NULLIF(n_truth, 0), 4) AS recall
           |FROM nt CROSS JOIN nc""".stripMargin),

    // q114: the q11 verified-pair chain, symmetrized, then a per-doc
    // row_number over (rounded jaccard DESC, neighbor ASC) — the same
    // deterministic rank-key discipline as q48
    "q114_similar_topk" ->
      (docCtes.stripSuffix("\n") + ",\n" + lshCtes +
        s"""cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id),
           |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM sh),
           |pairs AS (
           |  SELECT id_a, id_b, ${jaccardSql("a.dsh", "b.dsh")} AS jaccard
           |  FROM cands JOIN shd a ON cands.id_a = a.doc_id
           |             JOIN shd b ON cands.id_b = b.doc_id
           |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5),
           |sym AS (
           |  SELECT id_a AS doc_id, id_b AS neighbor_id, jaccard FROM pairs
           |  UNION ALL
           |  SELECT id_b AS doc_id, id_a AS neighbor_id, jaccard FROM pairs),
           |r AS (
           |  SELECT doc_id, neighbor_id, jaccard,
           |         CAST(row_number() OVER (PARTITION BY doc_id
           |           ORDER BY jaccard DESC, neighbor_id ASC) AS INTEGER) AS rnk
           |  FROM sym)
           |SELECT doc_id, rnk, neighbor_id, jaccard FROM r
           |WHERE rnk <= ${Dedup.DefaultSimilarK}""".stripMargin),

    // q115: the stage chain, names, and strictly-after semantics all
    // interpolate from EventAnalytics.DefaultFunnelStages so operator and
    // oracle can't desynchronize
    "q115_funnel" -> {
      val st = EventAnalytics.DefaultFunnelStages
      val chain = st.zipWithIndex.map { case (name, i) =>
        if (i == 0)
          s"""s0 AS (
             |  SELECT user_id, t, event_type,
             |         min(CASE WHEN event_type = '$name' THEN t END)
             |           OVER (PARTITION BY user_id) AS t_0
             |  FROM e)""".stripMargin
        else
          s"""s$i AS (
             |  SELECT *, min(CASE WHEN event_type = '$name'
             |                      AND t > t_${i - 1} THEN t END)
             |              OVER (PARTITION BY user_id) AS t_$i
             |  FROM s${i - 1})""".stripMargin
      }.mkString(",\n")
      val uCols = st.indices.map(i => s"any_value(t_$i) AS t_$i").mkString(", ")
      val aCols = (st.indices.map(i => s"count(t_$i) AS n_$i") ++
        st.indices.drop(1).map(i =>
          s"round(avg((t_$i - t_${i - 1}) / 3.6e9), 4) AS h_$i")).mkString(", ")
      val branches = st.zipWithIndex.map { case (name, i) =>
        val conv = if (i == 0) "CAST(NULL AS DOUBLE)"
          else s"round(n_$i / NULLIF(n_${i - 1}, 0), 4)"
        val hrs = if (i == 0) "CAST(NULL AS DOUBLE)" else s"h_$i"
        s"""SELECT CAST($i AS INTEGER) AS stage_idx, '$name' AS stage,
           |       CAST(n_$i AS BIGINT) AS n_users,
           |       $conv AS conv_from_prev,
           |       $hrs AS avg_hours_from_prev FROM a""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
         |$chain,
         |u AS (SELECT user_id, $uCols FROM s${st.length - 1} GROUP BY 1),
         |a AS (SELECT $aCols FROM u)
         |$branches""".stripMargin
    },

    // q116: (user, day) distinct → first-day cohorts → (cohort, offset)
    // counts; DuckDB date-minus-date is BIGINT days, cast to match
    // Spark's datediff INT
    "q116_retention_cohorts" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |fd AS (SELECT user_id, min(day) AS cohort_day FROM active GROUP BY 1),
        |act AS (
        |  SELECT cohort_day, CAST(day - cohort_day AS INTEGER) AS day_offset,
        |         count(*) AS n_active
        |  FROM active JOIN fd USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort_day, count(*) AS n_cohort FROM fd GROUP BY 1)
        |SELECT cohort_day, day_offset, n_active, n_cohort,
        |       round(n_active / NULLIF(n_cohort, 0), 4) AS retention
        |FROM act JOIN sz USING (cohort_day)""".stripMargin,

    // q117: the q84 md5-fp + Laplace chain, two distributions folded from
    // one tf relation with conditional sums; selection replays the
    // rounded-weight ordering with the doc_id tie-break
    "q117_importance_resample" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, source,
         |         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS fp,
         |         count(*) AS k
         |  FROM tk GROUP BY 1, 2, 3),
         |voc AS (
         |  SELECT fp,
         |         CAST(sum(CASE WHEN source = 'src0' THEN k ELSE 0 END)
         |              AS BIGINT) AS tcnt,
         |         CAST(sum(CASE WHEN source <> 'src0' THEN k ELSE 0 END)
         |              AS BIGINT) AS rcnt
         |  FROM tf GROUP BY 1),
         |tot AS (SELECT CAST(sum(tcnt) AS BIGINT) AS tn,
         |               CAST(sum(rcnt) AS BIGINT) AS rn,
         |               count(*) AS v FROM voc),
         |model AS (
         |  SELECT fp, ln((tcnt + 1) / CAST(tn + v AS DOUBLE)) -
         |             ln((rcnt + 1) / CAST(rn + v AS DOUBLE)) AS lr
         |  FROM voc CROSS JOIN tot),
         |sc AS (
         |  SELECT tf.doc_id, tf.source, CAST(sum(tf.k) AS BIGINT) AS n_tokens,
         |         sum(tf.k * m.lr) AS w
         |  FROM tf JOIN model m USING (fp)
         |  WHERE tf.source <> 'src0'
         |  GROUP BY 1, 2)
         |SELECT doc_id, source, n_tokens, round(w, 4) AS weight,
         |       round(w / n_tokens, 4) AS avg_lr
         |FROM sc
         |ORDER BY round(w / n_tokens, 4) DESC, doc_id ASC
         |LIMIT ${Curation.DefaultImportanceN}""".stripMargin,

    // q98: BPE TRAINING replay — the full sequential greedy loop as
    // generated CTE rounds (see bpeTrainOracleSql); unlike q118 this
    // interpolates nothing learned, so it is a genuinely independent
    // re-derivation of the merge table
    "q98_bpe_train" -> bpeTrainOracleSql(Q98Merges),

    // q118: BPE APPLY replay — the learned merge table (published by the
    // query run; Verify serializes oracleSql only after every query has
    // materialized) interpolates as nMerges nested replace() calls over
    // the boundary-wrapped character segmentation '|c1||c2|…|cn|'.
    // replace() is left-to-right non-overlapping — exactly BpeApply's
    // scan order — matches only align at symbol boundaries ('|' never
    // occurs inside a symbol, asserted at interpolation time), and the
    // DOUBLE separator between symbols keeps adjacent matches from
    // sharing characters (a single shared '|' would make the second of
    // two back-to-back (a,b) pairs invisible to the scan). The string
    // fold is therefore bit-identical to the sequential array fold,
    // which for training words — every corpus word, since q118 trains on
    // the same corpus it encodes — is bit-identical to BpeEncode's
    // rank-priority loop (the BpeSpec equivalence pin).
    "q118_bpe_encode" -> (learnedBpeMerges match {
      case None =>
        // keyset-stable placeholder for contexts that read oracleSql
        // without running the query (ContractSpec); Verify always
        // overwrites it with the real replay
        "SELECT CAST(NULL AS BIGINT) AS doc_id, 0 AS n_words, " +
          "0 AS n_tokens, '' AS token_str WHERE false"
      case Some(merges) =>
        require(merges.forall { case (a, b) => !(a + b).contains("|") },
          "oracle wrap char '|' appears in a learned symbol — switch the replay to chr(1)")
        val folded = merges.foldLeft("regexp_replace(w, '(.)', '|\\1|', 'g')") {
          case (acc, (a, b)) => s"replace($acc, '|$a||$b|', '|$a$b|')"
        }
        s"""SELECT doc_id, len(words) AS n_words,
           |       len(flatten(pieces)) AS n_tokens,
           |       array_to_string(flatten(pieces), ' ') AS token_str
           |FROM (
           |  SELECT doc_id, words,
           |         list_transform(words,
           |           w -> string_split(trim($folded, '|'), '||')) AS pieces
           |  FROM (
           |    SELECT doc_id,
           |           list_filter(string_split(lower(text), ' '),
           |                       w -> len(w) > 0) AS words
           |    FROM documents))""".stripMargin
    }),

    // q119: the composed curation DAG replayed end to end — q104's
    // percentile (keep pctl >= 0.5), q11/q52's LSH+CC over the KEPT
    // subset (band cap re-applied on the subset's bucket sizes), q102's
    // keep-best survivor, q80's bucket-wise budget cutoff at HALF the
    // deduped corpus's tokens (a scalar subquery — the budget derives
    // from the data in both engines), and q77's block-sharded packing of
    // the selected docs. Each fragment is the established bit-exact
    // oracle of its standalone gate; this chains them.
    "q119_curation_dag" -> {
      val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
      val qual =
        s"""round(0.4 * least(len(toks) / 100.0, 1.0)
           |             + 0.3 * (1.0 - len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
           |                            / NULLIF(length(text), 0))
           |             + 0.3 * least($stop / len(toks) * 5.0, 1.0), 4)""".stripMargin
      val bandSelects = (0 until Dedup.LshBands).map { b =>
        val idx = (1 to Dedup.LshRows).map(r => s"sig[${b * Dedup.LshRows + r}]")
        s"SELECT doc_id, $b AS band_idx, md5(${idx.mkString(" || '|' || ")}) AS band_hash FROM sig"
      }
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks,
         |         string_split(lower(text), ' ') AS ltoks
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, list_transform(range(1, len(toks) - 1),
         |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
         |  FROM toks),
         |q0 AS (
         |  SELECT doc_id, source, $qual AS quality
         |  FROM (SELECT d.doc_id, d.source, d.text, t.toks, t.ltoks
         |        FROM documents d JOIN toks t USING (doc_id))),
         |q AS (SELECT * FROM q0 WHERE quality IS NOT NULL),
         |h AS (SELECT source, quality, count(*) AS cnt FROM q GROUP BY 1, 2),
         |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
         |hh AS (
         |  SELECT source, quality, cnt,
         |         sum(cnt) OVER (PARTITION BY source ORDER BY quality
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |kept AS (
         |  SELECT q.doc_id
         |  FROM q JOIN hh USING (source, quality) JOIN n USING (source)
         |  WHERE round((hh.cum - 0.5e0 * hh.cnt) / n.n, 4) >= 0.5),
         |shk AS (
         |  SELECT doc_id, sh FROM sh
         |  WHERE doc_id IN (SELECT doc_id FROM kept)),
         |sig AS (
         |  SELECT doc_id, list_transform(range(0, ${Dedup.MinhashK}),
         |           j -> list_min(list_transform(sh, s -> md5(j::VARCHAR || '|' || s)))) AS sig
         |  FROM shk WHERE len(sh) > 0),
         |bands_raw AS (
         |${bandSelects.mkString("  ", "\n  UNION ALL ", "")}),
         |bands AS (
         |  SELECT doc_id, band_idx, band_hash FROM bands_raw
         |  QUALIFY count(*) OVER (PARTITION BY band_idx, band_hash) <= ${Dedup.DefaultMaxBucket}),
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |shd AS (SELECT doc_id, list_distinct(sh) AS dsh FROM shk),
         |nd AS (
         |  SELECT id_a, id_b
         |  FROM cands JOIN shd a ON cands.id_a = a.doc_id
         |             JOIN shd b ON cands.id_b = b.doc_id
         |  WHERE ${jaccardSql("a.dsh", "b.dsh")} >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM nd
         |  UNION ALL SELECT id_b, id_a FROM nd),
         |walk(id, reach) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
         |labels AS (
         |  SELECT id AS doc_id, min(reach) AS cluster FROM walk GROUP BY id),
         |j2 AS (SELECT labels.cluster, labels.doc_id, q0.quality
         |       FROM labels JOIN q0 USING (doc_id)),
         |m2 AS (SELECT cluster, max(quality) AS bq FROM j2 GROUP BY 1),
         |surv AS (
         |  SELECT j2.cluster, min(j2.doc_id) AS survivor_id
         |  FROM j2 JOIN m2 ON j2.cluster = m2.cluster AND j2.quality = m2.bq
         |  GROUP BY 1),
         |dd AS (
         |  SELECT doc_id FROM kept
         |  WHERE doc_id NOT IN (
         |    SELECT doc_id FROM labels
         |    WHERE doc_id NOT IN (SELECT survivor_id FROM surv))),
         |tot AS (
         |  SELECT CAST(sum(len(t.toks)) AS BIGINT) // 2 AS budget
         |  FROM toks t WHERE t.doc_id IN (SELECT doc_id FROM dd)),
         |e2 AS (
         |  SELECT t.doc_id, len(t.toks) AS n_tokens, q0.quality AS qv,
         |         CAST(floor(q0.quality * 100) AS INT) AS qb
         |  FROM toks t JOIN q0 USING (doc_id)
         |  WHERE t.doc_id IN (SELECT doc_id FROM dd)
         |    AND q0.quality IS NOT NULL),
         |b AS (SELECT qb, CAST(sum(n_tokens) AS BIGINT) AS b_tokens
         |      FROM e2 GROUP BY 1),
         |bc AS (SELECT qb, b_tokens,
         |              CAST(coalesce(sum(b_tokens) OVER (ORDER BY qb DESC
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |                AS BIGINT) AS cum_before
         |       FROM b),
         |j3 AS (SELECT e2.doc_id, e2.qb, e2.n_tokens,
         |              bc.b_tokens, bc.cum_before
         |       FROM e2 JOIN bc USING (qb)),
         |whole AS (
         |  SELECT doc_id FROM j3
         |  WHERE cum_before + b_tokens <= (SELECT budget FROM tot)),
         |bnd AS (
         |  SELECT doc_id FROM (
         |    SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY qb
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_in
         |    FROM j3 WHERE cum_before < (SELECT budget FROM tot)
         |      AND cum_before + b_tokens > (SELECT budget FROM tot))
         |  WHERE cum_before + cum_in + n_tokens <= (SELECT budget FROM tot)),
         |sel AS (SELECT doc_id FROM whole UNION ALL SELECT doc_id FROM bnd),
         |pt AS (
         |  SELECT d.doc_id, d.lang, len(t.toks) AS n_tokens,
         |         ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 4))::INT
         |           % ${Curation.DefaultPackBlocks} AS block
         |  FROM documents d JOIN toks t USING (doc_id)
         |  WHERE d.doc_id IN (SELECT doc_id FROM sel)),
         |pc AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(coalesce(sum(n_tokens) OVER (
         |           PARTITION BY lang ORDER BY block, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS cum_before
         |  FROM pt)
         |SELECT doc_id, lang, n_tokens, cum_before,
         |       CAST(floor(cum_before / 256.0) AS BIGINT) AS seq_id,
         |       cum_before % 256 AS offset,
         |       CAST(cum_before % 256 + n_tokens > 256 AS INT)
         |         AS spans_boundary
         |FROM pc""".stripMargin
    },

    // q120: the q99 brute-truth + q51 probe-ranking replays, swept over
    // probe levels with a level relation; n_scored counts each level's
    // candidate set (integers), recall rounds at 4 (the q99 rational)
    "q120_ann_frontier" ->
      (kmeansCtes.stripSuffix("\n") + ",\n" +
        s"""bs AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           |         ${cosineSql("q.embedding", "c.embedding")} AS cos
           |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |bt AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY q_id
           |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
           |    FROM bs) WHERE rank <= 5),
           |qprobe AS (
           |  SELECT vec_id, cell, rn FROM (
           |    SELECT v.vec_id, cc.cell,
           |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |             list_sum(list_transform(cc.c, x -> x*x))
           |             - 2 * list_sum(list_transform(range(1, ${EmbDim + 1}),
           |                              i -> v.emb[i] * cc.c[i])),
           |             cc.cell) AS rn
           |    FROM v CROSS JOIN c$KmeansIters cc WHERE v.vec_id < 8)
           |  WHERE rn <= 4),
           |lv AS (SELECT unnest([1, 2, 4]) AS n_probe),
           |cand AS (
           |  SELECT l.n_probe, q.vec_id AS q_id, c.vec_id AS vec_id,
           |         ${cosineSql("q.embedding", "c.embedding")} AS cos
           |  FROM lv l
           |  JOIN qprobe qp ON qp.rn <= l.n_probe
           |  JOIN embeddings q ON q.vec_id = qp.vec_id
           |  JOIN cells cc ON cc.cell = qp.cell
           |  JOIN embeddings c ON c.vec_id = cc.vec_id AND c.vec_id <> q.vec_id),
           |ns AS (SELECT n_probe, q_id, CAST(count(*) AS BIGINT) AS n_scored
           |       FROM cand GROUP BY 1, 2),
           |iv AS (
           |  SELECT n_probe, q_id, vec_id FROM (
           |    SELECT n_probe, q_id, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY n_probe, q_id
           |             ORDER BY round(cos, 6) DESC, vec_id ASC) AS rank
           |    FROM cand) WHERE rank <= 5),
           |t AS (SELECT q_id, count(*) AS n_truth FROM bt GROUP BY 1),
           |h AS (SELECT iv.n_probe, bt.q_id, count(*) AS n_hit
           |      FROM bt JOIN iv USING (q_id, vec_id) GROUP BY 1, 2)
           |SELECT l.n_probe, t.q_id, CAST(t.n_truth AS BIGINT) AS n_truth,
           |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           |       round(coalesce(h.n_hit, 0)
           |             / CAST(t.n_truth AS DOUBLE), 4) AS recall,
           |       coalesce(ns.n_scored, 0) AS n_scored
           |FROM lv l CROSS JOIN t
           |LEFT JOIN h ON h.n_probe = l.n_probe AND h.q_id = t.q_id
           |LEFT JOIN ns ON ns.n_probe = l.n_probe AND ns.q_id = t.q_id""".stripMargin),

    // q129: the IVF-PQ frontier replay — codebooks interpolated from the
    // published learned model (Verify materializes queries before
    // serializing oracleSql), everything else recomputed in SQL
    "q129_pq_frontier" -> ((learnedPqModel, learnedPqResModel) match {
      case (Some(model), Some(rModel)) => pqFrontierOracleSql(model, rModel)
      case _ =>
        // keyset-stable placeholder (the q118 convention); Verify always
        // overwrites it with the real replay
        "SELECT '' AS variant, CAST(NULL AS BIGINT) AS q_id, " +
          "CAST(0 AS BIGINT) AS n_truth, CAST(0 AS BIGINT) AS n_hit, " +
          "0.0 AS recall, CAST(0 AS BIGINT) AS n_scored WHERE false"
    }),

    // q138: both assignment paths replayed from the published literals —
    // the flat argmin over all cell centroids and the two-level pick
    // (nearest group by the same |c|²−2·dot distance, then argmin over
    // that group's member cells), identical index-order folds and
    // (dist, index) tie-breaks as the NearestCells/NearestCellTwoLevel
    // kernels
    "q138_twolevel_assign" -> (learnedHierModel match {
      case None =>
        "SELECT CAST(NULL AS BIGINT) AS vec_id, 0 AS cell_two_level, " +
          "0 AS cell_flat, 0 AS agree WHERE false"
      case Some((cents, idx)) =>
        val gcVals = idx.groupCents.zipWithIndex.map { case (c, gi) =>
          s"($gi, [${c.mkString(", ")}]::DOUBLE[])"
        }.mkString(", ")
        val cellVals = cents.zipWithIndex.map { case (c, ci) =>
          val gi = idx.members.indexWhere(_.contains(ci))
          s"($ci, $gi, [${c.mkString(", ")}]::DOUBLE[])"
        }.mkString(", ")
        def dist(vec: String, cen: String) =
          s"""(list_sum(list_transform($cen, x -> x*x))
             | - 2 * list_sum(list_transform(range(1, ${EmbDim + 1}),
             |          i -> $vec[i] * $cen[i])))""".stripMargin
        s"""WITH v AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
           |  FROM embeddings),
           |gc AS (SELECT * FROM (VALUES $gcVals) t(gi, gv)),
           |cl AS (SELECT * FROM (VALUES $cellVals) t(ci, gi, cv)),
           |gpick AS (
           |  SELECT vec_id, gi FROM (
           |    SELECT v.vec_id, gc.gi,
           |           row_number() OVER (PARTITION BY v.vec_id
           |             ORDER BY ${dist("v.emb", "gc.gv")}, gc.gi) AS rn
           |    FROM v CROSS JOIN gc) WHERE rn = 1),
           |two AS (
           |  SELECT vec_id, ci AS cell_two_level FROM (
           |    SELECT g.vec_id, cl.ci,
           |           row_number() OVER (PARTITION BY g.vec_id
           |             ORDER BY ${dist("v.emb", "cl.cv")}, cl.ci) AS rn
           |    FROM gpick g
           |    JOIN cl ON cl.gi = g.gi
           |    JOIN v ON v.vec_id = g.vec_id) WHERE rn = 1),
           |flat AS (
           |  SELECT vec_id, ci AS cell_flat FROM (
           |    SELECT v.vec_id, cl.ci,
           |           row_number() OVER (PARTITION BY v.vec_id
           |             ORDER BY ${dist("v.emb", "cl.cv")}, cl.ci) AS rn
           |    FROM v CROSS JOIN cl) WHERE rn = 1)
           |SELECT two.vec_id, two.cell_two_level, flat.cell_flat,
           |       CASE WHEN two.cell_two_level = flat.cell_flat
           |            THEN 1 ELSE 0 END AS agree
           |FROM two JOIN flat USING (vec_id)""".stripMargin
    }),

    // q133: the PCA projection replay — components + mean-dot scalars
    // interpolated from the published fitted basis, the dot folding in
    // index order exactly as VectorDot does
    "q133_pca_project" -> (learnedPcaModel match {
      case None =>
        "SELECT CAST(NULL AS BIGINT) AS vec_id, " +
          (1 to PcaK).map(j => s"0.0 AS p$j").mkString(", ") + " WHERE false"
      case Some(model) =>
        val lits = model.components.indices.map { j =>
          s"[${model.components(j).mkString(", ")}]::DOUBLE[] AS v${j + 1}"
        }.mkString(", ")
        val projs = model.components.indices.map { j =>
          s"""round(list_sum(list_transform(range(1, ${EmbDim + 1}),
             |         i -> e.emb[i] * m.v${j + 1}[i]))
             |       - ${model.meanDots(j)}, 4) AS p${j + 1}""".stripMargin
        }.mkString(",\n       ")
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
           |  FROM embeddings),
           |m AS (SELECT $lits)
           |SELECT e.vec_id,
           |       $projs
           |FROM e CROSS JOIN m""".stripMargin
    }),

    // q125: the q109 rollup without the date slice — full-range equality
    // against the raw table is the losslessness proof for the compacted
    // rewrite
    "q125_compacted_rollup" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    // q127: the q80 budget replay partitioned by source, budgets
    // interpolated from the shipped recipe (floor(budget * share)
    // computed HERE, the same longs the engine folds)
    "q127_source_mix" ->
      ("WITH " + mixSelCtes(MixTargets) + s""",
         |sp AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS spent
         |       FROM sel GROUP BY 1)
         |SELECT sel.doc_id, sel.source, sel.n_tokens, sel.hb,
         |       CAST(bud.budget AS BIGINT) AS budget, sp.spent,
         |       CAST(bud.budget AS BIGINT) - sp.spent AS unspent
         |FROM sel JOIN bud USING (source) JOIN sp USING (source)""".stripMargin),

    // q131: the accounting report over the SAME selection replay, with
    // the ghost target's zero-spent row surfaced by the LEFT JOIN from
    // the budget relation
    "q131_mix_accounting" ->
      ("WITH " +
        mixSelCtes(MixTargets :+ (MixGhostSource -> MixGhostShare)) + s""",
         |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |               CAST(sum(n_tokens) AS BIGINT) AS spent
         |        FROM sel GROUP BY 1)
         |SELECT bud.source, CAST(bud.budget AS BIGINT) AS budget,
         |       coalesce(agg.n_docs, 0) AS n_docs,
         |       coalesce(agg.spent, 0) AS spent,
         |       CAST(bud.budget AS BIGINT) - coalesce(agg.spent, 0) AS unspent
         |FROM bud LEFT JOIN agg USING (source)""".stripMargin),

    // q126: the merge replay — change classes from a left join on the
    // normalized-fp equality (the same fpSql the q10 dedup gate uses),
    // carry set via NOT IN on the incoming ids
    "q126_corpus_merge" ->
      s"""WITH ex AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  WHERE doc_id % 5 <> 4),
         |inc AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 10 = 0 THEN text || ' updated'
         |              ELSE text END AS text,
         |         lang, source
         |  FROM documents WHERE doc_id % 2 = 0),
         |exfp AS (SELECT doc_id, $fpSql AS fp FROM ex),
         |incfp AS (SELECT doc_id, text, lang, source, $fpSql AS fp FROM inc),
         |m AS (
         |  SELECT i.doc_id, i.text, i.lang, i.source,
         |         CASE WHEN e.fp IS NULL THEN 'insert'
         |              WHEN i.fp = e.fp THEN 'refresh'
         |              ELSE 'rewrite' END AS change
         |  FROM incfp i LEFT JOIN exfp e USING (doc_id))
         |SELECT doc_id, text, lang, source, change FROM m
         |UNION ALL
         |SELECT doc_id, text, lang, source, 'carry' AS change FROM ex
         |WHERE doc_id NOT IN (SELECT doc_id FROM inc)""".stripMargin,

    // q128: the incremental merge replay — identical change-class logic
    // to q126 but the gated relation is (doc_id, fp, change): the
    // refreshed 60-bit-fingerprint artifact with the audit tags. The
    // oracle MAY scan text (it is a replay); the engine plan may NOT
    // (the artifact-reuse point, pinned by CurationSpec).
    "q128_corpus_merge_incremental" ->
      s"""WITH ex AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
         |inc AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 10 = 0 THEN text || ' updated'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % 2 = 0),
         |exfp AS (SELECT doc_id,
         |                ('0x' || substr($fpSql, 1, 15))::BIGINT AS fp
         |         FROM ex),
         |incfp AS (SELECT doc_id,
         |                 ('0x' || substr($fpSql, 1, 15))::BIGINT AS fp
         |          FROM inc),
         |m AS (
         |  SELECT i.doc_id, i.fp,
         |         CASE WHEN e.fp IS NULL THEN 'insert'
         |              WHEN i.fp = e.fp THEN 'refresh'
         |              ELSE 'rewrite' END AS change
         |  FROM incfp i LEFT JOIN exfp e USING (doc_id))
         |SELECT doc_id, fp, change FROM m
         |UNION ALL
         |SELECT doc_id, fp, 'carry' AS change FROM exfp
         |WHERE doc_id NOT IN (SELECT doc_id FROM inc)""".stripMargin,

    // q143: the time-travel replay — the same three batch definitions,
    // membership at version v = last-delivered fingerprint per doc over
    // the chain prefix (refresh re-deliveries carry the same fp, so
    // "latest version wins" is exactly what the store's delta-feed
    // replay reconstructs)
    "q143_snapshot_asof" ->
      s"""WITH c1 AS (
         |  SELECT doc_id, ('0x' || substr($fpSql, 1, 15))::BIGINT AS fp,
         |         1 AS v
         |  FROM documents WHERE doc_id % 3 <> 2),
         |c2 AS (
         |  SELECT doc_id, ('0x' || substr($fpSql, 1, 15))::BIGINT AS fp,
         |         2 AS v
         |  FROM (SELECT doc_id, text || ' rev2' AS text FROM documents
         |        WHERE doc_id % 5 = 0)),
         |c3 AS (
         |  SELECT doc_id, ('0x' || substr($fpSql, 1, 15))::BIGINT AS fp,
         |         3 AS v
         |  FROM documents WHERE doc_id % 7 = 0),
         |chain AS (
         |  SELECT * FROM c1 UNION ALL SELECT * FROM c2
         |  UNION ALL SELECT * FROM c3),
         |vs AS (SELECT unnest([1, 2, 3]) AS as_of)
         |SELECT CAST(as_of AS BIGINT) AS as_of, doc_id, fp FROM (
         |  SELECT vs.as_of, c.doc_id, c.fp,
         |         row_number() OVER (PARTITION BY vs.as_of, c.doc_id
         |                            ORDER BY c.v DESC) AS rn
         |  FROM vs JOIN chain c ON c.v <= vs.as_of) WHERE rn = 1""".stripMargin,

    // q122: n is generated into the shingle concat chain from
    // Dedup.DecontamShingleN (the q100 interpolate-the-constant rule);
    // zero-shingle pool docs survive via the LEFT JOIN with n_hits 0,
    // mirroring the engine's explode_outer accounting
    "q122_decontamination" -> {
      val n = Dedup.DecontamShingleN
      val cat = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS toks
         |  FROM documents),
         |shn AS (
         |  SELECT doc_id, source,
         |         list_distinct(list_transform(range(1, len(toks) - ${n - 2}),
         |           i -> $cat)) AS sh
         |  FROM toks),
         |b AS (
         |  SELECT DISTINCT ('0x' || substr(md5(s), 1, 15))::BIGINT AS fp
         |  FROM (SELECT unnest(sh) AS s FROM shn
         |        WHERE source = '$DecontamBenchmarkSource')),
         |pd AS (SELECT doc_id, len(sh) AS n_shingles FROM shn
         |       WHERE source <> '$DecontamBenchmarkSource'),
         |pf AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS fp
         |       FROM (SELECT doc_id, unnest(sh) AS s FROM shn
         |             WHERE source <> '$DecontamBenchmarkSource')),
         |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |      FROM pf WHERE fp IN (SELECT fp FROM b) GROUP BY 1)
         |SELECT pd.doc_id, pd.n_shingles,
         |       coalesce(h.n_hits, 0) AS n_hits,
         |       CAST(coalesce(h.n_hits, 0) > 0 AS INT) AS contaminated
         |FROM pd LEFT JOIN h USING (doc_id)""".stripMargin
    },

    // q123: the q118 merge replay grouped to tokenizer economics per
    // source — integer word/piece/char sums, ratios rounded at 4
    "q123_bpe_fertility" -> (learnedBpeMerges match {
      case None =>
        // keyset-stable placeholder (the q118 convention); Verify always
        // overwrites it with the real replay
        "SELECT '' AS source, CAST(0 AS BIGINT) AS n_docs, " +
          "CAST(0 AS BIGINT) AS n_words, CAST(0 AS BIGINT) AS n_pieces, " +
          "0.0 AS fertility, 0.0 AS chars_per_piece WHERE false"
      case Some(merges) =>
        require(merges.forall { case (a, b) => !(a + b).contains("|") },
          "oracle wrap char '|' appears in a learned symbol — switch the replay to chr(1)")
        val folded = merges.foldLeft("regexp_replace(w, '(.)', '|\\1|', 'g')") {
          case (acc, (a, b)) => s"replace($acc, '|$a||$b|', '|$a$b|')"
        }
        s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_words) AS BIGINT) AS n_words,
           |       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
           |       round(sum(n_pieces) / CAST(NULLIF(sum(n_words), 0) AS DOUBLE), 4)
           |         AS fertility,
           |       round(sum(n_chars) / CAST(NULLIF(sum(n_pieces), 0) AS DOUBLE), 4)
           |         AS chars_per_piece
           |FROM (
           |  SELECT source, len(words) AS n_words,
           |         len(flatten(pieces)) AS n_pieces,
           |         coalesce(list_sum(list_transform(flatten(pieces),
           |                                          p -> len(p))), 0) AS n_chars
           |  FROM (
           |    SELECT source, words,
           |           list_transform(words,
           |             w -> string_split(trim($folded, '|'), '||')) AS pieces
           |    FROM (
           |      SELECT source,
           |             list_filter(string_split(lower(text), ' '),
           |                         w -> len(w) > 0) AS words
           |      FROM documents)))
           |GROUP BY 1""".stripMargin
    }),

    // q124: q104's quality, q17's language argmax, q10's normalized-fp
    // dup definition, rolled to one row per source; ratios all derive
    // from integer counts; majority-language argmax replays the q102
    // join-back with (count desc, lang asc) resolution
    "q124_source_datacard" ->
      ("WITH " + datacardOracleBody("documents")),

    // q130: the ingestion chain replayed stage by stage — incoming from
    // the raw table (q110's hash gate already proves the WARC round trip
    // is lossless, so the oracle reads `documents` directly), q53's
    // curation fragment over the incoming relation, the merge's ROW
    // semantics (incoming replaces same-id, rest carries — the change
    // TAGS are q126/q128's gates and don't alter the card), and the
    // EXACT q124 datacard body (shared helper) over the merged corpus
    "q130_ingest_chain" -> ingestChainOracleSql,

    // q137: the IDENTICAL oracle — the steady-state artifact path must
    // reproduce the bootstrap chain's cards bit-for-bit
    "q137_ingest_chain_incremental" -> ingestChainOracleSql,

    // q134: the merge's ROW semantics (q128's split and drift) and the
    // EXACT q124 card body (shared helper) over the merged corpus — the
    // artifact path must equal a from-scratch recompute, so the oracle
    // IS the recompute
    "q134_datacard_incremental" ->
      ("""WITH docs0 AS (SELECT doc_id, source, text FROM documents),
         |incoming AS (
         |  SELECT doc_id, source,
         |         CASE WHEN doc_id % 10 = 0 THEN text || ' updated'
         |              ELSE text END AS text
         |  FROM docs0 WHERE doc_id % 2 = 0),
         |merged AS (
         |  SELECT doc_id, source, text FROM incoming
         |  UNION ALL
         |  SELECT doc_id, source, text FROM docs0
         |  WHERE doc_id % 5 <> 4
         |    AND doc_id NOT IN (SELECT doc_id FROM incoming)),
         |""".stripMargin + datacardOracleBody("merged")),

    // q121: q111's score chain (same weight literals) vs the q104/q18
    // quality label at the labelHeuristic threshold, confusion-counted
    // per q92's split coin; every metric derives from the integer cells
    "q121_classifier_eval" -> {
      val w = graft.operators.QualityModel.DefaultWeights
      val thr = graft.operators.QualityModel.HeuristicLabelThreshold
      val stop = stopCountSql("ltoks", TextAnalysis.StopwordDicts.head._2)
      docCtes.stripSuffix("\n") + ",\n" +
        s"""f AS (
           |  SELECT doc_id,
           |         least(len(toks) / 100.0, 1.0) AS x1,
           |         CASE WHEN length(text) > 0
           |              THEN len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
           |                   / length(text)
           |              ELSE 0.0e0 END AS x2,
           |         least($stop / len(toks) * 5.0, 1.0) AS x3,
           |         round(0.4 * least(len(toks) / 100.0, 1.0)
           |             + 0.3 * (1.0 - len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))
           |                            / NULLIF(length(text), 0))
           |             + 0.3 * least($stop / len(toks) * 5.0, 1.0), 4) AS quality
           |  FROM toks),
           |s AS (
           |  SELECT doc_id,
           |         ${w(0)}e0 * 1.0e0 + ${w(1)}e0 * x1
           |           + ${w(2)}e0 * x2 + ${w(3)}e0 * x3 AS z,
           |         CASE WHEN quality >= ${thr}e0 THEN 1 ELSE 0 END AS y
           |  FROM f),
           |j AS (
           |  SELECT CASE WHEN b < 10 THEN 'test'
           |              WHEN b < 20 THEN 'val'
           |              ELSE 'train' END AS split,
           |         CASE WHEN round(1.0e0 / (1.0e0 + exp(-z)), 4) >= 0.5e0
           |              THEN 1 ELSE 0 END AS accept,
           |         y
           |  FROM (SELECT doc_id, z, y,
           |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100
           |            AS b
           |        FROM s)),
           |c AS (
           |  SELECT split, CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(CASE WHEN accept = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |         CAST(sum(CASE WHEN accept = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |         CAST(sum(CASE WHEN accept = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |         CAST(sum(CASE WHEN accept = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM j GROUP BY 1)
           |SELECT split, n, tp, fp, tn, fn,
           |       round((tp + tn) / CAST(n AS DOUBLE), 4) AS accuracy,
           |       round(tp / CAST(NULLIF(tp + fp, 0) AS DOUBLE), 4) AS precision,
           |       round(tp / CAST(NULLIF(tp + fn, 0) AS DOUBLE), 4) AS recall,
           |       round(2 * tp / CAST(NULLIF(2 * tp + fp + fn, 0) AS DOUBLE), 4)
           |         AS f1
           |FROM c""".stripMargin
    },
  )
}
