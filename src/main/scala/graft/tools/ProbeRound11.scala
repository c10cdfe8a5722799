package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Curation, Dedup, QualityModel}
import graft.sources.Tables

/** Round-11 probes.
  *
  * `weights [sfDir]` — reproduce the [[QualityModel.DefaultWeights]]
  * artifact: train the curated-source logistic on the given corpus
  * (default sf0.01, the artifact's provenance) and print the raw and
  * 6-decimal-rounded weight vectors plus train-set accuracy under the
  * rounded weights.
  *
  * `dag [nDocs]` — the COMPOSED curation pipeline at scale (VERDICT r10
  * #6): per-source quality percentile (q104 shape) → near-dup dedup with
  * keep-best survivors (q11+q52+q102) → token-budget selection (q80) →
  * sequence packing (q77), chained as one program over a synthetic
  * 1 M-doc corpus with variable lengths, sprinkled stopwords, and a 20%
  * near-dup family structure. Per-operator probes exist; this measures
  * the COMPOSITION: shared-scan behavior, cache interplay (every stage
  * handle released as soon as its consumer materializes), and total
  * wall. Each stage materializes into its own persisted relation, so no
  * operator re-derives an upstream stage.
  */
object ProbeRound11 {

  /** Synthetic curation corpus: doc lengths 20-99 words (quality varies),
    * ~1-in-17 words an en-stopword, 4 langs, 10 sources, and 20% of docs
    * in 2-doc near-dup families (pmod 1 docs copy their pmod 0 neighbor
    * with one extra word — high-Jaccard, not exact).
    */
  def syntheticCorpus(spark: SparkSession, rows: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val fam = when(pmod(col("id"), lit(10)) < 2,
      col("id") - pmod(col("id"), lit(10))).otherwise(col("id"))
    val nWords = (pmod(xxhash64(fam, lit(7)), lit(80)) + lit(20)).cast("int")
    val words = sequence(lit(0), nWords).cast("array<int>")
    val body = concat_ws(" ", transform(words, j =>
      when(pmod(xxhash64(fam, j, lit(13)), lit(17)) === 0, lit("the"))
        .otherwise(concat(lit("w"),
          pmod(xxhash64(fam, j, lit(100)), lit(1000))))))
    spark.range(rows).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) === 1,
        concat(body, lit(" extra"))).otherwise(body).as("text"),
      concat(lit("lang"), pmod(xxhash64(col("id"), lit(3)), lit(4))).as("lang"),
      concat(lit("src"), pmod(xxhash64(col("id"), lit(5)), lit(10))).as("source"))
  }
  /** Synthetic event stream: ~66 events/user over 30 days, the five
    * gate event types with uniform mix, deterministic hash-derived
    * timestamps/values (the syntheticCorpus discipline — no RNG state).
    */
  def syntheticEvents(spark: SparkSession, rows: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val baseUs = 1704067200000000L // 2024-01-01 UTC
    val spanUs = 30L * 86400 * 1000000
    val types = array(lit("view"), lit("click"), lit("purchase"),
      lit("signup"), lit("error"))
    spark.range(rows).select(
      col("id").as("event_id"),
      timestamp_micros(lit(baseUs) +
        pmod(xxhash64(col("id"), lit(11)), lit(spanUs))).as("ts"),
      pmod(xxhash64(col("id"), lit(3)), lit(math.max(rows / 66, 1))).as("user_id"),
      element_at(types,
        (pmod(xxhash64(col("id"), lit(7)), lit(5)) + 1).cast("int"))
        .as("event_type"),
      (pmod(xxhash64(col("id"), lit(19)), lit(10000)) / 100.0).as("value"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("graft-probe11")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("weights") match {
      case "weights" =>
        // ADVICE r12: the artifact trains on the TRAIN SPLIT ONLY
        // (content-hash bucket >= 20) — the earlier full-corpus training
        // run made evaluateSplits' `test` row a resubstitution metric at
        // the training SF; excluding the test/val buckets makes it a
        // genuine held-out measurement by construction.
        import org.apache.spark.sql.functions._
        val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
        val docs = Tables.documents(spark, sfDir)
        val trainDocs = docs.filter(Curation.hashBucket(col("doc_id")) >= 20)
        val t0 = System.nanoTime()
        val w = QualityModel.train(trainDocs)
        val dt = (System.nanoTime() - t0) / 1e9
        val rounded = w.map(x =>
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        println(s"TRAIN_SECONDS $dt")
        println("RAW_WEIGHTS " + w.mkString(", "))
        println("ARTIFACT Array(" + rounded.mkString(", ") + ")")
        // per-split accuracy of the ROUNDED artifact — the `test` row is
        // now held out from the training run above
        QualityModel.evaluateSplits(docs, rounded.toSeq)
          .select("split", "n", "accuracy").collect()
          .foreach(r => println(s"ACCURACY ${r.getString(0)} n=${r.getLong(1)} " +
            s"acc=${r.getDouble(2)}"))
      case "dag" =>
        import org.apache.spark.sql.functions._
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
        val disk = org.apache.spark.storage.StorageLevel.DISK_ONLY
        val docs = syntheticCorpus(spark, n).persist(disk)
        println(s"CORPUS ${docs.count()} docs")
        val tAll = System.nanoTime()
        def stage[T](name: String)(f: => (Long, T)): T = {
          val t0 = System.nanoTime()
          val (rows, out) = f
          println(f"STAGE $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.1f")
          out
        }
        // 1: per-source percentile, keep the top half of each source
        val kept = stage("percentile_keep") {
          val ps = Curation.qualityPercentileStage(docs)
          val k = docs.join(ps.result.filter(col("pctl") >= 0.5)
            .select("doc_id"), "doc_id").persist(disk)
          val rows = k.count()
          ps.unpersist()
          (rows, k)
        }
        // 2: near-dup dedup, keep-best survivor per cluster
        val deduped = stage("dedup_survivors") {
          val st = Dedup.minhashNearDupsStage(kept, threshold = 0.5)
          val labels = Dedup.nearDupClusters(st.result)
          val surv = Dedup.clusterSurvivors(labels, kept)
          val drop = labels.join(
            surv.select(col("survivor_id").as("doc_id")),
            Seq("doc_id"), "left_anti").select("doc_id")
          val d = kept.join(drop, Seq("doc_id"), "left_anti").persist(disk)
          val rows = d.count()
          st.unpersist(); Dedup.releaseClusters(labels)
          (rows, d)
        }
        // 3: token budget — half the deduped corpus's tokens
        val selected = stage("token_budget") {
          val total = deduped
            .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
          val bs = Curation.budgetStage(deduped, total / 2)
          val s = deduped.join(bs.result.select("doc_id"), "doc_id")
            .persist(disk)
          val rows = s.count()
          bs.unpersist()
          (rows, s)
        }
        // 4: sequence packing
        stage("packing") {
          val pk = Curation.packStage(selected, ctxTokens = 256)
          val rows = pk.result.count()
          pk.unpersist()
          (rows, ())
        }
        println(f"TOTAL sec=${(System.nanoTime() - tAll) / 1e9}%.1f")
        println("CACHED_RDDS_LEFT " +
          (spark.sparkContext.getPersistentRDDs.size - 4)) // docs+3 stages
      case "warc" =>
        import org.apache.spark.sql.functions._
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
        val docs = syntheticCorpus(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        docs.count()
        val dir = java.nio.file.Files.createTempDirectory("warc_probe_").toString
        val t0 = System.nanoTime()
        graft.sources.Warc.writeWarc(docs, dir, shards = 32)
        val tw = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val back = graft.sources.Warc.readWarc(spark, dir)
        val (cnt, bytes) = {
          val r = back.agg(count(lit(1)), sum(octet_length(col("text")))).head()
          (r.getLong(0), r.getLong(1))
        }
        val tr = (System.nanoTime() - t1) / 1e9
        println(f"WARC write=$tw%.1fs read+agg=$tr%.1fs rows=$cnt " +
          f"payloadMB=${bytes / 1e6}%.0f readMBps=${bytes / 1e6 / tr}%.0f")
      case "score" =>
        import org.apache.spark.sql.functions._
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
        val docs = syntheticCorpus(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        docs.count()
        val t0 = System.nanoTime()
        // aggregate over the scored columns so ColumnPruning can't skip
        // the projection (the ProbeCuration pitfall)
        val r = QualityModel.scoreDocs(docs)
          .agg(sum(col("p_good")), sum(col("accept"))).head()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SCORE docs=$n sec=$dt%.1f docsPerSec=${n / dt}%.0f " +
          f"acceptShare=${r.getLong(1).toDouble / n}%.3f")
      case "lsh" =>
        import org.apache.spark.sql.functions._
        // does the calibration SUPERSET (signatures riding the verify
        // joins + k equality terms) cost anything at scale vs the plain
        // pair stage? Decides whether production pair consumers should
        // prefer minhashNearDupsStage when no memo is in play.
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
        val docs = syntheticCorpus(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        docs.count()
        def time(name: String)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          println(f"LSH $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        }
        time("pair_stage") {
          val st = Dedup.minhashNearDupsStage(docs, threshold = 0.5)
          val c = st.result.count(); st.unpersist(); c
        }
        time("calib_stage") {
          val st = Dedup.minhashCalibrationStage(docs)
          val c = st.result.count(); st.unpersist(); c
        }
        time("calib_stage_filtered") {
          val st = Dedup.minhashCalibrationStage(docs)
          val c = Dedup.pairsFromCalibration(st.result, 0.5).count()
          st.unpersist(); c
        }
      case "events" =>
        import org.apache.spark.sql.functions._
        // funnel + cohort retention at event scale: both operators' only
        // corpus-sized shuffles key on user_id / (user, day)
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(10000000L)
        val ev = syntheticEvents(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        println(s"EVENTS ${ev.count()} rows, " +
          s"${ev.select("user_id").distinct().count()} users")
        def time(name: String)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          println(f"EVENTS $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        }
        time("funnel")(graft.operators.EventAnalytics.funnel(ev).count())
        time("cohorts")(
          graft.operators.EventAnalytics.retentionCohorts(ev).count())
      case "dsir" =>
        import org.apache.spark.sql.functions._
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
        val docs = syntheticCorpus(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        docs.count()
        val t0 = System.nanoTime()
        val st = Curation.importanceStage(docs, targetSource = "src0")
        val rows = st.result.count()
        val dt = (System.nanoTime() - t0) / 1e9
        st.unpersist()
        println(f"DSIR docs=$n selected=$rows sec=$dt%.1f " +
          f"docsPerSec=${n / dt}%.0f")
      case "similar" =>
        import org.apache.spark.sql.functions._
        // incremental cost of the top-k rank over an existing pair feed
        val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
        val docs = syntheticCorpus(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        docs.count()
        val st = Dedup.minhashNearDupsStage(docs, threshold = 0.5)
        val pairs = st.result
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        println(s"SIMILAR pairs=${pairs.count()}")
        val t0 = System.nanoTime()
        val rows = Dedup.similarTopK(pairs).count()
        println(f"SIMILAR topk_rows=$rows " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        st.unpersist(); pairs.unpersist()
      case other =>
        System.err.println(s"unknown probe '$other'")
    }
    spark.stop()
  }
}
