package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Skew probe for the symmetric-shuffle IVF family (q155 `knnJoin`,
  * q184 `hardNegatives`): `Similarity.scala` CLAIMS "a viral cell
  * (similarity-defined skew) is an AQE skew-join split, not a straggler
  * by construction" — this probe measures that claim instead of arguing
  * it.
  *
  * Setup: a synthetic corpus whose cluster structure is EXACTLY known
  * (cluster centers are hash-derived, so the probe hands the true
  * centers to the model — no k-means fit noise in the measurement), with
  * one deliberately viral cell: cluster 0 holds `viralN` vectors while
  * the remaining vectors spread uniformly over the other cells. Both
  * operators shuffle the corpus hash-partitioned BY CELL, so the viral
  * cell's partition is the straggler candidate: its task must join
  * |viral| corpus rows against every query probing that cell, while the
  * median task handles ~|corpus|/cells.
  *
  * Each workload runs twice on identical data and plans:
  * `spark.sql.adaptive.skewJoin.enabled` false, then true. Recorded per
  * run: wall seconds, join-stage task count, max/p50/p95 task seconds,
  * and whether the executed plan carries a `skew=true` SMJ. The claim
  * holds iff the ON run splits the viral partition (more tasks, max/p50
  * collapses toward 1) and wall time drops accordingly.
  *
  * Skew thresholds are scaled to probe bytes (the viral partition is
  * ~20 MB here vs 256 MB default threshold; at 100 TB the same RATIO of
  * viral-to-median trips the defaults): factor stays at the default 5 —
  * only the absolute byte floors shrink. Broadcast is disabled because
  * the plan under test is the corpus×corpus symmetric shuffle — the
  * probe's bounded query side exists only to bound probe cost; a
  * broadcastable query side would take `ivfTopKMultiProbeModel`'s
  * broadcast path instead and has no skew question at all.
  *
  * Run: `sbt "runMain graft.tools.ProbeSkewIvf [corpusN] [hnN]"`.
  * Results recorded in SURVEY.md (round-16 probe table).
  */
object ProbeSkewIvf {

  /** Successful-task durations (ms), drained between runs. Listener-bus
    * delivery is async; [[drain]] sleeps briefly before reading.
    */
  private final class TaskStats extends SparkListener {
    // boxed Long: poll() signals empty with null, and a scala.Long-typed
    // queue would auto-unbox that null to 0L — making the null check
    // vacuous and the drain loop unbounded
    private val durs =
      new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskInfo.successful)
        durs.add(t.taskInfo.duration)
    def drain(): Seq[Long] = {
      Thread.sleep(1500) // let the async listener bus flush
      val out = Seq.newBuilder[Long]
      var d = durs.poll()
      while (d ne null) { out += d.longValue; d = durs.poll() }
      out.result()
    }
  }

  /** Deterministic corpus: cluster centers `center_j(cl) =
    * (hash(cl, j) mod 1000)/1000`, per-vector noise two orders below the
    * inter-center distance so the nearest centroid is always the own
    * cluster — the probe's cell assignment is exact by construction.
    */
  private def corpus(spark: SparkSession, n: Long, viralN: Long,
                     nClusters: Int, dim: Int): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      when(col("id") < viralN, 0)
        .otherwise(pmod(hash(col("id")), lit(nClusters - 1)) + 1)
        .cast("int").as("cl"))
      .select(col("vec_id"), col("cl"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(hash(col("cl"), j), lit(1000)) / lit(1000.0) +
            pmod(hash(col("vec_id"), j), lit(100)) / lit(20000.0))
            .cast("float")).as("embedding"),
        pmod(hash(col("vec_id") * 31), lit(97)).cast("long").as("label"))

  /** The true centers, computed by the same expressions as [[corpus]]
    * (same Murmur3 on the same int types — bit-identical).
    */
  private def trueCenters(spark: SparkSession, nClusters: Int,
                          dim: Int): Array[Seq[Double]] =
    spark.range(nClusters).select(col("id").cast("int").as("cl"))
      .select(col("cl"), transform(sequence(lit(0), lit(dim - 1)), j =>
        pmod(hash(col("cl"), j), lit(1000)) / lit(1000.0)).as("c"))
      .orderBy(col("cl")).collect().map(_.getSeq[Double](1))

  def main(args: Array[String]): Unit = {
    val corpusN = if (args.length > 0) args(0).toLong else 10000000L
    val hnN = if (args.length > 1) args(1).toLong else 500000L
    val dim = 32

    val spark = graft.Engine.builder("probe-skew-ivf").master("local[32]")
      // 256 (not 32): one-ish cells per shuffle partition makes the viral
      // partition's byte skew visible to AQE at probe scale; AQE coalesces
      // the small ones back, so the OFF/ON comparison is not distorted
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_skew_")
      .toString
    println("CHECKPOINT session up")

    def pct(xs: Seq[Long], p: Double): Double =
      if (xs.isEmpty) 0.0
      else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt)) / 1e3

    def run(name: String, split: Boolean)(df: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", split.toString)
      stats.drain()
      // count through groupBy().count() so the final ADAPTIVE plan of the
      // executed query stays inspectable (df.count() plans a separate
      // query whose execution the caller's df never sees)
      val cdf = df.groupBy().count()
      val t0 = System.nanoTime()
      val rows = cdf.collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val tasks = stats.drain()
      val mx = pct(tasks, 1.0); val p50 = pct(tasks, 0.5)
      // ShuffledJoin.nodeName appends "(skew=true)" when AQE split it
      val skewed =
        cdf.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"PROBE skew-ivf $name%-22s split=$split%-5s rows=$rows%,d " +
        f"wall=$wall%7.1fs tasks=${tasks.size}%5d max=$mx%7.1fs " +
        f"p95=${pct(tasks, 0.95)}%6.1fs p50=$p50%5.2fs " +
        f"spread=${if (p50 > 0) mx / p50 else 0.0}%5.1fx skewPlan=$skewed")
    }

    // ---- q155 shape: bounded query sample × corpusN-corpus knnJoin ------
    // viral cell = 2% of the corpus (~11× the median cell ≈ 30 MB of
    // shuffled embeddings at 10 M × dim 32 vs a ~5 MB median partition)
    val nCells = 512
    // hash-scatter before writing: spark.range emits ids in order, so the
    // viral cluster (ids < viralN) would land CONTIGUOUSLY in one parquet
    // file — and AQE skew-split works at map-output-block granularity, so
    // a viral cell fed by a single map block is UNSPLITTABLE (measured:
    // split fired, +1 task, 370 s straggler unchanged). This scattered
    // layout is the r16 baseline scenario; the sorted-ingest scenario
    // below writes WITHOUT the scatter and measures knnJoin's own
    // `scatter` guard closing exactly that hole in-engine.
    corpus(spark, corpusN, corpusN / 50, nCells, dim)
      .repartition(128, col("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/corpus")
    println("CHECKPOINT corpus written")
    val knnModel = Similarity.KmeansModel(
      trueCenters(spark, nCells, dim), null)
    def corpusDf = spark.read.parquet(s"$tmp/corpus")
    // uniform 1-in-200 query sample: viral share of queries = viral share
    // of the corpus, so the viral cell sees proportionally viral queries
    def queries = corpusDf.filter(pmod(col("vec_id"), lit(200)) === 0)

    // byte floors scaled to this workload's shuffle (viral ~30 MB, median
    // ~5 MB partition at default factor 5)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")

    // untimed warmup at 1/100 scale: JIT + codegen for the exact plan
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    Similarity.knnJoin(queries.limit(1000), corpusDf.limit(100000),
      knnModel, 10, 2).count()
    println("CHECKPOINT knn warmup done")

    // scatter=false here: these two runs measure AQE alone on
    // hash-scattered STORAGE (the r16 baseline scenario); the engine
    // guard gets its own sorted-ingest scenario below
    for (split <- Seq(false, true))
      run("knnJoin(q155)", split)(
        Similarity.knnJoin(queries, corpusDf, knnModel, k = 10, nProbe = 2,
          scatter = false))

    // ---- sorted-ingest scenario: the r16 caveat, then the engine guard -
    // written WITHOUT the vec_id scatter: spark.range emits ids in order,
    // so the viral cluster (ids < viralN = 2%) lands contiguously in the
    // first range partition's parquet output — ONE map block feeds the
    // viral reduce partition, and AQE's map-block-granularity split has
    // no cut points (r16 measured: split fired, +1 task, straggler
    // unchanged). scatter=true is knnJoin's in-engine fix: a uniform
    // hash(vec_id) exchange ahead of the cell join gives the split its
    // cut points regardless of storage layout.
    corpus(spark, corpusN, corpusN / 50, nCells, dim)
      .write.mode("overwrite").parquet(s"$tmp/corpus_sorted")
    println("CHECKPOINT sorted corpus written")
    def sortedDf = spark.read.parquet(s"$tmp/corpus_sorted")
    def sortedQ = sortedDf.filter(pmod(col("vec_id"), lit(200)) === 0)
    for (sc <- Seq(false, true))
      run(s"knnJoin(sorted,sc=$sc)", split = true)(
        Similarity.knnJoin(sortedQ, sortedDf, knnModel, k = 10, nProbe = 2,
          scatter = sc))

    // ---- q184 shape: self-join hardNegatives ---------------------------
    // quadratic-in-cell workload: viral cell = 3% of the corpus (~8× the
    // median cell → ~64× the median cell's PAIR count; labels are
    // geometry-independent, so the label-mismatch filter keeps ~99% of
    // viral-cell candidates paying the full cosine)
    val hnCells = 256
    corpus(spark, hnN, hnN * 3 / 100, hnCells, dim)
      .repartition(128, col("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/hn")
    val hnModel = Similarity.KmeansModel(
      trueCenters(spark, hnCells, dim), null)
    def hnDf = spark.read.parquet(s"$tmp/hn")

    // the hn corpus is smaller, so re-floor the byte thresholds to ITS
    // shuffle (viral ~2 MB vs ~300 KB median partition): the skew is
    // quadratic in MATCHES while AQE sees only partition BYTES, so the
    // byte floor must sit between median and viral for detection to
    // trigger at probe scale — at production bytes the default floors
    // sit in the same ratio window
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    Similarity.hardNegatives(hnDf.limit(50000), hnModel, 10, 2).count()
    println("CHECKPOINT hn warmup done")

    for (split <- Seq(false, true))
      run("hardNegatives(q184)", split)(
        Similarity.hardNegatives(hnDf, hnModel, k = 10, nProbe = 2,
          scatter = false))

    spark.stop()
  }
}
