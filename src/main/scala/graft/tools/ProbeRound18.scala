package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Stats, Validation}

/** Round-18 probe: the session's new operator families priced at
  * 10 M–100 M rows — reconciliation, grouped statistics, summary
  * maintenance, and the attribution fold.
  *
  * 1. tableDiff (q182) on two 10 M-row / 3-column tables with a sparse
  *    planted diff (1 k changed + 1 k dropped + 1 k inserted): stage 1
  *    is two scans collapsing to 1024-bucket fingerprints; stage 2 must
  *    touch only the ~3k dirty buckets' slice. Also probed at ZERO
  *    diff (the common "verify the backfill" case: stage 2 input is
  *    empty — the whole answer is the two fingerprint scans).
  * 2. robustOutliers (q186) at 10 M rows / 8 groups with 1% planted
  *    contamination: histogram-bounded medians (value domain ~50k
  *    cents), windows over the histogram only.
  * 3. groupedTrend (q180) + rocAuc-core arithmetic shape at 10 M rows:
  *    one map-side-combining aggregate each; throughput should be
  *    scan-bound (the decimal sums are the only cost over a plain sum).
  * 4. attribution (q187) at 10 M events / 100 k users: one shuffle +
  *    per-partition fold, O(1) state — the q169/q178 discipline.
  *
  * Recorded (2026-08-15, local[32]): see the SURVEY.md round-18
  * additions table.
  */
object ProbeRound18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-round18").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r18 $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val which = if (args.length > 0) args(0) else "all"

    if (which == "all" || which == "tablediff") {
      val n = 10000000L
      def base = spark.range(n).select(col("id").as("k"),
        (col("id") % 9973).as("v1"),
        concat(lit("s"), (col("id") % 811).cast("string")).as("v2"))
      // planted sparse diff: 1k changed, 1k dropped, 1k fresh inserts
      val mutated = base.filter(col("k") % 9973 =!= 0)
        .withColumn("v1",
          when(col("k") % 10007 === 1, col("v1") + 1).otherwise(col("v1")))
        .unionByName(spark.range(1000).select((col("id") + n).as("k"),
          col("id").as("v1"), lit("new").as("v2")))
      val sparse = time("tablediff_10M_sparse3k") {
        Validation.tableDiff(base, mutated, "k", Seq("v1", "v2"))
          .groupBy(col("status")).agg(count(lit(1)).as("n")).collect()
      }
      println("PROBE r18 tablediff_statuses " + sparse.map(r =>
        s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))
      time("tablediff_10M_identical") {
        val d = Validation.tableDiff(base, base, "k", Seq("v1", "v2")).count()
        require(d == 0L, s"identical tables must diff empty, got $d")
      }
    }

    if (which == "all" || which == "stats") {
      val n = 10000000L
      def rows = spark.range(n).select(
        concat(lit("g"), (col("id") % 8).cast("string")).as("g"),
        timestamp_seconds(lit(Stats.TrendEpochOrigin) + col("id") % 31536000)
          .as("ts"),
        // 1% planted contamination at 100x magnitude
        when(col("id") % 100 === 7, (col("id") % 499 + 50000).cast("double"))
          .otherwise((col("id") % 499).cast("double") / 10.0).as("v"))
      time("robust_outliers_10M_8g") {
        val r = Stats.robustOutliers(rows, col("g"), col("v"))
          .agg(sum(col("n_outliers"))).head().getLong(0)
        require(r >= n / 100 * 9 / 10, s"planted outliers missed: $r")
      }
      time("grouped_trend_10M_8g") {
        val r = Stats.groupedTrend(rows, col("g"), col("ts"), col("v"))
          .collect()
        require(r.length == 8 && r.forall(!_.isNullAt(2)))
      }
    }

    if (which == "all" || which == "mvdelta") {
      // the incremental-artifact claim: applying a 100k delta to a
      // STORED summary must price like the delta, not like the corpus
      val n = 100000000L
      val root = java.nio.file.Files
        .createTempDirectory("graft_probe_mv_").toString
      def rows(from: Long, cnt: Long) = spark.range(from, from + cnt)
        .select(concat(lit("s"), (col("id") % 40).cast("string")).as("g"),
          concat(lit("l"), (col("id") % 5).cast("string")).as("l"),
          (col("id") % 997).as("x"), col("id").as("k"))
      def summarize(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("g"), col("l")).agg(count(lit(1)).as("cnt"),
          sum(col("x")).as("sum_x"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
      rows(0, n).write.mode("overwrite").parquet(s"$root/base")
      summarize(spark.read.parquet(s"$root/base"))
        .write.mode("overwrite").parquet(s"$root/summary")
      rows(n, 100000).write.mode("overwrite").parquet(s"$root/delta")
      time("mv_delta_apply_100M_base_100k_delta") {
        graft.operators.Relational.summaryApplyDelta(
          spark.read.parquet(s"$root/summary"),
          spark.read.parquet(s"$root/delta"),
          Seq("g", "l"), "cnt", Map("x" -> "sum_x"),
          Map("k" -> "min_k"), Map("k" -> "max_k")).collect()
      }
      time("mv_recompute_100M") {
        summarize(spark.read.parquet(s"$root/base")
          .unionByName(spark.read.parquet(s"$root/delta"))).collect()
      }
    }

    if (which == "all" || which == "attribution") {
      val n = 10000000L
      val types = array(lit("view"), lit("click"), lit("signup"),
        lit("purchase"), lit("error"))
      val events = spark.range(n).select(col("id").as("event_id"),
        timestamp_seconds(lit(1704067200L) + col("id") / 100).as("ts"),
        (col("id") % 100000).as("user_id"),
        element_at(types, (pmod(xxhash64(col("id")), lit(5)) + 1)
          .cast("int")).as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      time("attribution_10M_100k_users") {
        val out = EventAnalytics.attribution(events).collect()
        val total = out.map(_.getLong(1)).sum
        require(total > 0, "no conversions credited")
        println("PROBE r18 attribution_rows " + out.map(r =>
          s"${r.getString(0)}=${r.getLong(1)}/${r.getLong(2)}")
          .sorted.mkString(" "))
      }
    }

    spark.stop()
  }
}
