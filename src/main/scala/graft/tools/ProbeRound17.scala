package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Sketches, TimeSeries}

/** Round-17 probe: the session's four new operators priced at 1 M–10 M
  * rows — the scales where interpreted hot spots and accidental
  * quadratics show up that the sf0.1 bench cannot surface.
  *
  * 1. k-core peeling (q167) on the 2 M-node near-dup-shaped graph (400 k
  *    K5 clusters + 100 degree-10k boilerplate hubs — the ProbeGraph
  *    triangle fixture): per-round cost is 3 equi-shuffles of shrinking
  *    16-byte edges; the hub cascade exercises multi-round peel depth.
  * 2. EWMA recurrence (q169) at 10 M events / 100 k keys: one shuffle +
  *    per-partition fold; throughput should be scan-bound.
  * 3. Quantile sketch (q168) at 10 M values / 8 groups: the build is one
  *    map-side-combining aggregate to ≤ ~1.9k rows per group; extraction
  *    is sketch-sized.
  * 4. Containment join (q170) at 10 k needles × 1 M docs (the
  *    contamination-audit shape): needle prefixes probe the corpus
  *    index; planted fragments (needle = first half of one corpus doc)
  *    must all surface at containment 1.0.
  *
  * Recorded (2026-08-15, local[32]): see the SURVEY.md round-16 additions
  * table.
  */
object ProbeRound17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-round17").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r17 $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val which = if (args.length > 0) args(0) else "all"

    if (which == "all" || which == "kcore") {
      val n = 2000000L
      val pos = col("id") % 5
      val clusterPairs = spark.range(n).select(col("id").as("id_a"),
          explode(when(pos < 4, sequence(lit(1L), lit(4L) - pos))
            .otherwise(array().cast("array<bigint>"))).as("dj"))
        .select(col("id_a"), (col("id_a") + col("dj")).as("id_b"))
      val hubPairs = spark.range(100).select((col("id") + n).as("hub"),
          explode(sequence(lit(0), lit(9999))).as("k"))
        .select((((col("hub") - n) * 19997 + col("k") * 199) % n)
          .as("id_a"), col("hub").as("id_b"))
      val pairs = clusterPairs.unionByName(hubPairs)
      // k=3 keeps everything (K5 degree 4); k=5 dissolves the graph in a
      // cascade (clusters round 1, orphaned spokes round 2, hubs round 3)
      // — the all-edges-churn worst case for the per-round shuffles
      for (k <- Seq(3, 5)) {
        time(s"kcore_k${k}_2M_nodes_hub10k") {
          val r = Graph.kCorePeel(pairs, k, rounds = 8)
            .agg(count(lit(1)),
              coalesce(sum(col("core_deg")), lit(0L))).head()
          println(s"  survivors=${r.getLong(0)} deg_sum=${r.getLong(1)}")
        }
      }
    }

    if (which == "all" || which == "orjoin") {
      // DisjunctiveJoinRewrite A/B (the ProbeRewrite discipline): two
      // linkage keys with ~n/1000-sized match classes, so output stays
      // ~2n²/1000 and both legs price the JOIN MACHINERY
      import org.apache.spark.sql.DataFrame
      def rel(n: Long, pfx: String): DataFrame =
        spark.range(n).select(col("id").as(s"id_$pfx"),
          (xxhash64(col("id"), lit(1)) % 1000).as(s"k1_$pfx"),
          (xxhash64(col("id"), lit(2)) % 1000).as(s"k2_$pfx"))
      def q(n: Long): DataFrame =
        rel(n, "a").join(rel(n, "b"),
          col("k1_a") === col("k1_b") || col("k2_a") === col("k2_b"))
          .agg(count(lit(1)).as("pairs"))
      val key = "spark.graft.orJoinRewrite.enabled"
      q(10000L).head() // warm both code paths
      spark.conf.set(key, "false"); q(10000L).head()
      spark.conf.set(key, "true")
      for (n <- Seq(50000L, 100000L)) {
        spark.conf.set(key, "false")
        time(s"orjoin_naive_${n / 1000}k") {
          println("  pairs=" + q(n).head().getLong(0))
        }
        spark.conf.set(key, "true")
        time(s"orjoin_rewritten_${n / 1000}k") {
          println("  pairs=" + q(n).head().getLong(0))
        }
      }
      time("orjoin_rewritten_1M") {
        println("  pairs=" + q(1000000L).head().getLong(0))
      }
    }

    if (which == "all" || which == "lpa") {
      // same cluster+hub graph as kcore: 4 voting rounds, hub votes
      // collapse map-side (the no-window claim under real skew)
      val n = 2000000L
      val pos = col("id") % 5
      val clusterPairs = spark.range(n).select(col("id").as("id_a"),
          explode(when(pos < 4, sequence(lit(1L), lit(4L) - pos))
            .otherwise(array().cast("array<bigint>"))).as("dj"))
        .select(col("id_a"), (col("id_a") + col("dj")).as("id_b"))
      val hubPairs = spark.range(100).select((col("id") + n).as("hub"),
          explode(sequence(lit(0), lit(9999))).as("k"))
        .select((((col("hub") - n) * 19997 + col("k") * 199) % n)
          .as("id_a"), col("hub").as("id_b"))
      val pairs = clusterPairs.unionByName(hubPairs)
      time("lpa_4rounds_2M_nodes_hub10k") {
        val r = graft.operators.Graph.labelPropagation(pairs, 4)
          .agg(countDistinct(col("community")), count(lit(1))).head()
        println(s"  communities=${r.getLong(0)} nodes=${r.getLong(1)}")
      }
    }

    if (which == "all" || which == "ewma") {
      // noisy-but-mostly-smooth series: hash noise in [0,200) so the
      // deviation bands stay live and a real fraction of rows flags
      val rows = spark.range(10000000L).select(
        (col("id") % 100000).as("k"),
        timestamp_seconds(lit(1700000000L) + col("id") / 100000).as("t"),
        col("id").as("i"),
        (abs(xxhash64(col("id"))) % 200).as("x"))
      time("ewma_10M_rows_100k_keys") {
        val r = TimeSeries.ewmaAnomaly(rows, "k", "t", "i", col("x"))
          .agg(count(lit(1)), sum(col("is_anomaly").cast("long"))).head()
        println(s"  rows=${r.getLong(0)} anomalies=${r.getLong(1)}")
      }
    }

    if (which == "all" || which == "qsketch") {
      // designed regime: non-negative values → structurally bounded sketch
      val rows = spark.range(10000000L).select(
        (col("id") % 8).cast("string").as("g"),
        (abs(xxhash64(col("id"))) % 1000000000L).as("v"))
      time("qsketch_build_10M_rows") {
        val sk = Sketches.qsketchBuckets(rows, col("g"), col("v"))
        println("  sketch_rows=" + sk.count())
      }
      time("qsketch_build_plus_quantiles_10M_rows") {
        val est = Sketches.qsketchQuantiles(
          Sketches.qsketchBuckets(rows, col("g"), col("v")),
          Seq(1 -> 2, 9 -> 10, 99 -> 100))
        println("  estimates=" + est.count())
      }
      // documented fallback: a negative-heavy stream degrades to exact
      // singleton bins — linear rows, not an error (and still correct)
      val neg = spark.range(10000000L).select(
        (col("id") % 8).cast("string").as("g"),
        (xxhash64(col("id")) % 1000000000L).as("v"))
      time("qsketch_build_10M_rows_half_negative_fallback") {
        println("  sketch_rows=" +
          Sketches.qsketchBuckets(neg, col("g"), col("v")).count())
      }
    }

    if (which == "all" || which == "containment") {
      // 1 M corpus docs, 50 words over a 100 k vocab (rare-shingle crawl
      // regime); 10 k needles = first 25 words of every 100th doc
      val n = 1000000L
      val words = (0 until 50).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(100000))))
      val corpus = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", words: _*).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      corpus.count()
      val needleWords = (0 until 25).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id") * 100, lit(j)), lit(100000))))
      val needles = spark.range(10000).select((col("id") + n).as("doc_id"),
        concat_ws(" ", needleWords: _*).as("text"))
      time("containment_10k_needles_x_1M_docs") {
        val st = Dedup.containmentJoinAgainstCorpusStage(corpus, needles, 0.8)
        val r = st.result.agg(count(lit(1)),
          sum((col("containment") >= 0.999).cast("long"))).head()
        println(s"  pairs=${r.getLong(0)} exact_hits=${r.getLong(1)}")
        st.unpersist()
      }
      corpus.unpersist()
    }

    spark.stop()
  }
}
