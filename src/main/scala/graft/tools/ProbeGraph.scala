package graft.tools

import org.apache.spark.sql.functions._

/** Probe: fixed-point PageRank beyond the 500-doc gate SF — a synthetic
  * web-ish graph (each node links to 3 closed-form neighbors, so the
  * whole edge relation is generated, never shuffled in).
  *
  * Recorded (2026-08-15, local[32]):
  *   pagerank_2M_nodes_6M_edges_3it   15.3 s  (first timed run — pays
  *                                    codegen for the whole chain)
  *   pagerank_2M_nodes_6M_edges_6it   14.3 s  (6 warm iterations cost no
  *                                    more than 3 cold ones: at this size
  *                                    the fixed edge-shuffle dominates the
  *                                    per-iteration Pregel step — 3
  *                                    equi-shuffles of 16-byte rows each)
  * The closed-form graph is REGULAR (outdeg 3 everywhere), so ranks stay
  * uniform and total_pr pins the arithmetic: 2 M × (150000 + 849999) —
  * each node's inbound sum is 999999·85//100 after the div-truncation,
  * exactly what the fixed-point recurrence predicts.
  *
  * 10 M nodes / 30 M edges (same session): 3 iters 24.1 s, 6 iters
  * 29.2 s — 5× the data for ~1.6–2× the wall at 3 iters (fixed costs
  * amortizing), total_pr = 10 M × 999999 exact again.
  * At 100 TB the rank/edge relations hash-partition by id; nothing in
  * the plan is driver-sided or quadratic. Lineage grows linearly with
  * iterations — localCheckpoint every ~10 rounds for deep runs (the BPE
  * trainer's discipline).
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-graph").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE graph $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    if (args.headOption.contains("triangle")) {
      // near-dup-shaped pair graph: 2 M nodes in 400 k clusters of 5
      // (pairwise connected → 10 C(5,3) = 4 M planted triangles) plus
      // 100 boilerplate HUBS of degree 10,000 — the skew case the
      // degree-ordered orientation exists for: every hub edge orients
      // INTO the hub (it is the max-degree endpoint), so hubs generate
      // ZERO forward wedges instead of deg² ≈ 10⁸ each
      val n = if (args.length > 1) args(1).toLong else 2000000L
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
      time(s"triangles_${n / 1000000}M_nodes_hub10k") {
        val r = graft.operators.Graph.triangleStats(pairs)
          .agg(sum(col("n_tri")), max(col("degree")), count(lit(1))).head()
        println(s"  tri_total=${r.getLong(0) / 3} max_deg=${r.getLong(1)}" +
          s" nodes=${r.getLong(2)}")
      }
      spark.stop(); return
    }
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val nodes = spark.range(n).select(col("id"))
    val edges = spark.range(n).select(col("id").as("src"),
        explode(array((1 to 3).map(j =>
          (col("id") * 31 + j * 1009) % n): _*)).as("dst"))
    for (iters <- Seq(3, 6)) {
      time(s"pagerank_${n / 1000000}M_nodes_${3 * n / 1000000}M_edges_${iters}it") {
        val r = graft.operators.Graph.pageRankIntScaled(nodes, edges, iters)
          .agg(sum(col("pr")), count(lit(1))).head()
        println(s"  total_pr=${r.getLong(0)} nodes=${r.getLong(1)}")
      }
    }
    spark.stop()
  }
}
