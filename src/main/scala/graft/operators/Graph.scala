package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over similarity graphs — the centrality companion to
  * the q52 connected-components labeling (reference: n/a — the reference
  * is telemetry-only; this serves the LLM-pipeline brief's dedup
  * governance: pick the most/least central member of a duplicate
  * cluster, rank boilerplate hubs).
  *
  * Why INTEGER-scaled PageRank: floating-point PageRank is not
  * replayable across engines — per-node inbound sums run in partition
  * order, and iteration compounds the reassociation error, so a DuckDB
  * oracle would drift from Spark in the low bits and a hash gate could
  * never pin it. With ranks carried as integer micro-units (scale 10⁶)
  * and every step an integer multiply/divide, BOTH engines compute the
  * identical number regardless of summation order — the BPE-oracle
  * discipline applied to graph iteration. Truncation replaces the
  * analytic damping formula's low bits; the measured effect at scale 10⁶
  * is < 1e-4 relative, far inside ranking noise, and the determinism is
  * what buys the end-to-end gate (q152).
  *
  * Scale shape: each iteration is (edges ⋈ ranks on src) → groupBy dst
  * sum → (nodes left-⋈ sums): three hash-partitioned equi-shuffles, the
  * Pregel message-passing shape. Ranks and contributions are 16-byte
  * rows; no text, no arrays, no windows. Contributions combine map-side
  * (sum of longs). Isolated nodes ride the left join at base rank. The
  * plan grows LINEARLY in iterations (each rank feeds the next exactly
  * once); past ~10 iterations localCheckpoint the rank relation to cap
  * lineage, as the BPE trainer does per 25 rounds.
  *
  * Dangling nodes (outdeg 0) leak their damped mass — the classic
  * simplified PageRank; acceptable for centrality RANKING (all ranks
  * shrink by the same leaked mass) and what keeps every step a pure
  * equi-join (redistributing dangling mass needs a global scalar per
  * iteration — a one-row broadcast, deliberately omitted; callers that
  * need stochastic-matrix PageRank can add it without changing the
  * join shape).
  */
object Graph {

  /** Fixed-point PageRank. `nodes`: one column `id` (long); `edges`:
    * `src`, `dst` (long, directed, duplicates allowed — a repeated edge
    * contributes twice, matching the multigraph reading). Returns
    * (id, pr) with pr in micro-units: pr₀ = scale; prₙ = base +
    * (dampNum · Σ inbound(prₙ₋₁ div outdeg)) div dampDen, all integer.
    */
  def pageRankIntScaled(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outdeg, "src")
    val base = scale * (dampDen - dampNum) / dampDen // driver-side constant
    var rank = nodes.select(col("id"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e.join(rank.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
      val inSum = contrib.groupBy("id").agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(inSum, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(in_sum, " +
            s"CAST(0 AS BIGINT))) div $dampDen")).as("pr"))
    }
    rank
  }

  /** PageRank over an UNDIRECTED pair relation (id_a, id_b): both
    * directions materialize as edges — the near-dup similarity graph
    * shape (q11 pairs), where centrality ranks cluster members.
    */
  def pageRankOverPairs(nodes: DataFrame, pairs: DataFrame,
      iters: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    pageRankIntScaled(nodes, edges, iters)
  }
}
