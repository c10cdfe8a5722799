package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probe: [[graft.plans.HammingJoinRewrite]] A/B — the naive
  * BroadcastNestedLoopJoin the declarative hamming join plans as, vs the
  * pigeonhole equi-join the rule rebuilds it into.
  *
  * Corpus: xxhash64(id) — effectively random 64-bit fingerprints, so the
  * qualifying output (hamming <= 3) is ~empty and the probe prices the
  * JOIN MACHINERY, not pair materialization. The naive leg is quadratic
  * (n²/2 xor+popcounts); the rewritten leg is the per-block bucket sum
  * (4 blocks × C(n/2^16, 2) × 2^16 candidate popcounts ≈ n²/2^15 — a
  * 16,000× popcount reduction at any n, plus it shuffles instead of
  * broadcasting a whole side).
  *
  * Recorded (2026-08-15, local[32], after a warmup pass on both legs):
  *   naive_100k      3.2 s   (5 G popcount pairs, BNLJ)
  *   naive_200k      9.3 s   (20 G pairs — 2.9× for 2× rows: quadratic.
  *                            Extrapolates to ~4 min at 1 M and ~64 h at
  *                            100 M; and BNLJ must BROADCAST one whole
  *                            side, which stops being possible long
  *                            before the time wall matters)
  *   rewritten_100k  1.0 s
  *   rewritten_200k  1.7 s   (5.5×, and the gap squares from here)
  *   rewritten_1M    4.9 s   (~31 M candidate popcounts — the plan the
  *                            hand-built q31 operator produces, now from
  *                            the naive SQL spelling; naive extrapolation
  *                            is ~4 min → ~50×)
  *   rewritten_4M    4.8 s   (~480 M candidate popcounts; the residual
  *                            quadratic term is the within-bucket C(k,2)
  *                            — the Manku geometry; naive extrapolation
  *                            ~62 min → ~780×)
  *
  * BandJoinRewrite leg (same session; 30 s tolerance over a ±n×10⁷ µs
  * span, ~6 M qualifying pairs at 1 M rows, half the corpus at negative
  * timestamps so the floor-div bins are exercised):
  *   band_naive_100k      4.8 s   (5 G abs-compare pairs, BNLJ)
  *   band_naive_200k     15.3 s   (3.2× for 2× rows — quadratic;
  *                                 extrapolates to ~6.4 min at 1 M)
  *   band_rewritten_100k  0.7 s   (7×)
  *   band_rewritten_200k  0.6 s   (25×)
  *   band_rewritten_1M    3.8 s   (~100× vs extrapolated naive; cost is
  *                                 dominated by the ~6 M-pair output and
  *                                 the two bin shuffles)
  *
  * Stream-static micro-batch leg (the nearDupPairsStream shape — a
  * batch of arrivals vs a corpus index at hamming <= 3; same session):
  *   stream_naive_1k_arrivals_100k_corpus      0.4 s  (1e8 popcounts —
  *                                 naive cost is arrivals × corpus, so
  *                                 10k × 4M would be ~160 s per batch
  *                                 plus re-broadcasting 4M hashes)
  *   stream_rewritten_1k_arrivals_100k_corpus  0.3 s
  *   stream_rewritten_10k_arrivals_1M_corpus   0.7 s
  *   stream_rewritten_10k_arrivals_4M_corpus   1.3 s  (cost tracks block-
  *                                 bucket OVERLAP, not corpus size —
  *                                 what makes fuzzy streaming dedup
  *                                 viable at crawl corpus scale)
  */
object ProbeRewrite {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-rewrite").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE rewrite $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    def hashes(n: Long): DataFrame =
      spark.range(n).select(col("id"), xxhash64(col("id")).as("h"))
    def q(n: Long): DataFrame = {
      val a = hashes(n).select(col("id").as("id_a"), col("h").as("h_a"))
      val b = hashes(n).select(col("id").as("id_b"), col("h").as("h_b"))
      a.join(b, col("id_b") > col("id_a") &&
          bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3)
        .agg(count(lit(1)).as("pairs"))
    }
    val key = "spark.graft.hammingJoinRewrite.enabled"

    q(10000L).head() // warm both code paths before timing
    spark.conf.set(key, "false")
    q(10000L).head()
    spark.conf.set(key, "true")

    for (n <- Seq(100000L, 200000L)) {
      spark.conf.set(key, "false")
      time(s"naive_${n / 1000}k") { q(n).head() }
      spark.conf.set(key, "true")
      time(s"rewritten_${n / 1000}k") { q(n).head() }
    }
    for (n <- Seq(1000000L, 4000000L)) {
      time(s"rewritten_${n / 1000000}M") { q(n).head() }
    }

    // ---- BandJoinRewrite: the abs-tolerance time-proximity spelling.
    // Timestamps spread over ±n×10⁷ µs so the 30 s band keeps qualifying
    // pairs sparse at every n (~6 M pairs at 1 M rows): the probe prices
    // the join machinery, not output volume. The signed hash also puts
    // half the corpus at negative timestamps — floor-div bin territory.
    def ts(n: Long, side: String): DataFrame =
      spark.range(n).select(col("id").as(s"id_$side"),
        (xxhash64(col("id")) % (n * 10000000L)).as(s"t_$side"))
    def bq(n: Long): DataFrame =
      ts(n, "a").join(ts(n, "b"),
          abs(col("t_b") - col("t_a")) <= 30000000L)
        .agg(count(lit(1)).as("pairs"))
    val bandKey = "spark.graft.bandJoinRewrite.enabled"
    for (n <- Seq(100000L, 200000L)) {
      spark.conf.set(bandKey, "false")
      time(s"band_naive_${n / 1000}k") { bq(n).head() }
      spark.conf.set(bandKey, "true")
      time(s"band_rewritten_${n / 1000}k") { bq(n).head() }
    }
    time("band_rewritten_1M") { bq(1000000L).head() }

    // ---- the stream-static micro-batch shape behind
    // StreamingMedia.nearDupPairsStream: a batch of arrivals joined to a
    // corpus index at hamming <= 3. Per-micro-batch cost is what decides
    // whether fuzzy streaming dedup is viable at all.
    def mb(nArr: Long, nCorpus: Long): DataFrame = {
      val arr = spark.range(nArr)
        .select(col("id").as("media_id"), xxhash64(col("id") + 7L).as("dh"))
      val corpus = spark.range(nCorpus)
        .select(col("id").as("known_id"), xxhash64(col("id")).as("h"))
      arr.join(corpus, bit_count(col("dh").bitwiseXOR(col("h"))) <= 3)
        .agg(count(lit(1)).as("pairs"))
    }
    spark.conf.set(key, "false")
    time("stream_naive_1k_arrivals_100k_corpus") { mb(1000L, 100000L).head() }
    spark.conf.set(key, "true")
    time("stream_rewritten_1k_arrivals_100k_corpus") { mb(1000L, 100000L).head() }
    time("stream_rewritten_10k_arrivals_1M_corpus") { mb(10000L, 1000000L).head() }
    time("stream_rewritten_10k_arrivals_4M_corpus") { mb(10000L, 4000000L).head() }
    spark.stop()
  }
}
