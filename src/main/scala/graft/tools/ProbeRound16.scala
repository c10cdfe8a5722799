package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EditDistance, Similarity}

/** Round-16 probe: the two new corpus-sized operators priced beyond the
  * gate SF.
  *
  * 1. EXACT prefix-filtered set-similarity join (q154) at 1 M docs with
  *    10% planted near-dup twins — the favorable (web-crawl-like) regime
  *    where most shingles are globally rare, so prefix candidates ≈ true
  *    pairs — plus a 100 k-doc hot-vocabulary adversarial corpus where
  *    EVERY shingle is hot and the candidate volume approaches the
  *    output volume (exactness means the operator must pay for genuinely
  *    similar pairs; the interesting number is that it pays ~per-pair,
  *    not per-all-pairs). MinHash-LSH on the same corpus for comparison
  *    (the lossy alternative the exact join is the ceiling of).
  *
  * 2. Corpus-wide k-NN join (q155) at 1 M vectors / kCells=2048: the
  *    symmetric-shuffle IVF join where per-query cost is
  *    nProbe × corpus/kCells candidate dots — the knob the probe sweeps.
  *
  * Recorded (2026-08-15, local[32]): see the SURVEY.md round-16 additions table.
  */
object ProbeRound16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-round16").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r16 $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val which = if (args.length > 0) args(0) else "all"

    if (which == "all" || which == "prefix") {
      // 1 M docs, 50 words each over a 1,000-word vocab; ids with
      // id%10 in {0,1} form twin pairs sharing 49 of 50 words
      // (shingle-set J ≈ 0.85) — ~100 k true near-dup pairs
      val n = 1000000L
      val isTwin = pmod(col("id"), lit(10)) < 2
      val seed = when(isTwin, col("id") - pmod(col("id"), lit(2)))
        .otherwise(col("id"))
      val words = (0 until 49).map(j =>
        concat(lit("w"), pmod(xxhash64(seed, lit(100 + j)), lit(1000))))
      val last = when(isTwin, concat(lit("e"), pmod(col("id"), lit(2))))
        .otherwise(concat(lit("u"), col("id")))
      val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", words :+ last: _*).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      docs.count()

      time("prefix_join_1000k") {
        val st = Dedup.prefixSimilarityJoinStage(docs, threshold = 0.5)
        println("  pairs=" + st.result.count())
        st.unpersist()
      }
      time("minhash_lsh_1000k") {
        val st = Dedup.minhashNearDupsStage(docs, threshold = 0.5)
        println("  pairs=" + st.result.count())
        st.unpersist()
      }
      docs.unpersist()

      // adversarial: 100 k docs, 12 words from a 40-word vocab — every
      // shingle is corpus-hot, candidates ~ genuinely-similar pairs
      val hot = spark.range(100000L).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 12).map(j =>
            concat(lit("h"), pmod(xxhash64(col("id"), lit(500 + j)), lit(40)))): _*)
            .as("text"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      hot.count()
      time("prefix_join_hotvocab_100k") {
        val st = Dedup.prefixSimilarityJoinStage(hot, threshold = 0.5)
        println("  pairs=" + st.result.count())
        st.unpersist()
      }
      hot.unpersist()
    }

    if (which == "all" || which == "edjoin") {
      // 1 M distinct 20-char names ("User#" + 13 hash hex + 2-char
      // tail); ids with id%10 in {0,1} form twin pairs differing in ONE
      // char (~100 k planted ed=1 pairs) — hex randomness keeps numeric
      // neighbors from flooding the output the way sequential ids would.
      // TWO recorded lessons from earlier cuts: (a) before the operator
      // stripped the corpus-wide common prefix, the constant "User#"
      // head made segment 0 identical across the corpus — ~10¹²
      // candidates, unrunnable; (b) at 14-char names (9-char cores),
      // k=2 segments are 3 chars and the structured 2-char tail
      // collapsed the last segment to ~64 distinct values (~10¹⁰
      // candidates) — segment ENTROPY, core_len/(k+1) chars of it, is
      // the knob; short strings at high k are inherently
      // candidate-heavy, which is why the gate's k stays ≤ 3 and the
      // fixture uses realistic 20-char entity strings
      val n = 1000000L
      val isTwin = pmod(col("id"), lit(10)) < 2
      val seed = when(isTwin, col("id") - pmod(col("id"), lit(2)))
        .otherwise(col("id"))
      val hx = concat(
        lpad(hex(pmod(xxhash64(seed, lit(77)), lit(268435456L))), 7, "0"),
        lpad(hex(pmod(xxhash64(seed, lit(78)), lit(16777216L))), 6, "0"))
      val tail = when(isTwin,
        concat(lit("t"), pmod(col("id"), lit(2)).cast("string")))
        .otherwise(lit("u0"))
      val names = spark.range(n).select(col("id"),
          concat(lit("User#"), hx, tail).as("name"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      names.count()
      for (k <- Seq(1, 2)) {
        time(s"edjoin_1000k_k$k") {
          val st = EditDistance.editDistanceJoinStage(names, "id", "name", k)
          println("  pairs=" + st.result.count())
          st.unpersist()
        }
      }
      names.unpersist()
    }

    if (which == "all" || which == "knn") {
      // 200 k self-join, 512 cells from an 8-points-per-cell training
      // sample: per-query cost = nProbe · n/kCells ≈ 390·p candidate
      // dots. The first cut of this probe ran 1 M × 2048 cells off a
      // 4096-point sample (TWO training points per cell) and OOM'd the
      // 8 GiB probe heap: a degenerate quantizer concentrates the corpus
      // into few viral cells, and a viral cell is exactly the partition
      // the kNN join's candidate stream amplifies. The recorded lesson
      // is the training-sample contract: trainN must give Lloyd several
      // points per cell or the cell HISTOGRAM (printed below) collapses
      // — the same k-grows-with-corpus discipline as SemDeDup, enforced
      // here by measurement rather than assumption.
      val n = 200000L
      val embs = ScaleProbe.syntheticEmbeddings(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      embs.count()
      val model = time("knn_kmeans_fit_512c") {
        Similarity.kmeansFit(embs, k = 512, iters = 2, trainN = 4096)
      }
      // cell-size skew report: the join's straggler risk in one number
      val sizes = model.cells.groupBy(col("cell")).count()
        .agg(max(col("count")).as("mx"), expr("approx_percentile(count, 0.99)").as("p99"),
          count(lit(1)).as("nonempty")).head()
      println(s"  cell_max=${sizes.get(0)} cell_p99=${sizes.get(1)} nonempty=${sizes.get(2)}")
      for (p <- Seq(1, 2)) {
        time(s"knn_join_${n / 1000}k_p$p") {
          val out = Similarity.knnJoin(embs, embs, model, k = 10, nProbe = p)
          println("  edges=" + out.count())
        }
      }
      embs.unpersist()
    }
    spark.stop()
  }
}
