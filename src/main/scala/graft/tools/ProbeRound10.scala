package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.VectorFunctions.vec_cosine
import graft.operators.Similarity

/** Round-10 probes.
  *
  * 1. "q14fixed" — the ADVICE r9 attribution gap: round 9 reported the
  *    q14 predicate-order fix as 3.67 s → 0.38 s, but the same diff
  *    shrank idWindow 100→25, so part of that delta is reduced workload.
  *    This section re-times BOTH forms at the FIXED r8 window
  *    (idWindow=100, threshold=0.35, sf0.1 embeddings) so the
  *    cheap-first join-condition speedup is attributed cleanly:
  *      - "filterLast": the r8 shape — join on the id window, then
  *        .filter(cosine >= t). The optimizer folds the cosine into the
  *        BNLJ condition AHEAD of the id checks, so every id pair pays
  *        round(cosine).
  *      - "cheapFirst": the shipped nearDupPairs — the whole conjunction
  *        hand-built as the join condition, id predicates first.
  *    Both must return the identical pair count.
  */
object ProbeRound10 {
  def main(args: Array[String]): Unit = {
    val sections: Set[String] = if (args.isEmpty) Set("q14fixed") else args.toSet
    val spark = Engine.builder("probe-round10").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
      n
    }

    if (sections("q14fixed")) {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val threshold = 0.35
      val idWindow = 100

      // r8 shape: join on the id window only, cosine as a post-filter.
      def filterLast(): Long = {
        val v = emb.select(col("vec_id"), col("embedding").as("e"))
        val a = v.select(col("vec_id").as("id_a"), col("e").as("emb_a"))
        val b = v.select(col("vec_id").as("id_b"), col("e").as("emb_b"))
        val cos = round(vec_cosine(col("emb_a"), col("emb_b")), 4)
        a.join(b, col("id_b") > col("id_a") &&
            col("id_b") <= col("id_a") + idWindow)
          .filter(cos >= threshold)
          .select(col("id_a"), col("id_b"), cos.as("cos"))
          .count()
      }

      def cheapFirst(): Long =
        Similarity.nearDupPairs(emb, threshold, idWindow).count()

      // warm-up once each (JIT), then measure twice each.
      time("q14fixed warmup filterLast")(filterLast())
      time("q14fixed warmup cheapFirst")(cheapFirst())
      val n1 = time("q14fixed filterLast run1")(filterLast())
      val n2 = time("q14fixed cheapFirst run1")(cheapFirst())
      time("q14fixed filterLast run2")(filterLast())
      time("q14fixed cheapFirst run2")(cheapFirst())
      require(n1 == n2, s"pair sets differ: $n1 vs $n2")
    }

    // Round-10 operators at 1 M docs (100-200× the bench SF): BM25,
    // Kneser-Ney, shingle novelty, and survivor selection with a viral
    // 300 k-doc cluster (the no-WindowExec argmax must not straggle).
    if (sections("r10ops")) {
      val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      docs.count()

      // count() is NOT a valid forcing here: the optimizer deletes the
      // unique-key left joins (and with them the whole scoring pipeline)
      // under a bare count — aggregate over the computed columns instead
      // (the ProbeCuration ColumnPruning lesson, join-elimination flavor)
      def forceAll(df: org.apache.spark.sql.DataFrame): Long = {
        val hashAll = hash(df.columns.map(col): _*)
        df.agg(count(when(hashAll =!= 0, 1))).head().getLong(0)
      }
      time("bm25 1M docs")(forceAll(
        graft.operators.TextAnalysis.bm25TopK(docs,
          Seq("w1", "w500", "w999"))))
      time("kneser_ney 1M docs")(forceAll(
        graft.operators.TextAnalysis.lmScoreKneserNey(docs)))
      time("novelty 1M docs")(forceAll(
        graft.operators.TextAnalysis.shingleNovelty(docs)))

      time("quality_percentile 1M docs")(forceAll(
        graft.operators.Curation.qualityPercentile(
          docs.withColumn("source",
            concat(lit("s"), pmod(col("doc_id"), lit(20)))))))
      time("minhash_calibration 1M docs")(forceAll(
        graft.operators.Dedup.minhashCalibration(docs)))
      time("source_overlap 1M docs")(forceAll(
        graft.operators.Dedup.sourceOverlap(
          docs.withColumn("source",
            concat(lit("s"), pmod(col("doc_id"), lit(20)))))))
      time("top_boilerplate 1M docs")(forceAll(
        graft.operators.TextAnalysis.topBoilerplate(docs)))

      // 700 k docs in 5-doc clusters + ONE 300 k-doc viral cluster
      val labels = spark.range(1000000L).select(col("id").as("doc_id"),
        when(col("id") < 300000L, lit(0L))
          .otherwise(expr("(id div 5) * 5")).as("cluster"))
      val survivors = time("survivors 1M docs, 300k viral cluster")(
        graft.operators.Dedup.clusterSurvivors(labels, docs).count())
      require(survivors == 140001L, s"expected 140001 clusters, got $survivors")

      docs.unpersist()
    }

    spark.stop()
  }
}
