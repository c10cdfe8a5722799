package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}

/** Round-6 scale probes: the re-sharded sequence packing under the exact
  * skew VERDICT r5 #1 described (one language at 90% of a 1M-doc corpus),
  * the log-diameter connected components on adversarially deep graphs,
  * and the widened PII battery / strided chunking / true-upsampling costs
  * at 1M docs. Measurement rule from ProbeCuration: force evaluation
  * through a filter or aggregate that needs the computed columns —
  * `count()` lets ColumnPruning delete projections and unused windows.
  */
object ProbeRound6 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-round6").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.catalog.clearCache()
    }

    // 1M docs, ~90% en, the rest spread over 20 small langs — the exact
    // dominant-language skew the two-level packing must not serialize
    val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
      .withColumn("lang",
        when(pmod(xxhash64(col("doc_id"), lit(7)), lit(10)) < 9, lit("en"))
          .otherwise(concat(lit("l"),
            pmod(xxhash64(col("doc_id"), lit(8)), lit(20)))))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()

    // two-level (lang, block) packing: 16 parallel ~56k-doc slices for en
    time("pack_two_level_90pct_en_1m") {
      val st = Curation.packStage(docs)
      val n = st.result.filter(col("seq_id") >= 0 && col("offset") >= 0).count()
      st.unpersist(); n
    }
    // the r5 shape for comparison: ONE window partitioned by lang — the
    // 900k-doc en partition sorts and scans through a single task
    time("pack_lang_only_90pct_en_1m") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .filter(col("cum_before") >= 0).count()
    }

    // widened 4-class PII battery (case-insensitive email, SSN, NANP
    // phone, IPv4): still a pure scan-fused projection
    time("pii_redact_1m")(
      TextAnalysis.redactPii(TextAnalysis.withSyntheticPii(docs))
        .filter(col("n_email") + col("n_ssn") + col("n_phone") + col("n_ip") >= 0)
        .count())

    // strided chunking (32/24): same single-pass kernel, ~2x the chunks
    time("chunk_strided_1m")(
      TextAnalysis.chunkDocuments(docs, chunkSize = 32, stride = 24)
        .filter(col("n_tokens") > 0).count())

    // true upsampling: copies explode over the hash coin
    time("temperature_resample_1m")(
      Curation.temperatureResample(docs, targetFrac = 1.0)
        .filter(col("copy_idx") >= 1).count())

    // token-budget selection: whole buckets + boundary-bucket window
    time("token_budget_select_1m") {
      val st = Curation.budgetStage(docs, budgetTokens = 25000000L) // ~half
      val n = st.result.filter(col("qb") >= 0).count()
      st.unpersist(); n
    }
    // deterministic epoch shuffle: 32 shards, per-shard ranks
    time("epoch_shuffle_1m")(
      Curation.epochShuffle(docs, epoch = 3, nShards = 32)
        .filter(col("pos") >= 1).count())
    // boilerplate chunk removal: occurrence window + ordered reassembly
    time("boilerplate_removal_1m")(
      Dedup.removeBoilerplate(docs)
        .filter(length(col("clean_text")) >= 0).count())

    // span-level exact dedup: ~6 strided spans per 50-token doc -> ~6M
    // distinct pairs through two 8-byte-key aggregates and one join
    time("span_dedup_1m") {
      val st = Dedup.spanDedupStage(docs)
      val n = st.result.filter(col("dup_frac") >= 0).count()
      st.unpersist(); n
    }

    // unigram-LM scoring: 50M token instances -> distinct (doc, tok_fp)
    // pairs, vocab-sized count join, per-doc rollup
    time("lm_perplexity_1m") {
      val st = TextAnalysis.lmScoreStage(docs)
      val n = st.result.filter(col("ppl") > 0).count()
      st.unpersist(); n
    }

    // incremental dedup: 100k incoming (half exact corpus dups) against a
    // 1M corpus; corpus never self-joins
    time("incremental_dedup_1m_vs_100k") {
      val incoming = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        .limit(100000)
      val out = Dedup.dedupAgainstCorpus(docs, incoming)
      val dropped = out.filter(col("keep") === 0).count()
      val n = out.count()
      println(s"PROBE incremental_dedup dropped=$dropped of $n")
      n
    }

    // bigram LM: ~49M bigram instances through the pair-stream collapse,
    // two count re-folds, two fingerprint joins
    time("lm_bigram_1m") {
      val st = TextAnalysis.lmScoreBigramStage(docs)
      val n = st.result.agg(sum(col("ppl"))).collect()(0); st.unpersist()
      docs.count()
    }

    // per-source KL drift at 1M docs across 20 synthetic sources
    time("source_divergence_1m") {
      TextAnalysis.sourceDivergence(docs.withColumn("source",
          concat(lit("s"), pmod(xxhash64(col("doc_id"), lit(9)), lit(20)))))
        .filter(col("kl") >= 0).count()
    }

    // exact quantiles without buffering a group: 10M rows, 5 skewed
    // groups — the per-group sort the old exact path would need is
    // replaced by histogram aggregates + ranking ~n/nBuckets rows
    time("exact_quantile_twopass_10m") {
      val vals = spark.range(10000000L).select(
        concat(lit("g"), pmod(col("id"), lit(5))).as("g"),
        (pmod(xxhash64(col("id"), lit(3)), lit(1000000)) / lit(97.0)).as("v"))
      graft.operators.Relational
        .exactQuantilesTwoPass(vals, "g", "v", Seq(0.5, 0.95, 0.99))
        .filter(col("q") >= 0).count()
    }

    // BPE training at 1M docs: the corpus explode collapses to the
    // ~1000-word vocab relation, so 8 merge rounds cost vocab-sized
    // aggregates regardless of corpus size
    time("bpe_train_1m") {
      graft.operators.Bpe.trainMerges(docs, nMerges = 8).count()
    }

    // SRP-LSH at probe scale runs the WIDE signature (64 bits / 4 bands:
    // 65,536 buckets per band) — the 16/2 gate default is a small-SF
    // parameter, and this asserts the width knob actually bounds the
    // candidate volume (~n^2 * bands / 2^16 pairs)
    time("srp_lsh_500k_64bit") {
      val emb = ScaleProbe.syntheticEmbeddings(spark, 500000L)
      Similarity.srpBucketedNearDups(emb, threshold = 0.8,
        bits = 64, bands = 4).count()
    }

    // log-diameter connected components, wide: 1000 paths x diameter 99
    // (min-label paid ~99 rounds here; stars must stay <= ceil(log2 99)+2)
    time("cc_star_1000x100") {
      val pairs = spark.range(100000L)
        .filter(col("id") % 100 =!= 99)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val res = Dedup.starClusters(pairs)
      val n = res.labels.count()
      println(s"PROBE cc_star_1000x100 rounds=${res.rounds} (bound 9)")
      require(res.rounds <= 9, s"rounds ${res.rounds} > log bound 9")
      Dedup.releaseClusters(res.labels); n
    }
    // log-diameter, deep: ONE path of 100k nodes (diameter 99,999 —
    // min-label propagation would need ~100k shuffle rounds, the log-star
    // bound is ceil(log2 99999)+2 = 19)
    time("cc_star_one_path_100k") {
      val pairs = spark.range(99999L)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val res = Dedup.starClusters(pairs)
      val n = res.labels.count()
      println(s"PROBE cc_star_one_path_100k rounds=${res.rounds} (bound 19)")
      require(res.rounds <= 19, s"rounds ${res.rounds} > log bound 19")
      Dedup.releaseClusters(res.labels); n
    }
    spark.stop()
  }
}
