package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.MediaFunctions
import graft.operators.Multimodal

/** Round-15 probe: the pixel-level image path at 1 M images — encode,
  * fused decode+dHash, and the pigeonhole near-dup pipeline, priced
  * beyond the 500-image gate SF.
  *
  * Corpus note: the synthetic closed form has ~7,000 distinct images up
  * to brightness at any scale (patterns cycle), so at 1 M ids the
  * near-dup stage is an EXACT-DUP-HEAVY stress case — hundreds of ids
  * per identical hash, the bucket geometry of a crawl corpus full of
  * mirrored images. That is the interesting regime to price: the
  * pigeonhole must survive dense buckets, not just sparse ones.
  *
  * Recorded (2026-08-14, local[32]):
  *   encode_1000k        5.5 s  (~180 k PNGs/s; Deflater-bound)
  *   dhash_1000k         4.9 s  (~200 k images/s — encode+inflate+all-
  *                               filter reconstruction+hash fused in one
  *                               scan-shaped projection)
  *   neardup_sparse_14k  2.9 s  (676 k pairs)
  *   neardup_dense_100k 11.9 s  (34.8 M pairs — the dup-heavy regime;
  *                               cost is the pair volume itself, the
  *                               equi-join plan never degrades to NLJ)
  *   audio_stats_1000k   1.5 s  (~800 M samples decoded + fingerprinted)
  *   video_framesample_200k 4.7 s (600 k frame decode+dHash at stride 2,
  *                               ~128 k frames/s; slower epoch — image
  *                               encode read 8.3 s in the same run)
  */
object ProbeRound15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("probe-round15").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE r15image $name sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      out
    }
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val ids = spark.range(n).select(col("id").as("media_id"))

    // encode throughput (the storage write path); the aggregate defeats
    // ColumnPruning (the ProbeCuration pitfall)
    time(s"encode_${n / 1000}k") {
      ids.select(MediaFunctions.synthetic_png(col("media_id")).as("p"))
        .agg(sum(length(col("p")))).head()
    }
    // fused encode+decode+dhash — the scan-shaped per-image cost
    time(s"dhash_${n / 1000}k") {
      ids.select(MediaFunctions.image_dhash(
          MediaFunctions.synthetic_png(col("media_id"))).as("d"))
        .agg(expr("bit_xor(d.dhash)"), count(col("d.width"))).head()
    }
    // the full near-dup pipeline on a DISTINCT-heavy slice: cap ids so
    // each hash class stays bounded (the sparse regime), then the dense
    // regime at full n prices identical-hash pair explosion
    val sparseN = math.min(n, 14000L)
    time(s"neardup_sparse_${sparseN / 1000}k") {
      println("  pairs=" + Multimodal.imageNearDups(
        Multimodal.imageMedia(spark.range(sparseN)
          .select(col("id").as("doc_id")))).count())
    }
    // audio: fused encode+decode+stats+fingerprint per clip (~650-950
    // samples each — ~800 M samples at 1 M clips)
    time(s"audio_stats_${n / 1000}k") {
      ids.select(MediaFunctions.audio_stats(
          MediaFunctions.synthetic_wav(col("media_id"))).as("a"))
        .agg(sum(col("a.sum_abs")), count(col("a.fingerprint"))).head()
    }
    // video: container split + per-frame decode+dHash at stride 2
    // (4–7 frames/clip → ~3 sampled decodes per video)
    val nv = math.min(n, 200000L)
    time(s"video_framesample_${nv / 1000}k") {
      println("  frames=" + Multimodal.videoFrameSample(
        Multimodal.videoMedia(spark.range(nv)
          .select(col("id").as("doc_id"))), stride = 2).count())
    }
    // dense regime capped: with ~7,000 hash classes, pair count grows
    // quadratically in ids-per-class (C(k,2) per class) — at 100 k ids
    // that is already ~700 k planted-exact pairs; pricing 1 M here would
    // measure the corpus's duplicate geometry, not the operator
    val denseN = math.min(n, 100000L)
    time(s"neardup_dense_${denseN / 1000}k") {
      println("  pairs=" + Multimodal.imageNearDups(
        Multimodal.imageMedia(spark.range(denseN)
          .select(col("id").as("doc_id")))).count())
    }
    spark.stop()
  }
}
