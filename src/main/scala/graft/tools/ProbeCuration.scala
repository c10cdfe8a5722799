package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Curation, TextAnalysis}

/** Scratch: stage-by-stage cost of the curation projection at 1 M docs. */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-curation").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = ScaleProbe.syntheticDocs(spark, 1000000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    // count() lets ColumnPruning drop the projection entirely — force
    // evaluation by aggregating over the computed column
    def force(c: org.apache.spark.sql.Column): Long =
      docs.select(c.as("x")).agg(count(when(hash(col("x")) =!= 0, 1))).head().getLong(0)
    time("pred_only")(force(TextAnalysis.predLang(col("text"))))
    time("quality_only")(force(TextAnalysis.qualityScore(col("text"))))
    time("fp64_only")(force(TextAnalysis.fp64Expr(col("text"))))
    time("nwords_only")(force(size(TextAnalysis.tokens(col("text")))))
    time("npunct_only")(force(size(regexp_extract_all(lower(col("text")), lit("[^a-z0-9 ]"), lit(0)))))
    time("all5_project")(docs.select(
      col("doc_id"),
      TextAnalysis.predLang(col("text")).as("pred_lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      size(TextAnalysis.tokens(col("text"))).as("n_words"),
      TextAnalysis.fp64Expr(col("text")).as("fp64")).count())
    val enriched = docs.select(
      col("doc_id"),
      TextAnalysis.predLang(col("text")).as("pred_lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      size(TextAnalysis.tokens(col("text"))).as("n_words"),
      TextAnalysis.fp64Expr(col("text")).as("fp64"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp64"))
    time("window_only")(enriched
      .withColumn("dup_cnt", count(lit(1)).over(w))
      .withColumn("keep_id", min(col("doc_id")).over(w)).count())
    val cur = Curation.curate(docs, "und", 0.0)
    cur.queryExecution.executedPlan // force planning
    println(cur.queryExecution.executedPlan.toString.take(4000))
    time("full_curate")(cur.count())
    spark.stop()
  }
}
