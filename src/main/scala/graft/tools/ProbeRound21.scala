package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AggFunctions

/** Round-21 probe: what does EXACT rounding cost at scale? The round's
  * meanQ/ratioQ conversion replaced `round(double, d)` with integer
  * HALF_UP arithmetic (decimal(38,0) ops + IntegralDivide) across the
  * report surface — this prices the swap on scan-bound shapes far past
  * the sf0.1 bench:
  *
  *  1. grouped mean, 100 M rows / 8 groups: `round(avg(x), 4)` vs
  *     [[AggFunctions.mean4]] (micros-decimal sum + integer rounding);
  *  2. per-row integer ratio, 100 M rows: `round(a/b, 4)` vs
  *     [[AggFunctions.ratioQ]] (generic, 3 numerator refs) vs
  *     [[AggFunctions.ratioQNN]] (single-ref) — the q113/q104 lesson
  *     measured in isolation;
  *  3. the composite text-quality formula, 2 M synthetic docs: the old
  *     three-term double spelling vs [[graft.operators.TextAnalysis
  *     .qualityExpr]]'s one-rational integer form (kernel counts are
  *     pre-materialized columns in both, so the delta is pure
  *     rounding-arithmetic cost).
  *
  * Method: build once, run each variant twice alternating, report the
  * min (the verify-skill pitfall applies — every computed column is
  * forced through an aggregate so ColumnPruning can't delete it).
  * Recorded (2026-08-16, local[32]): see SURVEY.md round-21 table.
  */
object ProbeRound21 {

  private def timeMin(spark: org.apache.spark.sql.SparkSession,
                      label: String)(f: => Unit): Unit = {
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE21 $label%-34s min=${ts.min}%7.2f s samples=" +
      ts.map(t => f"$t%.2f").mkString(","))
  }

  private def force(df: DataFrame, c: Column): Unit = {
    df.agg(sum(c.cast("double"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("graft-probe21")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. grouped mean at 100 M rows / 8 groups (2-dp grid values)
    val n1 = 100000000L
    val means = spark.range(n1).select((col("id") % 8).as("g"),
      ((col("id") * 37 % 200000).cast("double") / 100.0).as("x"))
    def meanOld(): Unit = { means.groupBy("g")
      .agg(round(avg(col("x")), 4).as("m"))
      .agg(sum("m")).collect(); () }
    def meanNew(): Unit = { means.groupBy("g")
      .agg(AggFunctions.mean4(col("x")).as("m"))
      .agg(sum("m")).collect(); () }
    meanOld(); meanNew() // warm both code paths
    timeMin(spark, s"mean 100M: round(avg,4)")(meanOld())
    timeMin(spark, s"mean 100M: mean4 exact")(meanNew())

    // 2. per-row ratio at 100 M rows (cheap int columns)
    val ratios = spark.range(n1).select(
      (col("id") % 99991 + 1).as("a"), (col("id") % 997 + 1).as("b"))
    def r(c: Column): Unit = force(ratios, c)
    r(round(col("a") / col("b"), 4)); r(AggFunctions.ratioQ(col("a"), col("b"), 4))
    timeMin(spark, "ratio 100M: round(a/b,4)")(
      r(round(col("a") / col("b"), 4)))
    timeMin(spark, "ratio 100M: ratioQ generic")(
      r(AggFunctions.ratioQ(col("a"), col("b"), 4)))
    timeMin(spark, "ratio 100M: ratioQNN")(
      r(AggFunctions.ratioQNN(col("a"), col("b"), 4)))

    // 3. the quality formula over 2 M synthetic docs — counts
    //    materialized first (both variants pay the kernels identically),
    //    so the measured delta is the rounding arithmetic alone
    val docs = spark.range(2000000L).select(concat_ws(" ",
        array_repeat(lit("the cat and a dog runs"), (col("id") % 20 + 1).cast("int")))
      .as("text"))
    val counts = docs.select(
        length(col("text")).as("c"),
        size(split(col("text"), " ")).as("w"),
        graft.functions.TextFunctions.punct_count(lower(col("text"))).as("p"),
        graft.functions.TextFunctions.stopword_scores(split(lower(col("text")), " "),
          Seq(graft.operators.TextAnalysis.StopwordDicts.head._2)).getItem(0).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count()
    val oldQuality = round(
      lit(0.4) * least(col("w") / lit(100.0), lit(1.0)) +
        lit(0.3) * (lit(1.0) - col("p") / when(col("c") > 0, col("c"))) +
        lit(0.3) * least(col("s") / col("w") * 5.0, lit(1.0)), 4)
    val newQuality = graft.operators.TextAnalysis.qualityExpr(
      col("c"), col("w"), col("p"), col("s"))
    force(counts, oldQuality); force(counts, newQuality)
    timeMin(spark, "quality 2M docs: old double")(force(counts, oldQuality))
    timeMin(spark, "quality 2M docs: exact N/D")(force(counts, newQuality))
    counts.unpersist()

    spark.stop()
  }
}
