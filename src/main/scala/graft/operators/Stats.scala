package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact statistics over grouped relations — the
  * "is the data moving, and which way" family next to the monitoring
  * operators (q163 expectation checks, q171 PSI drift, q174
  * calibration): per-group least-squares TREND and a contingency
  * INDEPENDENCE test, both computed from map-side-combinable sums so a
  * 100 TB input collapses to group-cardinality rows in one shuffle.
  *
  * Reference: n/a (the reference is a fixed telemetry topology,
  * `SolarConsumer.java` — trend/independence monitoring is part of the
  * large-scale pipeline brief, not the reference surface).
  *
  * Determinism discipline (the q168/q179 pattern): every accumulation
  * that crosses a partition boundary is EXACT INTEGER arithmetic —
  * timestamps floor to seconds, measures scale to integer cents, sums
  * ride DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — so partial-sum
  * combination order cannot move a bit; doubles appear only in the
  * final per-group closed-form division over exact components, spelled
  * in the same fixed order in both engines and rounded.
  */
object Stats {

  /** Fixed time origin for the integer-seconds x axis: 2024-01-01T00Z.
    * Subtracting a constant origin keeps x², x·y, and their sums well
    * inside DECIMAL(38,0) for any realistic corpus (x ≤ ~3·10⁸ for a
    * decade of data; n·Σx² ≤ 10¹² rows · 10¹７ ≈ 10²⁹ ≪ 10³⁸) — the
    * numerically-stabilizing shift ordinary OLS does with the mean,
    * done with a CONSTANT so it needs no second pass.
    */
  val TrendEpochOrigin = 1704067200L

  /** Per-group ordinary-least-squares trend of an integer-cents measure
    * over integer-seconds time: slope (cents/second), intercept (cents
    * at the origin), and r², from the closed-form sums
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
    *
    * Scale shape: ONE scan → ONE map-side-combining aggregate per
    * group; nothing downstream of the aggregate sees more than
    * |groups| rows. All five sums are exact decimals; each output is
    * one double division (or one double multiply-divide chain for r²)
    * over exact operands, identical in both engines, rounded 6.
    * Degenerate groups (n < 2, or a single distinct x — a vertical
    * line) surface slope/intercept/r² as NULL via nullif; a constant-y
    * group has r² NULL too (0/0: no variance to explain).
    */
  def groupedTrend(df: DataFrame, group: Column, ts: Column,
                   value: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val x = (unix_timestamp(ts) - TrendEpochOrigin).cast(dec)
    val y = round(value * 100).cast("long").cast(dec)
    val sums = df
      .select(group.as("g"), x.as("x"), y.as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    // exact integer numerators/denominators, then double at the brink
    val numI = col("n") * col("sxy") - col("sx") * col("sy")
    val denxI = col("n") * col("sxx") - col("sx") * col("sx")
    val denyI = nullif(col("n") * col("syy") - col("sy") * col("sy"),
      lit(0).cast(dec)).cast("double")
    val inumI = col("sy") * col("sxx") - col("sx") * col("sxy")
    // slope/intercept: exact integer HALF_UP at 6 (ratioQ — b = 0, the
    // vertical/constant-x group, stays NULL). r² keeps the double form:
    // its exact numerator num² overflows decimal(38,0) at real
    // timestamps, and its operands don't reduce to the tiny lowest-term
    // denominators the boundary class needs
    sums.select(col("g"), col("n").cast("long").as("n"),
      graft.functions.AggFunctions.ratioQWide(numI, denxI, 6).as("slope"),
      graft.functions.AggFunctions.ratioQWide(inumI, denxI, 6).as("intercept"),
      round(numI.cast("double") * numI.cast("double") /
        (nullif(denxI, lit(0).cast(dec)).cast("double") * denyI), 6)
        .as("r2"))
  }

  /** Robust per-group outlier report: median, MAD (median absolute
    * deviation), and the count of |y − med| > 3σ-equivalent outliers
    * under the MAD-consistent scale (σ ≈ 1.4826·MAD for a normal core)
    * — the anomaly screen that, unlike the q169 EWMA bands or a
    * mean/stddev z-score, a few extreme values cannot drag: the
    * breakdown point is 50%, so the screen still works when the
    * contamination IS what you are hunting.
    *
    * Exactness: values scale to integer cents; both medians are the
    * LOWER median (smallest y with cumulative count ≥ ⌊(n+1)/2⌋ —
    * crisp in both engines, no midpoint averaging); the outlier rule
    * dev > 4.4478·MAD is evaluated as the EXACT integer comparison
    * dev·10000 > MAD·44478 (3·1.4826 = 4.4478 exactly). No doubles
    * anywhere in the output.
    *
    * Scale shape: ONE row scan collapses to the per-(group, cents)
    * histogram — bounded by the measure's RESOLUTION, not the row
    * count (the q179 rounded-score discipline; an unbounded-domain
    * measure belongs to the q168 sketch instead). Both median
    * extractions and the outlier count run over histogram relations:
    * cumulative windows partition by group over value-resolution rows,
    * never over the corpus.
    */
  def robustOutliers(df: DataFrame, group: Column, value: Column): DataFrame =
    // the histogram feeds the median chain, the deviation histogram, the
    // outlier count, and the report row — eagerly checkpointed (the q119
    // discipline) so the ROW-SCALED scan runs exactly once and every
    // downstream reference replays the resolution-bounded relation
    robustOutliersFromHist(
      centsHistogram(df, group, value).localCheckpoint(true))

  /** [[robustOutliers]] stage 1 as a standalone relation: per-(group,
    * integer-cents) counts — the register form. Runs UNCHANGED on a
    * streaming feed (update-mode aggregation, state = group ×
    * value-resolution rows, no watermark): the q157/q168/q182
    * register-maintenance story applied to robust statistics — maintain
    * the live histogram continuously, compute medians/MAD/outliers on
    * demand from the registers (or from a STORED histogram artifact)
    * without rescanning any rows.
    */
  def centsHistogram(df: DataFrame, group: Column, value: Column): DataFrame =
    df.select(group.as("g"), round(value * 100).cast("long").as("y"))
      .groupBy(col("g"), col("y")).agg(count(lit(1)).as("cnt"))

  /** The [[robustOutliers]] report computed from a (g, y, cnt) histogram
    * relation — live registers or a stored artifact; nothing row-scaled
    * enters the plan.
    */
  def robustOutliersFromHist(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lowerMedian(h: DataFrame, v: String, out: String): DataFrame = {
      val cumW = Window.partitionBy("g").orderBy(v)
        .rowsBetween(Window.unboundedPreceding, 0)
      h.select(col("g"), col(v), col("cnt"),
          sum(col("cnt")).over(cumW).as("cum"),
          sum(col("cnt")).over(Window.partitionBy("g")).as("n"))
        .filter(col("cum") >= floor((col("n") + 1) / 2))
        .groupBy(col("g"), col("n")).agg(min(col(v)).as(out))
    }
    val med = lowerMedian(hist, "y", "med")
    val devHist = hist.join(med, "g")
      .groupBy(col("g"), col("n"), col("med"),
        abs(col("y") - col("med")).as("dev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = lowerMedian(devHist.select(col("g"), col("dev"), col("cnt")),
      "dev", "mad").drop("n")
    val outliers = devHist.join(mad, "g")
      .groupBy(col("g"))
      .agg(sum(when(col("dev") * 10000 > col("mad") * 44478, col("cnt"))
        .otherwise(0L)).as("n_outliers"))
    devHist.select(col("g"), col("n"), col("med")).distinct()
      .join(mad, "g").join(outliers, "g")
      .select(col("g"), col("n"), col("med").as("median_cents"),
        col("mad").as("mad_cents"), col("n_outliers"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, plus Cramér's V effect size — the "are these dimensions
    * related at all" question upstream of q90's KL (which assumes a
    * reference) and q171's PSI (which assumes a baseline window).
    *
    * Scale shape: ONE scan collapses to the a×b contingency relation
    * (bounded by category-cardinality product, independent of row
    * count); marginals come from two broadcast-sized aggregations OVER
    * THE CELLS, never a second corpus pass. The statistic is
    * Σ (o − e)²/e with e = rowTotal·colTotal/N — per-cell terms are
    * doubles over exact integer counts, summed over the tiny cell
    * relation and rounded 4 (the repo-wide round-after-sum discipline;
    * cell count ~10², double associativity noise ~10⁻¹² of magnitude).
    * Output is one row: cardinalities, N, chi2, dof, Cramér's V.
    */
  def chiSquareIndependence(df: DataFrame, a: Column, b: Column): DataFrame = {
    val observed = df.groupBy(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowTot = observed.groupBy(col("a")).agg(sum(col("obs")).as("ra"))
    val colTot = observed.groupBy(col("b")).agg(sum(col("obs")).as("cb"))
    val n = observed.agg(sum(col("obs")).as("nn"))
    // DENSIFY: an unobserved (a, b) combination is a ZERO cell — it still
    // contributes (0 − e)²/e = e to the statistic (a diagonal table's
    // association signal lives entirely in its zero cells), so the grid
    // is the marginal cross product, not the observed groupBy output.
    // Both marginal relations are category-sized; the cross join is the
    // a_card × b_card grid, never row-scaled.
    val e = col("ra").cast("double") * col("cb") / col("nn")
    val joined = broadcast(rowTot).crossJoin(broadcast(colTot))
      .join(observed, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("obs"), lit(0L)))
      .crossJoin(broadcast(n))
    joined.agg(
        countDistinct(col("a")).as("a_card"),
        countDistinct(col("b")).as("b_card"),
        max(col("nn")).as("n"),
        sum((col("o") - e) * (col("o") - e) / e).as("chi2raw"))
      .select(col("a_card"), col("b_card"), col("n"),
        round(col("chi2raw"), 4).as("chi2"),
        ((col("a_card") - 1) * (col("b_card") - 1)).as("dof"),
        round(sqrt(col("chi2raw") /
          (col("n") * least(col("a_card") - 1, col("b_card") - 1))), 4)
          .as("cramers_v"))
  }
}
