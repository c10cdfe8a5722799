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
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val denx = nullif(col("n") * col("sxx") - col("sx") * col("sx"),
      lit(0).cast(dec)).cast("double")
    val deny = nullif(col("n") * col("syy") - col("sy") * col("sy"),
      lit(0).cast(dec)).cast("double")
    val inum = (col("sy") * col("sxx") - col("sx") * col("sxy"))
      .cast("double")
    sums.select(col("g"), col("n").cast("long").as("n"),
      round(num / denx, 6).as("slope"),
      round(inum / denx, 6).as("intercept"),
      round(num * num / (denx * deny), 6).as("r2"))
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
