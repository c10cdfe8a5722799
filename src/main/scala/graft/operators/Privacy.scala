package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private releases of corpus statistics — the governance
  * step after data cards (q124): a per-source statistics table that can be
  * PUBLISHED, because every released number carries calibrated noise
  * rather than the true count. Counting queries with per-record
  * sensitivity 1 get ε-DP via the two-sided geometric (discrete Laplace)
  * mechanism of Ghosh, Roughgarden & Sundararajan (STOC'09) — the
  * universally-optimal mechanism for counts.
  *
  * Determinism: production DP uses a seeded PRNG stream; here the stream
  * is md5 over (release key, seed, statistic, draw) — reproducible run to
  * run, replayable in the DuckDB oracle, and independent across keys and
  * statistics by the usual hash-independence argument. The uniform is the
  * first 52 md5 bits centered by +0.5 (never 0, never 1), the geometric is
  * the standard inverse-CDF `floor(ln(u) / −ε)`, and the two-sided noise
  * is the difference of two independent geometrics. All noise values are
  * INTEGERS — the released counts stay exact longs, and the only
  * cross-engine double arithmetic is one `ln` and one division per draw
  * (a floor flip would need ln(u)/ε within one ulp of an integer —
  * measure-zero, the same class of risk every ln-carrying gate accepts).
  *
  * Privacy accounting (documented contract, not enforced): one document
  * contributes to exactly ONE source's statistics (parallel composition
  * across sources) and to BOTH released statistics of that source
  * (sequential composition within a source), so `dpSourceRelease(eps)`
  * spends ε/2 per statistic and ε total per document, under add/remove-one
  * adjacency. The release contains NO un-noised value: true counts never
  * leave the aggregation.
  *
  * Scale shape: one corpus scan (the quality kernel fused into it), one
  * map-side-combining aggregate to #sources rows; the noise arithmetic
  * runs on the #sources-row result. Nothing about the mechanism changes
  * at 100 TB — DP cost is per released STATISTIC, not per row.
  */
object Privacy {

  val DefaultEpsilon = 1.0
  val DefaultQualityBar = 0.5

  private val TwoTo52 = 4503599627370496.0

  /** Deterministic uniform in (0,1): the first 52 bits of md5(key),
    * centered so the inverse CDF never sees ln(0).
    */
  private def u01(key: Column): Column =
    (conv(substring(md5(key), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(TwoTo52)

  /** Seeded two-sided geometric (discrete Laplace) noise with parameter
    * `eps`: G(":a") − G(":b"), each G = floor(ln(u)/−eps), u from
    * md5(key ++ draw tag). P(N = n) ∝ e^(−eps·|n|); integer-valued.
    */
  def twoSidedGeometric(key: Column, eps: Double): Column = {
    require(eps > 0.0, s"eps must be positive, got $eps")
    def g(tag: String): Column =
      floor(log(u01(concat(key, lit(tag)))) / lit(-eps)).cast("long")
    g(":a") - g(":b")
  }

  /** ε-DP per-source release: noisy document count and noisy
    * above-quality-bar count per source (ε/2 each — see the accounting
    * note above), with the spent epsilon in-band. Released values can be
    * negative for tiny sources — that is the mechanism working as
    * specified (clamping would bias the release); consumers clamp at
    * presentation time if they must.
    */
  def dpSourceRelease(docs: DataFrame,
                      eps: Double = DefaultEpsilon,
                      seed: Long = 0L,
                      qualityBar: Double = DefaultQualityBar): DataFrame = {
    require(eps > 0.0, s"eps must be positive, got $eps")
    val epsPer = eps / 2.0
    val counts = docs
      .select(col("source"),
        (TextAnalysis.qualityScore(col("text")) >= qualityBar)
          .cast("long").as("hi"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("hi")).as("n_hi"))
    counts.select(col("source"),
      (col("n_docs") + twoSidedGeometric(
        concat(col("source"), lit(s":$seed:docs")), epsPer)).as("n_docs_dp"),
      (col("n_hi") + twoSidedGeometric(
        concat(col("source"), lit(s":$seed:hi")), epsPer)).as("n_hi_quality_dp"),
      lit(eps).as("epsilon"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2006) — the PRE-release check the DP mechanism above presumes:
    * before any per-group statistic ships, every quasi-identifier
    * equivalence class must hold at least k individuals (else a row
    * re-identifies by its group alone) and at least l distinct values
    * of the sensitive attribute (else membership in a k-large class
    * still discloses the sensitive value). Report, not filter: one row
    * per equivalence class with its size, its sensitive-value diversity,
    * and both verdicts — the release gate is `k_anonymous AND
    * l_diverse`, and the failing classes are the suppression work-list.
    *
    * Scale shape: ONE map-side-combining aggregate over the
    * quasi-identifier key (the distinct sensitive count plans as
    * Spark's two-phase Expand — still one scan); output is
    * equivalence-class-sized, never row-sized.
    */
  def kAnonymityReport(rows: DataFrame, quasiIds: Seq[String],
      sensitive: org.apache.spark.sql.Column, k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, s"need k, l >= 1; got $k, $l")
    rows.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_diversity"))
      .select(quasiIds.map(col) ++ Seq(col("class_size"),
        col("l_diversity"),
        (col("class_size") >= k).as("k_anonymous"),
        (col("l_diversity") >= l).as("l_diverse")): _*)
  }
}
