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

  /** k-anonymity ENFORCEMENT by local hierarchy generalization — the
    * step after [[kAnonymityReport]]'s audit: rows whose
    * quasi-identifier class is smaller than k have their geography
    * generalized one hierarchy level at a time (level 0 value →
    * level 1 → … → the root '*'), and rows still re-identifiable at
    * the root are SUPPRESSED. Local recoding (Sweeney'02 §5 shape):
    * each class generalizes independently, so well-populated classes
    * keep full granularity instead of paying for the rare ones (the
    * full-domain alternative generalizes everyone to the worst class's
    * level).
    *
    * Semantics is round-unrolled and deterministic: round i groups the
    * STILL-UNSAFE rows by (level-i geography × fixed QIs) and releases
    * the classes that now hold ≥ k rows; rounds = hierarchy depth, so
    * the oracle replays the same fixed CTE chain. Note the subtlety the
    * spec pins: a class can be < k at level i yet its level-(i+1)
    * UNSAFE-ROW union ≥ k — safety is always judged on the rows still
    * in flight, never on the original population (rows already released
    * at a finer level do not lend their count upward).
    *
    * Scale shape: one aggregate + one row-level broadcast semi/anti
    * join per hierarchy level (levels are 2–4 in practice); class
    * relations are QI-cardinality-sized, and only the still-unsafe
    * slice carries forward (monotonically shrinking, usually a tiny
    * tail after round 0).
    *
    * Output: one row per input row — `(rowId, geo, level, fixed QIs…)`
    * with `level` = the released hierarchy level, and `level = -1`,
    * `geo = '*'` for suppressed rows (kept, not dropped: the consumer
    * decides whether suppressed rows are filtered or imputed, and row
    * conservation stays checkable).
    */
  def kAnonymize(rows: DataFrame, rowId: String, hierarchy: Seq[String],
                 fixedQis: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(hierarchy.nonEmpty, "need at least one hierarchy level")
    val fixed = fixedQis.map(col)
    var pending = rows.select(
      (col(rowId) +: hierarchy.map(col)) ++ fixed: _*)
    var released = Seq.empty[DataFrame]
    hierarchy.zipWithIndex.foreach { case (lvl, i) =>
      val classes = pending.groupBy((col(lvl) +: fixed): _*)
        .agg(count(lit(1)).as("_n"))
      val safe = broadcast(classes.filter(col("_n") >= k)
        .select((col(lvl) +: fixed): _*))
      val keyCols = lvl +: fixedQis
      val ok = pending.join(safe, keyCols, "left_semi")
        .select((col(rowId) +: Seq(col(lvl).as("geo"),
          lit(i).as("level"))) ++ fixed: _*)
      released = released :+ ok
      pending = pending.join(safe, keyCols, "left_anti")
    }
    val suppressed = pending.select(
      (col(rowId) +: Seq(lit("*").as("geo"), lit(-1).as("level"))) ++
        fixed: _*)
    (released :+ suppressed).reduce(_.unionByName(_))
  }

  /** Right-to-be-forgotten purge of one keyed table: every row whose key
    * is in the (broadcast-sized) forget set drops via an anti join — at
    * 100 TB this is one scan per table, no shuffle of the table itself.
    * Downstream summaries rebuild their touched groups only
    * ([[Relational.summaryRebuildGroups]] — deletes are exactly the
    * case its append-only twin refuses).
    */
  def forget(df: DataFrame, key: String, ids: DataFrame): DataFrame =
    df.join(broadcast(ids.select(col(ids.columns.head).as(key)).distinct()),
      Seq(key), "left_anti")

  /** The deletion RECEIPT a forget job files: per table, exact
    * rows-before / rows-deleted / rows-after — the audit artifact that
    * proves the purge without retaining the purged keys. One
    * broadcast-join + one-row aggregate per table; `rows_after` derives
    * from the two counts, so the receipt is internally consistent by
    * construction.
    */
  def forgetReceipt(tables: Seq[(String, DataFrame, String)],
                    ids: DataFrame): DataFrame = {
    require(tables.nonEmpty, "receipt needs at least one table")
    val idsB = broadcast(ids.select(col(ids.columns.head).as("_fid"))
      .distinct().withColumn("_hit", lit(1L)))
    tables.map { case (name, df, key) =>
      df.select(col(key).as("_fid"))
        .join(idsB, Seq("_fid"), "left")
        .agg(count(lit(1)).as("rows_before"),
          coalesce(sum(col("_hit")), lit(0L)).as("rows_deleted"))
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))
    }.reduce(_.unionByName(_))
  }
}
