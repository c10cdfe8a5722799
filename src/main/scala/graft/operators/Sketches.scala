package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches with SET ALGEBRA, formulated
  * Spark-natively: the sketch is a RELATION of (group, bucket, register)
  * rows rather than an opaque binary blob. That buys three things the
  * built-in `approx_count_distinct` (q36) cannot offer:
  *
  *  - **Mergeability as an aggregate.** A register is `max(rho)` per
  *    (group, bucket) — the merge IS a map-side-combining max, so
  *    partial sketches combine under any parallelism or order with no
  *    custom buffer code, and the stored artifact is queryable like any
  *    table (the snapshot-store discipline applied to sketches).
  *  - **Set algebra.** Sketch UNION is the same bucket-wise max across
  *    groups; |A∩B| follows by inclusion–exclusion. "How many distinct
  *    tokens do crawls A and B share" costs 2·m register rows, not a
  *    corpus re-scan — the cross-source overlap question the mixing step
  *    (q127) and the source cards (q124) ask before committing a mix.
  *  - **Oracle replayability.** Bucket (first 8 md5 bits), rho (leading
  *    zeros of the next 52 bits + 1, via integer shifts), and the
  *    estimator's scaled-integer register sum are EXACT integer
  *    arithmetic that DuckDB replays bit-for-bit at any aggregation
  *    order; the only doubles are one final division and the
  *    linear-counting ln.
  *
  * Estimator: standard HLL (Flajolet et al. 2007) with m = 256 —
  * E = α·m²/Σ 2^(−M_j), linear counting m·ln(m/V) when E ≤ 2.5m and
  * V (zero registers) > 0. Relative error ≈ 1.04/√m ≈ 6.5%. The register
  * sum is computed as Σ 2^(53−M_j) in a LONG (every term exact, max
  * 256·2^53 < 2^62 — no overflow, no rounding, no fold-order
  * sensitivity), then scaled by 2^−53 once.
  *
  * 100 TB shape: the only corpus-sized stage is the token projection;
  * the shuffle carries (group, bucket, rho) partials that map-side
  * combine into ≤ #groups × 256 rows. Everything downstream —
  * estimates, unions, intersections — is register-sized.
  */
object Sketches {

  /** 2^p buckets; p = 8 keeps the relative error at ~6.5% and the
    * sketch at ≤ 256 rows per group.
    */
  val HllM = 256

  /** α₂₅₆ (the standard bias constant for m ≥ 128). */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  private val TwoTo53 = 9007199254740992.0 // 2^53, exact in a double

  /** rho of a 52-bit hash field: leading zeros + 1 (53 when v = 0).
    * Integer-exact — h is the 1-based MSB position via 53 shifts, so the
    * oracle replay shares every intermediate value.
    */
  private def rho(v: Column): Column = {
    val h = greatest((0 until 53).map(j =>
      when(shiftright(v, j) > 0, lit(j + 1)).otherwise(lit(0))): _*)
    (lit(53) - h).cast("int")
  }

  /** (g, bucket, rho) register-update projection for one string value
    * column: bucket from the first 2 md5 hex digits, rho from the next
    * 13 (52 bits). Scan-fused; the downstream max IS the sketch build.
    */
  def registerUpdates(rows: DataFrame, group: Column, value: Column): DataFrame =
    rows.select(group.as("g"),
      conv(substring(md5(value), 1, 2), 16, 10).cast("int").as("bucket"),
      rho(conv(substring(md5(value), 3, 13), 16, 10).cast("long")).as("rho"))

  /** Per-group HLL sketch relation (g, bucket, m), m = max rho over the
    * group's values. Merging two sketch relations is this same aggregate
    * over their UNION — used verbatim by [[tokenAlgebra]]'s pair merge.
    */
  def hllSketch(rows: DataFrame, group: Column, value: Column): DataFrame =
    registerUpdates(rows, group, value)
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** HLL estimates from a sketch relation grouped by `keys` (each row
    * one register): scaled-integer register sum, absent buckets
    * collapsed in closed form, linear counting below 2.5m. `est` is
    * rounded to 4 decimals.
    */
  def hllEstimate(sketch: DataFrame, keys: Seq[String] = Seq("g")): DataFrame = {
    val kc = keys.map(col)
    val s = sketch.groupBy(kc: _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)")).as("s_present"),
        count(lit(1)).as("n_present"))
      .select(kc :+
        ((col("s_present") +
          (lit(HllM) - col("n_present")) * lit(TwoTo53.toLong)) /
          lit(TwoTo53)).as("s") :+
        (lit(HllM) - col("n_present")).as("zeros"): _*)
    val raw = lit(HllAlpha) * lit(HllM.toDouble * HllM) / col("s")
    s.select(kc :+
      round(
        when(raw <= lit(2.5 * HllM) && col("zeros") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
          .otherwise(raw), 4).as("est"): _*)
  }

  /** Per-source distinct-token sketch of the documents table. */
  def tokenSketches(docs: DataFrame): DataFrame =
    hllSketch(
      docs.select(col("source"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("tok")),
      col("source"), col("tok"))

  /** Pairwise source set-algebra report over distinct tokens: for every
    * unordered source pair (a < b), the per-source estimates, the UNION
    * estimate (bucket-wise max of the two register sets — the sketch
    * aggregate re-applied), and the inclusion–exclusion INTERSECTION
    * estimate (raw, not clamped: a small true intersection can estimate
    * negative, and hiding that would misrepresent the sketch's error
    * structure — consumers clamp at presentation time).
    *
    * Register-sized throughout: the corpus is scanned once by
    * [[tokenSketches]]; pairs, merges, and estimates run over
    * ≤ #sources × 256 rows.
    */
  def tokenAlgebra(docs: DataFrame): DataFrame = {
    val sk = tokenSketches(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = hllEstimate(sk)
    val sources = sk.select(col("g")).distinct()
    val pairs = sources.select(col("g").as("sa"))
      .join(sources.select(col("g").as("sb")), col("sa") < col("sb"))
    // union registers: each side's sketch rows tagged with the pair key,
    // merged by the same (key, bucket) max aggregate as the build
    val aRegs = pairs.join(sk, col("g") === col("sa"))
      .select(col("sa"), col("sb"), col("bucket"), col("m"))
    val bRegs = pairs.join(sk, col("g") === col("sb"))
      .select(col("sa"), col("sb"), col("bucket"), col("m"))
    val unionSk = aRegs.union(bRegs)
      .groupBy(col("sa"), col("sb"), col("bucket"))
      .agg(max(col("m")).as("m"))
    val estU = hllEstimate(unionSk, Seq("sa", "sb"))
      .withColumnRenamed("est", "est_union")
    estU
      .join(est.select(col("g").as("sa"), col("est").as("est_a")), "sa")
      .join(est.select(col("g").as("sb"), col("est").as("est_b")), "sb")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_inter"))
  }

  // --------------------------------------------------------------------
  // Log-binned mergeable quantile sketch (the DDSketch idea — Masson,
  // Rim & Lee, VLDB'19 — instantiated at base 2 with QSubBits sub-bucket
  // bits so the binning is EXACT INTEGER arithmetic both engines replay
  // bit-for-bit; no floating log can disagree in the last ulp at a
  // bucket boundary). Same relation-not-blob formulation as the HLL
  // family: the sketch is (group, blen, sub, cnt) rows, the merge is a
  // map-side-combining SUM over the union, the stored artifact is a
  // queryable table, and state is structurally bounded at
  // ≤ (63 − QSubBits) · 2^(QSubBits+1) rows per group regardless of
  // data volume — what percentile monitoring over 100 TB needs where
  // the exact two-pass (q87) wants the data twice.
  //
  // Binning, for v ≥ 0 (the metrics/prices/latencies regime):
  //   blen = length(bin(v))            -- floor(log2 v)+1; bin(0)='0'→1
  //   s    = blen − 1 − QSubBits
  //   sub  = s > 0 ? v >> s : v        -- top QSubBits+1 bits (leading
  //                                       1 included); EXACT when the
  //                                       value has ≤ QSubBits+1 bits
  // (blen, sub) is monotone with v, bucket width is RELATIVE (2^s on a
  // lower bound ≥ 2^(blen−1)), so the midpoint representative is within
  // 2^−(QSubBits+1) ≈ 3.1% of any member. Negative values fall back to
  // exact singleton buckets (blen = 0, sub = v) — still rank-correct
  // and monotone, just unbounded if negatives dominate; the designed
  // regime is non-negative.
  // --------------------------------------------------------------------

  /** Sub-bucket bits: 4 → ~3.1% worst-case relative value error and
    * ≤ ~1.9k sketch rows per group.
    */
  val QSubBits = 4

  /** Per-group quantile-sketch relation (g, blen, sub, cnt) over a LONG
    * value column. Merging two sketch relations is `groupBy(g, blen,
    * sub).sum(cnt)` over their union — associative, order-free,
    * streaming-safe (a per-bucket count only grows).
    */
  def qsketchBuckets(rows: DataFrame, group: Column, value: Column): DataFrame =
    rows.select(group.as("g"), value.cast("long").as("v"))
      .select(col("g"), col("v"),
        when(col("v") < 0, lit(0))
          .otherwise(length(bin(col("v")))).cast("int").as("blen"))
      .select(col("g"), col("blen"),
        when(col("blen") - 1 - QSubBits > 0,
          expr(s"shiftright(v, blen - 1 - $QSubBits)"))
          .otherwise(col("v")).as("sub"))
      .groupBy(col("g"), col("blen"), col("sub"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a sketch relation: for each (keys, qn/qd)
    * the midpoint representative of the bucket holding rank
    * ceil(n·qn/qd) — target rank and representative both pure integer
    * math (`div`, shifts), replayable at any engine. The window runs
    * over the SKETCH (≤ ~1.9k rows per group), not the data — the
    * bounded-relation exception to the no-window discipline, like the
    * HLL estimator. `qs` are exact rationals, so no double q·n can
    * straddle engines differently.
    */
  def qsketchQuantiles(sketch: DataFrame, qs: Seq[(Int, Int)],
      keys: Seq[String] = Seq("g")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val rep = when(col("blen") - 1 - QSubBits > 0,
      expr(s"shiftleft(sub, blen - 1 - $QSubBits)" +
        s" + shiftleft(CAST(1 AS BIGINT), blen - 2 - $QSubBits)"))
      .otherwise(col("sub"))
    val cum = sketch
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(kc: _*)
          .orderBy(col("blen"), col("sub"))))
      .withColumn("n_rows",
        sum(col("cnt")).over(Window.partitionBy(kc: _*)))
      .withColumn("rep", rep)
    val spark = sketch.sparkSession
    import spark.implicits._
    val qrel = qs.toDF("qn", "qd")
      .select(col("qn").cast("long"), col("qd").cast("long"))
    cum.crossJoin(broadcast(qrel)) // sketch-sized × |qs|: safe BNLJ
      .withColumn("target", expr("(n_rows * qn + qd - 1) div qd"))
      .filter(col("cum") >= col("target"))
      .groupBy(kc ++ Seq(col("qn"), col("qd")): _*)
      .agg(min_by(col("rep"), col("cum")).as("est"),
        max(col("n_rows")).as("n_rows"))
  }

  /** Per-returnflag price-cent quantiles off one sketch build — the
    * gated composition (cents from the decimal price are exact, so the
    * whole pipeline is integer end to end).
    */
  def priceQuantiles(lineitem: DataFrame): DataFrame =
    qsketchQuantiles(
      qsketchBuckets(lineitem, col("l_returnflag"),
        (col("l_extendedprice") * 100).cast("long")),
      Seq(1 -> 2, 9 -> 10, 99 -> 100))
      .select(col("g").as("l_returnflag"), col("qn"), col("qd"),
        col("est").as("est_cents"), col("n_rows"))
}
