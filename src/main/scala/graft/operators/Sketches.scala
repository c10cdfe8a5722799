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

  /** (g, bucket, rho) register-update projection for one string value
    * column: bucket from the first 2 md5 hex digits, rho (leading zeros
    * of the next 52 bits + 1; 53 when the field is 0) from the next 13.
    * Scan-fused; the downstream max IS the sketch build.
    *
    * Computed by the fused [[graft.functions.HllReg]] kernel (r20, guide
    * §4 expression choice): the conv/substring spelling materialized the
    * 32-char md5 hex TWICE per value (bucket and rho fields), two
    * substring copies, two conv decimal round-trips, and a 53-expression
    * `greatest(when(shiftright ...))` ladder per token — the only
    * corpus-sized stage of every HLL consumer. The kernel is one digest
    * + integer shifts, value-identical by HllRegSpec's random sweep
    * against the literal conv spelling (the oracle replays conv/shift
    * arithmetic unchanged — only the engine-side evaluation is fused).
    */
  def registerUpdates(rows: DataFrame, group: Column, value: Column): DataFrame =
    rows.select(group.as("g"),
        graft.functions.TextFunctions.hll_reg(value).as("br"))
      .select(col("g"), shiftright(col("br"), 6).as("bucket"),
        col("br").bitwiseAND(lit(63)).as("rho"))

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
    // materialized (r20): the sketch feeds the per-source estimates, the
    // per-source scalars, and the self-join's two legs in one action —
    // a lazy persist was raced (see [[Stages.materialized]])
    val sk = Stages.materialized(tokenSketches(docs))
    val est = hllEstimate(sk)
    // r20 restructure (VERDICT r19 #3): the pair algebra previously
    // REPLICATED every sketch row once per pair it joins (aRegs/bRegs ×
    // #pairs, a union, and a (sa, sb, bucket) max aggregate — O(pairs ×
    // m) rows through two joins and two exchanges). The union estimate
    // only needs two LONG scalars per pair — Σ 2^(53−M_union) over
    // present buckets and the present-bucket count — and both decompose
    // over ONE self-join of the sketch on bucket:
    //   Σ_union = Σ_a + Σ_b − Σ_common (2^(53−ma) + 2^(53−mb)
    //             − 2^(53−max(ma,mb)))      [union register = max]
    //   n_union = n_a + n_b − n_common
    // Every term is exact integer arithmetic — the same register sums
    // the (sa, sb, bucket) aggregate fed hllEstimate, reassociated — so
    // the one double division and the estimator branches below replay
    // hllEstimate's arithmetic bit-for-bit (TokenAlgebraSpec pins the
    // respelling against the replicate-merge form; the q157 oracle
    // replays the register algebra unchanged).
    val per = sk.groupBy(col("g"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)")).as("sp"),
        count(lit(1)).as("np"))
    val common = sk.as("a")
      .join(sk.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("sa"), col("b.g").as("sb"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - a.m)") +
          expr("shiftleft(CAST(1 AS BIGINT), 53 - b.m)") -
          expr("shiftleft(CAST(1 AS BIGINT), 53 - greatest(a.m, b.m))"))
          .as("dup"),
        count(lit(1)).as("nc"))
    // pair frame from the per-source scalars (sources sharing no bucket
    // keep dup = nc = 0); ≤ #sources² rows, broadcast-sized
    val pairs = per.select(col("g").as("sa"), col("sp").as("sp_a"),
        col("np").as("np_a"))
      .join(per.select(col("g").as("sb"), col("sp").as("sp_b"),
        col("np").as("np_b")), col("sa") < col("sb"))
      .join(common, Seq("sa", "sb"), "left")
      .select(col("sa"), col("sb"),
        (col("sp_a") + col("sp_b") - coalesce(col("dup"), lit(0L)))
          .as("s_present"),
        (col("np_a") + col("np_b") - coalesce(col("nc"), lit(0L)))
          .as("n_present"))
    // hllEstimate's estimator body over the pair scalars — identical
    // literals, identical operand types, one double division
    val s = pairs.select(col("sa"), col("sb"),
      ((col("s_present") +
        (lit(HllM) - col("n_present")) * lit(TwoTo53.toLong)) /
        lit(TwoTo53)).as("s"),
      (lit(HllM) - col("n_present")).as("zeros"))
    val raw = lit(HllAlpha) * lit(HllM.toDouble * HllM) / col("s")
    val estU = s.select(col("sa"), col("sb"),
      round(
        when(raw <= lit(2.5 * HllM) && col("zeros") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
          .otherwise(raw), 4).as("est_union"))
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
