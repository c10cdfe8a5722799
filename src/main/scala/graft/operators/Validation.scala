package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the expectation-check step
  * (Deequ / Great Expectations shape) every ingestion pipeline runs
  * before promoting a batch: a small constraint ADT is compiled into ONE
  * aggregation pass over the table (plus one anti-join per referential
  * constraint), producing a per-constraint report row with exact
  * violation counts and a pass/fail verdict. The reference has no
  * validation surface; this is §2.13 extension territory, the gate a
  * snapshot-store commit (q143) or ingestion chain (q130) would consult
  * before publishing.
  *
  * Scale shape: all row-local constraints (null, range, pattern) fold
  * into a single map-side-combining aggregate — one scan, partials of a
  * few longs per partition, never a second pass per constraint (the
  * Deequ design point). [[Unique]] adds a distinct aggregate over its
  * key struct (Spark plans the mixed distinct/non-distinct agg with one
  * Expand — still one scan). [[ForeignKey]] is a LEFT ANTI join against
  * the (broadcast when dimension-sized) reference keys, counted to one
  * row and stitched to the metrics row by a broadcast one-row cross
  * join — the established q94/q131 report-assembly idiom. Nothing about
  * the report grows with table size.
  */
object Validation {

  /** A declarative table expectation. Violation semantics per case are
    * documented on the field; `NotNull` is the only constraint a null
    * violates — range/pattern checks skip nulls so each failure mode is
    * reported by exactly one constraint.
    */
  sealed trait Constraint

  /** Violated by rows where `column` IS NULL. */
  final case class NotNull(column: String) extends Constraint

  /** Violated by non-null values outside [lo, hi] (inclusive). */
  final case class InRange(column: String, lo: Double, hi: Double)
    extends Constraint

  /** Violated by non-null values not matching `regex` (Java syntax,
    * Spark `rlike` / DuckDB `regexp_matches` find-anywhere semantics —
    * anchor explicitly for full-match checks).
    */
  final case class MatchesPattern(column: String, regex: String)
    extends Constraint

  /** Violated once per surplus row: violations = count(*) − count
    * (DISTINCT key struct); 0 iff `columns` is a candidate key.
    */
  final case class Unique(columns: Seq[String]) extends Constraint

  /** Violated by rows whose non-null `column` has no match in
    * `refColumn` of `ref` (null FK values are not orphans — pair with
    * [[NotNull]] to forbid them). `refName` labels the report row.
    */
  final case class ForeignKey(column: String, ref: DataFrame,
                              refColumn: String, refName: String)
    extends Constraint

  /** Violated (once) when the table has fewer than `n` rows. */
  final case class MinRows(n: Long) extends Constraint

  private def label(c: Constraint): String = c match {
    case NotNull(col) => s"not_null($col)"
    case InRange(col, lo, hi) => s"in_range($col, $lo, $hi)"
    case MatchesPattern(col, re) => s"matches($col, $re)"
    case Unique(cols) => s"unique(${cols.mkString(", ")})"
    case ForeignKey(col, _, refCol, refName) =>
      s"foreign_key($col -> $refName.$refCol)"
    case MinRows(n) => s"min_rows($n)"
  }

  /** One report row per constraint: `(check_name, violations, n_rows,
    * violation_frac, status)`. Counts are exact longs; the fraction is
    * violations / n_rows rounded to 4 (null on an empty table); status
    * is "pass" iff violations = 0.
    */
  def report(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "validation needs at least one constraint")
    val cs = constraints.zipWithIndex
    // every non-FK constraint folds into the single metrics aggregate
    // sums coalesce to 0 so an EMPTY table reports zero violations
    // (null counts would poison the report row) — MinRows is the one
    // constraint an empty table fails
    val aggCols: Seq[Column] = count(lit(1)).as("_n") +: cs.flatMap {
      case (NotNull(c), i) =>
        Some(coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"_v$i"))
      case (InRange(c, lo, hi), i) =>
        Some(coalesce(sum((col(c).isNotNull &&
          (col(c) < lo || col(c) > hi)).cast("long")), lit(0L)).as(s"_v$i"))
      case (MatchesPattern(c, re), i) =>
        Some(coalesce(sum((col(c).isNotNull && !col(c).rlike(re))
          .cast("long")), lit(0L)).as(s"_v$i"))
      case (Unique(cols), i) =>
        Some((count(lit(1)) -
          count_distinct(struct(cols.map(col): _*))).as(s"_v$i"))
      case (MinRows(_), _) => None // derived from _n below
      case (_: ForeignKey, _) => None // separate anti-join branch
    }
    val base = cs.foldLeft(df.agg(aggCols.head, aggCols.tail: _*)) {
      case (acc, (ForeignKey(c, ref, refCol, _), i)) =>
        val orphans = df.select(col(c)).filter(col(c).isNotNull)
          .join(broadcast(ref.select(col(refCol).as(c)).distinct()),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as(s"_v$i"))
        acc.crossJoin(broadcast(orphans))
      case (acc, _) => acc
    }
    val rows = array(cs.map { case (c, i) =>
      val v = c match {
        case MinRows(n) => (col("_n") < n).cast("long")
        case _ => col(s"_v$i")
      }
      struct(lit(label(c)).as("check_name"), v.as("violations"))
    }: _*)
    base.select(explode(rows).as("r"), col("_n"))
      .select(col("r.check_name").as("check_name"),
        col("r.violations").as("violations"),
        col("_n").as("n_rows"),
        graft.functions.AggFunctions.ratioQ(
          col("r.violations"), col("_n"), 4).as("violation_frac"),
        when(col("r.violations") === 0L, lit("pass")).otherwise(lit("fail"))
          .as("status"))
  }

  /** The gated battery: the lineitem contract a TPC-H-shaped ingestion
    * would enforce — key completeness and uniqueness, domain ranges,
    * flag vocabulary, and the orders foreign key.
    */
  def lineitemChecks(lineitem: DataFrame, orders: DataFrame): DataFrame =
    report(lineitem, Seq(
      NotNull("l_orderkey"),
      NotNull("l_quantity"),
      InRange("l_quantity", 1, 50),
      InRange("l_discount", 0, 0.1),
      MatchesPattern("l_returnflag", "^[ANR]$"),
      Unique(Seq("l_orderkey", "l_linenumber")),
      ForeignKey("l_orderkey", orders, "o_orderkey", "orders"),
      MinRows(1)))

  /** Continuous/windowed twin of [[report]]: per tumbling event-time
    * window, violation counts for the ROW-LOCAL constraints (null,
    * range, pattern) — the live quality monitor next to the batch
    * promotion gate. Works identically on a batch frame and a watermarked
    * stream (same aggregate, append mode emits each window's report once
    * finalized — the §2 row-8 discipline; ValidationSpec pins
    * batch≡stream). Set-level constraints (unique, FK, min-rows) are
    * refused loudly: their verdicts are over the whole relation and
    * belong to the batch gate, not a window.
    */
  def windowedReport(df: DataFrame, tsCol: String, windowDur: String,
                     constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "validation needs at least one constraint")
    constraints.foreach {
      case c @ (_: Unique | _: ForeignKey | _: MinRows) =>
        throw new IllegalArgumentException(
          s"${label(c)} is a set-level constraint; the windowed report " +
            "covers row-local constraints only — run it in the batch gate")
      case _ => ()
    }
    val cs = constraints.zipWithIndex
    val aggCols: Seq[Column] = count(lit(1)).as("_n") +: cs.map {
      case (NotNull(c), i) =>
        sum(col(c).isNull.cast("long")).as(s"_v$i")
      case (InRange(c, lo, hi), i) =>
        sum((col(c).isNotNull &&
          (col(c) < lo || col(c) > hi)).cast("long")).as(s"_v$i")
      case (MatchesPattern(c, re), i) =>
        sum((col(c).isNotNull && !col(c).rlike(re)).cast("long"))
          .as(s"_v$i")
      case (c, _) => throw new IllegalStateException(label(c)) // guarded
    }
    val rows = array(cs.map { case (c, i) =>
      struct(lit(label(c)).as("check_name"),
        col(s"_v$i").as("violations"))
    }: _*)
    df.groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("w.start").as("w_start"), explode(rows).as("r"),
        col("_n"))
      .select(col("w_start"), col("r.check_name").as("check_name"),
        col("r.violations").as("violations"), col("_n").as("n_rows"),
        graft.functions.AggFunctions.ratioQ(
          col("r.violations"), col("_n"), 4).as("violation_frac"),
        when(col("r.violations") === 0L, lit("pass")).otherwise(lit("fail"))
          .as("status"))
  }

  /** Population Stability Index drift report between two snapshots of a
    * value distribution — the monitoring question the expectation checks
    * above cannot ask ("nothing VIOLATED, but did the data move?"): per
    * group, PSI = Σ_buckets (p_ref − p_cur)·ln(p_ref/p_cur) over the
    * log-binned quantile-sketch buckets (q168's binning — exact integer
    * bucket keys, so both engines histogram identically; the classic
    * credit-scoring reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted). Probabilities are add-one smoothed over the UNION bucket
    * set — (c+1)/(n+B) with B the union bucket count — so an empty-side
    * bucket contributes finite mass and ln never sees 0; counts and B
    * are exact integers, the only doubles are the per-bucket terms of a
    * round(4) sum (the q90 source-KL discipline).
    *
    * Scale shape: two sketch builds (each one map-side-combining
    * aggregate to ≤ ~1.9k rows per group), a full-outer equi-join of
    * SKETCH relations, and a sketch-sized re-aggregate — after the two
    * scans, everything is sketch-sized; the report never grows with
    * data volume, and the sketch relations can come straight from the
    * stored artifacts (q168's merge law) instead of the raw snapshots.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, group: Column,
      value: Column): DataFrame =
    psiFromSketches(Sketches.qsketchBuckets(ref, group, value),
      Sketches.qsketchBuckets(cur, group, value))

  /** [[psiDrift]] taking the (g, blen, sub, cnt) sketch RELATIONS
    * directly — the artifact form: compare today's live sketch (batch,
    * stored, or the streaming register state) against a stored
    * reference without rescanning either snapshot's raw data.
    */
  def psiFromSketches(refSketch: DataFrame, curSketch: DataFrame): DataFrame = {
    val a = refSketch.withColumnRenamed("cnt", "ca")
    val b = curSketch.withColumnRenamed("cnt", "cb")
    val m = a.join(b, Seq("g", "blen", "sub"), "full_outer")
      .select(col("g"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = m.groupBy(col("g")).agg(sum(col("ca")).as("n_ref"),
      sum(col("cb")).as("n_cur"), count(lit(1)).as("n_buckets"))
    val pa = (col("ca") + lit(1)).cast("double") /
      (col("n_ref") + col("n_buckets")).cast("double")
    val pb = (col("cb") + lit(1)).cast("double") /
      (col("n_cur") + col("n_buckets")).cast("double")
    m.join(tot, "g")
      .groupBy(col("g"), col("n_ref"), col("n_cur"), col("n_buckets"))
      .agg(round(sum((pa - pb) * log(pa / pb)), 4).as("psi"))
      .select(col("g"), col("n_ref"), col("n_cur"), col("n_buckets"),
        col("psi"))
  }

  /** ANALYZE-style column profile — the stats-collection pass every
    * warehouse runs before trusting a table (and the CBO's food): per
    * column, row count, null count, EXACT distinct count, and min/max
    * (numeric columns report doubles, string columns lexicographic
    * bounds — each family NULL for the other, so one report schema
    * serves both).
    *
    * Scale shape: ONE scan — all per-column aggregates fold into a
    * single Aggregate; the mixed distinct/non-distinct set plans as one
    * Expand pass (the [[report]] note), so a p-column profile costs one
    * corpus read with a ×p row expansion feeding map-side-combining
    * partials, never p separate scans. Exact NDV is a deliberate
    * choice: the q157 HLL registers are the approximate/mergeable path
    * when p × cardinality makes exact counting too hot.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val fields = cols.map(c => df.schema(c))
    def isNum(f: org.apache.spark.sql.types.StructField): Boolean =
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val aggs = count(lit(1)).as("_n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        coalesce(sum(c.isNull.cast("long")), lit(0L))
          .as(s"_nulls_${f.name}"),
        countDistinct(c).as(s"_ndv_${f.name}"),
        (if (isNum(f)) min(c).cast("double")
         else lit(null).cast("double")).as(s"_minn_${f.name}"),
        (if (isNum(f)) max(c).cast("double")
         else lit(null).cast("double")).as(s"_maxn_${f.name}"),
        (if (isNum(f)) lit(null).cast("string")
         else min(c).cast("string")).as(s"_mins_${f.name}"),
        (if (isNum(f)) lit(null).cast("string")
         else max(c).cast("string")).as(s"_maxs_${f.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(fields.map { f =>
      struct(lit(f.name).as("col_name"), col("_n").as("n_rows"),
        col(s"_nulls_${f.name}").as("n_nulls"),
        col(s"_ndv_${f.name}").as("ndv"),
        col(s"_minn_${f.name}").as("min_num"),
        col(s"_maxn_${f.name}").as("max_num"),
        col(s"_mins_${f.name}").as("min_str"),
        col(s"_maxs_${f.name}").as("max_str"))
    }: _*)
    one.select(explode(rows).as("r")).select(col("r.*"))
  }

  /** Default bucket count for [[tableDiff]] — the stage-1 checksum
    * relation stays driver-trivial at 65536 rows, and the dirty-bucket
    * fraction (≈ diffs/nBuckets for scattered diffs) stays small for
    * the sparse diffs reconciliation exists to find. Sizing rule:
    * nBuckets ≫ expected diff count, or stage 2 degenerates to a full
    * compare (the r18 probe measured exactly that: 3k scattered diffs
    * over 1024 buckets dirtied every bucket — 60.8 s; at 65536 the
    * same diff pruned stage 2 to ~5% of rows).
    */
  val DiffBuckets = 65536

  /** Anti-entropy table reconciliation: find every row-level difference
    * between two versions of a keyed table WITHOUT shuffling either
    * table in full — the "did the migration/backfill/replica corrupt
    * anything, and where" audit that a 100 TB copy makes impossible to
    * answer by direct comparison (a full-outer join on the key shuffles
    * 200 TB to find what is usually a handful of rows).
    *
    * Merkle-style two stages (the Dynamo/Cassandra anti-entropy shape,
    * flattened to one level because Spark aggregates a billion buckets
    * as easily as a tree walk):
    *
    *  1. Both tables collapse to per-bucket fingerprints in ONE
    *     map-side-combining aggregate each: bucket = content hash of the
    *     KEY (so a changed row lands in the same bucket on both sides
    *     and dirties exactly one bucket), fingerprint = (count,
    *     Σ rowHash) with the 60-bit row hash summed as DECIMAL(38,0) —
    *     commutative, so no sort; exact, so no false negatives from
    *     overflow wrap. A full-outer join of the two nBuckets-row
    *     relations yields the dirty-bucket set.
    *  2. Only rows whose key-bucket is dirty re-enter: each side
    *     broadcast-semi-joins against the dirty set (a scan-and-filter,
    *     NO table-sized shuffle), and the full-outer key join + hash
    *     compare runs over that slice alone, classifying `only_left` /
    *     `only_right` / `changed`. With d dirty buckets the join input
    *     is ~(d/nBuckets) of each table — for the sparse diffs
    *     reconciliation exists to find, effectively the diff rows plus
    *     their bucket-mates.
    *
    * Columns participate via an explicit null-sentinel string repr
    * (\\u0001 separator, \\u0002 for NULL — distinct from the empty
    * string), so `cols` should be integer/string-typed columns with
    * engine-portable casts. Identical tables produce an EMPTY result
    * from stage 1 alone.
    */
  def tableDiff(left: DataFrame, right: DataFrame, key: String,
                cols: Seq[String], nBuckets: Int = DiffBuckets): DataFrame = {
    require(nBuckets > 0, s"need nBuckets > 0, got $nBuckets")
    val bucket = diffBucket(col(key), nBuckets)
    val rowHash = diffRowHash(col(key), cols.map(col))
    // both slices consume the dirty set; eagerly checkpointed (65536
    // rows max) so the four row-scaled fingerprint scans behind it run
    // ONCE, not once per slice
    val dirty = dirtyBuckets(
      fingerprintRegisters(left, key, cols, nBuckets),
      fingerprintRegisters(right, key, cols, nBuckets))
      .localCheckpoint(true)
    def slice(df: DataFrame, side: String): DataFrame =
      df.select(col(key), bucket.as("bucket"), rowHash.as(s"h_$side"))
        .join(broadcast(dirty), Seq("bucket"), "left_semi")
        .drop("bucket")
    slice(left, "l").join(slice(right, "r"), Seq(key), "full_outer")
      .select(col(key),
        when(col("h_r").isNull, lit("only_left"))
          .when(col("h_l").isNull, lit("only_right"))
          .when(col("h_l") =!= col("h_r"), lit("changed"))
          .as("status"))
      .filter(col("status").isNotNull)
  }

  /** The key-content bucket both sides of a reconciliation agree on.
    * xxhash64, not md5: neither the bucket nor the row hash is
    * oracle-replayed (the q182 oracle verifies SEMANTICS with a direct
    * full join), so the fingerprint scans use the codegen'd hash —
    * md5-based fingerprints measured 4x slower over 10 M rows (r18
    * probe). Full 64-bit entropy keeps any practical nBuckets uniform.
    */
  private def diffBucket(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets.toLong)).cast("int")

  /** 60-bit row-content hash over the null-sentinel repr (\\u0001
    * separator, \\u0002 for NULL).
    */
  private def diffRowHash(key: Column, cols: Seq[Column]): Column = {
    val repr = concat_ws("\u0001",
      (key +: cols.map(c => coalesce(c.cast("string"),
        lit("\u0002")))).map(_.cast("string")): _*)
    xxhash64(repr)
  }

  /** [[tableDiff]] stage 1 as a standalone relation: per-bucket
    * (cnt, hsum) fingerprint registers. Runs UNCHANGED on a streaming
    * feed (update-mode aggregation, state = nBuckets rows, no
    * watermark) — the register-maintenance story q157 (HLL) and q168
    * (quantile sketch) establish, applied to reconciliation: maintain
    * the live table's fingerprints continuously, diff against a stored
    * snapshot's registers on demand without rescanning either table.
    */
  def fingerprintRegisters(df: DataFrame, key: String, cols: Seq[String],
                           nBuckets: Int = DiffBuckets): DataFrame =
    df.select(diffBucket(col(key), nBuckets).as("bucket"),
        diffRowHash(col(key), cols.map(col)).as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("h").cast("decimal(38,0)")).as("hsum"))

  /** Buckets whose fingerprints disagree between two register
    * relations — the work-list [[tableDiff]] stage 2 drills into.
    */
  def dirtyBuckets(left: DataFrame, right: DataFrame): DataFrame =
    left.select(col("bucket"), col("cnt").as("cnt_l"),
        col("hsum").as("hsum_l"))
      .join(right.select(col("bucket"), col("cnt").as("cnt_r"),
        col("hsum").as("hsum_r")), Seq("bucket"), "full_outer")
      .filter(col("cnt_l").isNull || col("cnt_r").isNull ||
        col("cnt_l") =!= col("cnt_r") || col("hsum_l") =!= col("hsum_r"))
      .select(col("bucket"))
}
