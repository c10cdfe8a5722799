package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

import graft.operators.Validation
import graft.operators.Validation._

/** Constraint-report semantics (q163). */
class ValidationSpec extends SparkSpecBase {
  import spark.implicits._

  // id, qty, flag — two null ids, one dup key pair, one out-of-range,
  // one bad flag, two FK orphans (ids 8, 9)
  private def tbl: DataFrame = Seq(
    (Option(1L), Option(5.0), "A"),
    (Option(1L), Option(5.0), "A"), // duplicate (id, qty) key
    (Option(2L), Option(99.0), "N"), // qty out of range
    (Option(3L), Option(7.0), "X"), // bad flag
    (None: Option[Long], Option(1.0), "R"), // null id (not an FK orphan)
    (None: Option[Long], None: Option[Double], "R"), // null id + null qty
    (Option(8L), Option(2.0), "R"), // FK orphan
    (Option(9L), Option(3.0), "R") // FK orphan
  ).toDF("id", "qty", "flag")

  private def ref: DataFrame = Seq(1L, 2L, 3L).toDF("rid")

  private def rep: Map[String, (Long, Long, String)] =
    Validation.report(tbl, Seq(
      NotNull("id"), NotNull("qty"),
      InRange("qty", 1, 50),
      MatchesPattern("flag", "^[ANR]$"),
      Unique(Seq("id", "qty")),
      ForeignKey("id", ref, "rid", "ref"),
      MinRows(10)))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(4))))
      .toMap

  test("every constraint counts exactly its own violations") {
    val m = rep
    assert(m("not_null(id)") === ((2L, 8L, "fail")))
    assert(m("not_null(qty)") === ((1L, 8L, "fail")))
    // nulls are NOT range violations — reported by not_null alone
    assert(m("in_range(qty, 1.0, 50.0)") === ((1L, 8L, "fail")))
    assert(m("matches(flag, ^[ANR]$)") === ((1L, 8L, "fail")))
    // the two (null, ...) rows differ in qty: only the (1, 5.0) pair dups
    assert(m("unique(id, qty)") === ((1L, 8L, "fail")))
    // null FKs are not orphans; 8 and 9 are
    assert(m("foreign_key(id -> ref.rid)") === ((2L, 8L, "fail")))
    assert(m("min_rows(10)") === ((1L, 8L, "fail")))
  }

  test("a clean table passes everything") {
    val clean = Seq((1L, 5.0, "A"), (2L, 6.0, "R")).toDF("id", "qty", "flag")
    val out = Validation.report(clean, Seq(
      NotNull("id"), InRange("qty", 1, 50), Unique(Seq("id")),
      ForeignKey("id", ref, "rid", "ref"), MinRows(1)))
      .collect()
    assert(out.length == 5)
    assert(out.forall(_.getString(4) == "pass"))
    assert(out.forall(_.getLong(1) == 0L))
  }

  test("empty table: zero counts, null fraction, min_rows fails") {
    val empty = spark.emptyDataset[(Long, Double, String)]
      .toDF("id", "qty", "flag")
    val out = Validation.report(empty, Seq(NotNull("id"), MinRows(1)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.isNullAt(3), r.getString(4)))).toMap
    assert(out("not_null(id)") === ((0L, 0L, true, "pass")))
    assert(out("min_rows(1)") === ((1L, 0L, true, "fail")))
  }

  test("windowed report refuses set-level constraints loudly") {
    val df = Seq((1L, 5.0)).toDF("id", "qty")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    intercept[IllegalArgumentException] {
      Validation.windowedReport(df, "ts", "1 hour", Seq(Unique(Seq("id"))))
    }
    intercept[IllegalArgumentException] {
      Validation.windowedReport(df, "ts", "1 hour", Seq(MinRows(1)))
    }
  }

  test("streaming windowed report equals the batch windowed report") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val data = Seq(
      (ts("2024-01-01 00:10:00"), Option(5.0)),
      (ts("2024-01-01 00:20:00"), Option(99.0)), // range violation, w0
      (ts("2024-01-01 01:05:00"), None: Option[Double]), // null, w1
      (ts("2024-01-01 01:30:00"), Option(7.0)),
      (ts("2024-01-01 03:00:00"), Option(1.0)) // watermark pusher
    )
    val checks = Seq(NotNull("qty"), InRange("qty", 1, 50))
    val input = MemoryStream[(Timestamp, Option[Double])]
    val stream = Validation.windowedReport(
      input.toDF.toDF("ts", "qty").withWatermark("ts", "0 seconds"),
      "ts", "1 hour", checks)
    val q = stream.writeStream.format("memory").queryName("val_win_test")
      .outputMode("append").start()
    try {
      input.addData(data.take(4)); q.processAllAvailable()
      input.addData(data.drop(4)); q.processAllAvailable()
      val streamed = spark.table("val_win_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getString(5))).toSet
      val batch = Validation.windowedReport(
        data.take(4).toDF("ts", "qty"), "ts", "1 hour", checks)
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getString(5))).toSet
      assert(streamed === batch, "append-mode windows must equal batch")
      assert(streamed.exists { case (_, n, v, _, st) =>
        n.startsWith("in_range") && v == 1L && st == "fail" })
    } finally q.stop()
  }

  test("gated battery on the generated lineitem: unique fails, rest pass") {
    val dir = "/root/testdata/sf0.001"
    val out = Validation.lineitemChecks(
      sources.Tables.lineitem(spark, dir), sources.Tables.orders(spark, dir))
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(out.size == 8)
    // the synthetic generator does NOT enforce TPC-H's (orderkey,
    // linenumber) key — 1,401 duplicate pairs at sf0.001. The report's
    // job is to SAY so, which is exactly what makes it a useful gate
    assert(out("unique(l_orderkey, l_linenumber)") == "fail")
    assert((out - "unique(l_orderkey, l_linenumber)")
      .values.forall(_ == "pass"))
  }

  // ---- PSI drift (q171) ----

  private def psi(ref: Seq[(String, Long)], cur: Seq[(String, Long)]) =
    Validation.psiDrift(ref.toDF("g", "v"), cur.toDF("g", "v"),
        org.apache.spark.sql.functions.col("g"),
        org.apache.spark.sql.functions.col("v"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("psiDrift: identical snapshots score exactly 0") {
    val rows = (1 to 500).map(i => ("s", (i * 17 % 3000).toLong))
    val out = psi(rows, rows)
    assert(out("s")._5 === 0.0)
    assert(out("s")._2 === 500L && out("s")._3 === 500L)
  }

  test("psiDrift: a 4x scale shift reads as 'shifted' (> 0.25)") {
    val ref = (1 to 500).map(i => ("s", (100 + i % 100).toLong))
    val cur = ref.map { case (g, v) => (g, v * 4) } // blen + 2 everywhere
    val out = psi(ref, cur)
    assert(out("s")._5 > 0.25, s"psi = ${out("s")._5}")
    // and PSI is symmetric under snapshot swap
    assert(out("s")._5 === psi(cur, ref)("s")._5)
  }

  test("psiFromSketches over the streaming register state equals batch psiDrift") {
    // the monitor-without-rescan composition: reference = a stored batch
    // sketch; current = the LIVE quantileSketchStream state; PSI off the
    // two artifacts must equal the end-to-end batch report
    import org.apache.spark.sql.functions.{col, length}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val cur = docs.filter(col("doc_id") % 2 === 1)
    val input = MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingCuration.quantileSketchStream(
        input.toDF.toDF("g", "v"))
      .writeStream.format("memory").queryName("psi_regs_test")
      .outputMode("complete").start()
    try {
      val rows = cur.select(col("source"), length(col("text")).cast("long"))
        .as[(String, Long)].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamedPsi = Validation.psiFromSketches(
          graft.operators.Sketches.qsketchBuckets(ref, col("source"),
            length(col("text")).cast("long")),
          spark.table("psi_regs_test"))
        .collect().map(_.toSeq).toSet
      val batchPsi = Validation.psiDrift(ref, cur, col("source"),
          length(col("text")).cast("long"))
        .collect().map(_.toSeq).toSet
      assert(streamedPsi === batchPsi)
    } finally q.stop()
  }

  test("psiDrift: a group on one side only still gets a finite report") {
    val out = psi(Seq(("only_ref", 10L), ("both", 10L)),
      Seq(("both", 10L)))
    assert(out.keySet === Set("only_ref", "both"))
    assert(out("only_ref")._3 === 0L) // n_cur
    assert(!out("only_ref")._5.isNaN && !out("only_ref")._5.isInfinite)
    assert(out("both")._5 === 0.0)
  }

  test("tableProfile: exact counts/ndv/min-max per type family, nulls " +
       "counted not profiled, one-scan plan (single Expand)") {
    val t = Seq((1L, Some("a"), Some(2.5)), (2L, Some("a"), Some(-1.0)),
      (3L, None: Option[String], None: Option[Double]),
      (3L, Some("z"), Some(2.5)))
      .toDF("k", "s", "v")
    val prof = Validation.tableProfile(t, Seq("k", "s", "v"))
    val out = prof.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(out("k") === Seq(4L, 0L, 3L, 1.0, 3.0, null, null))
    assert(out("s") === Seq(4L, 1L, 2L, null, null, "a", "z"))
    assert(out("v") === Seq(4L, 1L, 2L, -1.0, 2.5, null, null))
    // one corpus read: the mixed distinct/plain set plans via Expand
    // over ONE scan, never a scan per column (Expand may appear once
    // per aggregation phase in the plan text; the scan count is the
    // contract)
    // (AQE's toString repeats the plan as "Initial Plan" — count scans
    // in the final section only)
    val plan = prof.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), s"expected Expand:\n$plan")
    assert(plan.split("LocalTableScan").length - 1 <= 1,
      s"expected a single scan:\n$plan")
  }

  private def diffMap(out: DataFrame): Map[Long, String] =
    out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("tableDiff: identical tables diff empty; each status classifies " +
       "its own mutation") {
    val left = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, Some("c"), 30L), (4L, None: Option[String], 40L))
      .toDF("k", "s", "v")
    assert(Validation.tableDiff(left, left, "k", Seq("s", "v")).count() === 0)
    val right = Seq( // 1 unchanged, 2 value-changed, 3 dropped, 5 inserted,
      (1L, Some("a"), 10L), (2L, Some("B"), 20L),
      (4L, None: Option[String], 40L), (5L, Some("e"), 50L))
      .toDF("k", "s", "v")
    val d = diffMap(Validation.tableDiff(left, right, "k", Seq("s", "v")))
    assert(d === Map(2L -> "changed", 3L -> "only_left", 5L -> "only_right"))
  }

  test("tableDiff: null-sentinel repr separates NULL from empty string " +
       "and values from column shifts, even with all keys in ONE bucket") {
    // nBuckets = 1 forces every key into the same dirty bucket: the
    // stage-2 compare must still emit ONLY genuinely differing keys
    // (bucket-mates with equal rows filter out)
    val left = Seq((1L, Some(""), Some("x")), (2L, Some("ab"), Some("c")),
      (3L, Some("same"), Some("same")))
      .toDF("k", "a", "b")
    val right = Seq((1L, None: Option[String], Some("x")),
      (2L, Some("a"), Some("bc")),
      (3L, Some("same"), Some("same")))
      .toDF("k", "a", "b")
    val d = diffMap(Validation.tableDiff(left, right, "k", Seq("a", "b"),
      nBuckets = 1))
    assert(d === Map(1L -> "changed", 2L -> "changed"))
  }

  test("streaming fingerprint registers equal the batch registers and " +
       "find the planted dirty buckets against a stored snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val snapshot = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "s")
    // the live feed: key 7 re-valued, key 201 new, key 50 absent
    val liveRows = (1L to 200L).filterNot(_ == 50L)
      .map(k => (k, if (k == 7L) "CHANGED" else s"v$k")) :+ (201L, "v201")
    val input = MemoryStream[(Long, String)]
    val q = Validation.fingerprintRegisters(
        input.toDF.toDF("k", "s"), "k", Seq("s"), nBuckets = 32)
      .writeStream.format("memory").queryName("fp_regs_test")
      .outputMode("complete").start()
    try {
      val (b1, b2) = liveRows.splitAt(liveRows.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("fp_regs_test")
      // register law: incremental state == one-shot batch fold
      val batch = Validation.fingerprintRegisters(
        liveRows.toDF("k", "s"), "k", Seq("s"), nBuckets = 32)
      assert(streamed.collect().map(_.toSeq).toSet ===
        batch.collect().map(_.toSeq).toSet)
      // diffing the LIVE registers against the stored snapshot's finds
      // exactly the buckets of the three planted differences
      val dirty = Validation.dirtyBuckets(
          Validation.fingerprintRegisters(snapshot, "k", Seq("s"),
            nBuckets = 32), streamed)
        .collect().map(_.getInt(0)).toSet
      val expect = Validation.tableDiff(snapshot, liveRows.toDF("k", "s"),
        "k", Seq("s"), nBuckets = 32)
      assert(expect.collect().map(r => r.getLong(0) -> r.getString(1))
        .toMap === Map(7L -> "changed", 50L -> "only_left",
          201L -> "only_right"))
      assert(dirty.size <= 3 && dirty.nonEmpty)
    } finally q.stop()
  }

  test("tableDiff plan: stage 2 gates both scans behind a broadcast " +
       "semi-join on the dirty-bucket set") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val plan = Validation.tableDiff(t, t, "k", Seq("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join gate in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"dirty-bucket set should broadcast in:\n$plan")
  }
}
