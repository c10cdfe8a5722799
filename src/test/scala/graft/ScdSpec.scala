package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 build + point-in-time join semantics (q160/q161). */
class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (key, ts, tiebreak, status, tier) — one key's history with an
  // unchanged repeat, a null transition, a same-ts double change, and a
  // second key to prove partition isolation
  private def feed: DataFrame = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, "new", "gold"),
    (1L, ts("2024-01-05 00:00:00"), 11L, "new", "gold"), // unchanged: dropped
    (1L, ts("2024-01-10 00:00:00"), 12L, "active", "gold"), // change
    (1L, ts("2024-01-15 00:00:00"), 13L, "active", null), // value->null change
    (1L, ts("2024-01-15 00:00:00"), 14L, "dormant", null), // same-ts change
    (1L, ts("2024-01-20 00:00:00"), 15L, "dormant", null), // unchanged: dropped
    (2L, ts("2024-01-03 00:00:00"), 20L, "new", "silver")
  ).toDF("k", "t", "ord", "status", "tier")

  private def dim: DataFrame =
    Scd.scd2Build(feed, "k", "t", "ord", Seq("status", "tier"))

  test("change compaction keeps first row, real changes, null transitions; drops repeats") {
    val rows = dim.filter($"k" === 1L).orderBy($"version")
      .select($"version", $"valid_from", $"valid_to", $"is_current",
        $"status", $"tier")
      .collect()
    assert(rows.length == 4)
    // v1: [01-01, 01-10) new/gold — the 01-05 repeat folded in
    assert(rows(0).getInt(0) == 1 && rows(0).getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(rows(0).getTimestamp(2) == ts("2024-01-10 00:00:00"))
    // v2: [01-10, 01-15) active/gold
    assert(rows(1).getString(4) == "active" && rows(1).getString(5) == "gold")
    // v3: [01-15, 01-15) active/null — ZERO-WIDTH (same-ts double change)
    assert(rows(2).getTimestamp(1) == rows(2).getTimestamp(2))
    assert(rows(2).getString(5) == null)
    // v4: [01-15, null) dormant/null — current; the 01-20 repeat folded in
    assert(rows(3).getString(4) == "dormant" && rows(3).isNullAt(2))
    assert(rows(3).getInt(3) == 1)
    // exactly one current version per key
    assert(dim.filter($"is_current" === 1).groupBy($"k").count()
      .collect().forall(_.getLong(1) == 1L))
  }

  test("null->null is not a change; value->null is") {
    val d = dim.filter($"k" === 1L).orderBy($"version").collect()
    // tier goes gold, gold, null, null across versions 2..4 — the
    // null tier repeats only because STATUS changed; the 01-20 row
    // (dormant/null after dormant/null) was dropped
    assert(d.length == 4)
  }

  test("point-in-time join: boundaries, pre-history facts, zero-width skip") {
    val facts = Seq(
      (101L, 1L, ts("2023-12-25 00:00:00")), // before first version -> null
      (102L, 1L, ts("2024-01-01 00:00:00")), // == v1 valid_from -> v1
      (103L, 1L, ts("2024-01-09 23:59:59")), // last instant of v1
      (104L, 1L, ts("2024-01-10 00:00:00")), // == v2 valid_from -> v2
      (105L, 1L, ts("2024-01-15 00:00:00")), // zero-width v3 skipped -> v4
      (106L, 1L, ts("2025-06-01 00:00:00")), // far future -> current v4
      (107L, 2L, ts("2024-01-04 00:00:00"))  // second key -> its v1
    ).toDF("fact_id", "k", "ft")
    val d = dim.select($"k", $"valid_from", $"valid_to", $"version", $"status")
    val out = Scd.pointInTimeJoin(facts, d, "k", "ft")
      .select($"fact_id", $"version", $"status")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(out.size == 7, "left join must keep every fact exactly once")
    assert(out(101L) == ((-1, null)))
    assert(out(102L) == ((1, "new")))
    assert(out(103L) == ((1, "new")))
    assert(out(104L) == ((2, "active")))
    assert(out(105L) == ((4, "dormant")))
    assert(out(106L) == ((4, "dormant")))
    assert(out(107L) == ((1, "new")))
  }

  test("deterministic under input order: shuffled feed builds the same dim") {
    val shuffled = Scd.scd2Build(
      feed.orderBy(rand(7)).repartition(3), "k", "t", "ord",
      Seq("status", "tier"))
    assert(shuffled.exceptAll(dim).count() == 0 &&
      dim.exceptAll(shuffled).count() == 0)
  }

  test("gated rollup: every lineitem lands exactly once (row conservation)") {
    val dir = "/root/testdata/sf0.001"
    val li = sources.Tables.lineitem(spark, dir)
    val out = Scd.shipTimeStateRollup(li, sources.Tables.orders(spark, dir))
    val total = out.agg(sum($"n_items")).head().getLong(0)
    assert(total == li.count(),
      "point-in-time intervals must partition the timeline: no fact " +
        "duplicated by overlapping versions, none dropped by the left join")
  }

  test("cdcApply: every merge case folds last-writer-wins") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val changes = Seq(
      (2L, 1L, "U", "b2"),         // plain update
      (3L, 1L, "U", "c2"),         // update then delete → gone
      (3L, 2L, "D", null),
      (4L, 1L, "D", null),         // delete then REVIVE at a later seq
      (4L, 2L, "I", "d2"),
      (5L, 1L, "D", null),         // delete of a key not in base → no-op
      (6L, 1L, "I", "f"),          // insert of a new key
      (6L, 2L, "U", null)          // then update TO NULL (null is a value)
    ).toDF("k", "seq", "op", "v")
    val out = Scd.cdcApply(base, changes, "k", "seq", "op", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out === Map(1L -> "a", 2L -> "b2", 4L -> "d2", 6L -> null))
  }

  test("streaming cdcLatest state + applyLatest equals batch cdcApply") {
    // the materialized-view-maintenance twin: the latest-change relation
    // is maintained by the SAME aggregate on a stream (state = key
    // cardinality, no watermark), and merging it with the base goes
    // through the identical applyLatest path
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val feed = Seq(
      (2L, 1L, "U", "b2"), (3L, 1L, "U", "c2"),
      (3L, 2L, "D", null), (6L, 1L, "I", "f"))
    val input = MemoryStream[(Long, Long, String, String)]
    val q = Scd.cdcLatest(input.toDF.toDF("k", "seq", "op", "v"),
        "k", "seq", "op", Seq("v"))
      .writeStream.format("memory").queryName("cdc_latest_test")
      .outputMode("complete").start()
    try {
      val (b1, b2) = feed.splitAt(2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = Scd.applyLatest(base,
          spark.table("cdc_latest_test"), "k", Seq("v"))
        .collect().map(_.toSeq).toSet
      val batch = Scd.cdcApply(base,
          feed.toDF("k", "seq", "op", "v"), "k", "seq", "op", Seq("v"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("cdcApply: empty feed is identity; empty base is pure insert") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val empty = spark.emptyDataset[(Long, Long, String, String)]
      .toDF("k", "seq", "op", "v")
    assert(Scd.cdcApply(base, empty, "k", "seq", "op", Seq("v"))
      .collect().map(_.toSeq).toSet === Set(Seq(1L, "a")))
    val feed = Seq((9L, 1L, "I", "z")).toDF("k", "seq", "op", "v")
    assert(Scd.cdcApply(base.filter($"k" < 0), feed, "k", "seq", "op",
      Seq("v")).collect().map(_.toSeq).toSet === Set(Seq(9L, "z")))
  }
}
