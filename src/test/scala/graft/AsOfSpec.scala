package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics: most-recent-right-row-per-left-row, `<=` time
  * inclusion, deterministic equal-time tie-break, null for no-match, and
  * the no-NLJ plan shape.
  */
class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  // left: (key, t, name); right: (key, t, ord, px)
  private def left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"), ("b", 10L, "l3")
  ).toDF("k", "t", "name")
  private def right = Seq(
    ("a", 8L, 1L, 100.0), ("a", 10L, 2L, 110.0), ("a", 10L, 3L, 120.0),
    ("a", 15L, 4L, 130.0), ("b", 99L, 5L, 140.0)
  ).toDF("k", "t", "ord", "px")

  test("asOfJoin attaches the most recent right row, <= inclusive, max-ord tie-break") {
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "ord", Seq("ord", "px"))
      .select("name", "ord", "px").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      ("l0", None, None),               // t=5: no quote yet
      ("l1", Some(3L), Some(120.0)),    // t=10: equal-time quotes visible, ord 3 wins
      ("l2", Some(4L), Some(130.0)),    // t=20: latest is t=15
      ("l3", None, None)))              // b: quote only at t=99 > 10
  }

  test("asOfJoin payload is row-atomic: a NULL field never mixes right rows") {
    // newest quote (ord=2) carries a NULL px; the left row must see
    // (ord=2, px=NULL) — NOT ord from the newest row and px from the older
    val r = Seq(
      ("a", 8L, Some(1L), Some(100.0)),
      ("a", 10L, Some(2L), None)
    ).toDF("k", "t", "ord", "px")
    val out = AsOf.asOfJoin(Seq(("a", 20L, "l1")).toDF("k", "t", "name"),
      r, Seq("k"), "t", "ord", Seq("ord", "px"))
      .select("name", "ord", "px").collect().map(row =>
        (row.getString(0), Option(row.get(1)), Option(row.get(2)))).toSet
    assert(out === Set(("l1", Some(2L), None)))
  }

  test("asOfJoin plan is shuffle+window, not a nested-loop range join") {
    val plan = AsOf.asOfJoin(left, right, Seq("k"), "t", "ord", Seq("px"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range-join NLJ shape in plan:\n$plan")
    assert(plan.contains("Window"), s"expected Window operator:\n$plan")
  }

  test("bin-bucketed proximity join equals the brute-force interval join") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val got = graft.operators.RangeJoin
      .proximityPairs(ev, "error", "purchase", tolSec = 3600)
      .select("id_a", "id_b", "dt_us").as[(Long, Long, Long)].collect().toSet
    val base = ev.select(col("event_id"), unix_micros(col("ts")).as("t"),
      col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val as = base.filter(_._4 == "error"); val bs = base.filter(_._4 == "purchase")
    val expected = (for {
      a <- as; b <- bs
      if a._3 == b._3 && math.abs(b._2 - a._2) <= 3600000000L
    } yield (a._1, b._1, b._2 - a._2)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("left-outer proximity join keeps unmatched errors as ONE " +
    "null-padded row each") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val out = graft.operators.RangeJoin
      .proximityPairsLeftOuter(ev, "error", "purchase", tolSec = 3600)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val inner = out.filter(_._2.isDefined).map(_._1).toSet
    val padded = out.filter(_._2.isEmpty).map(_._1)
    // every error appears; matched ids never carry a null row; unmatched
    // ids carry exactly one
    val allErrors = ev.filter(col("event_type") === "error")
      .select("event_id").as[Long].collect().toSet
    assert((inner ++ padded).toSet === allErrors)
    assert(padded.toSet.intersect(inner).isEmpty)
    assert(padded.length === padded.toSet.size)
    assert(padded.nonEmpty) // the fixture has lonely errors
  }

  test("right- and full-outer proximity joins complete the flavor matrix") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val inner = graft.operators.RangeJoin
      .proximityPairs(ev, "error", "purchase", tolSec = 3600)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val allErrors = ev.filter(col("event_type") === "error")
      .select("event_id").as[Long].collect().toSet
    val allPurchases = ev.filter(col("event_type") === "purchase")
      .select("event_id").as[Long].collect().toSet

    // right outer: inner pairs exactly, plus ONE pad per lonely purchase
    val ro = graft.operators.RangeJoin
      .proximityPairsRightOuter(ev, "error", "purchase", tolSec = 3600)
      .select("id_a", "id_b").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1)))
    assert(ro.filter(_._1.isDefined).map(p => (p._1.get, p._2)).toSet
      === inner)
    val paddedB = ro.filter(_._1.isEmpty).map(_._2)
    assert(paddedB.length === paddedB.toSet.size)
    assert(paddedB.toSet === allPurchases -- inner.map(_._2))
    assert(paddedB.nonEmpty) // the fixture has lonely purchases

    // full outer: inner ∪ one pad per lonely error ∪ one per lonely
    // purchase, and never a both-null row
    val fo = graft.operators.RangeJoin
      .proximityPairsFullOuter(ev, "error", "purchase", tolSec = 3600)
      .select("id_a", "id_b").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(fo.filter(p => p._1.isDefined && p._2.isDefined)
      .map(p => (p._1.get, p._2.get)).toSet === inner)
    val foA = fo.filter(_._2.isEmpty).map(_._1.get)
    val foB = fo.filter(_._1.isEmpty).map(_._2.get)
    assert(foA.toSet === allErrors -- inner.map(_._1))
    assert(foA.length === foA.toSet.size)
    assert(foB.toSet === allPurchases -- inner.map(_._2))
    assert(foB.length === foB.toSet.size)
    assert(!fo.exists(p => p._1.isEmpty && p._2.isEmpty))
  }

  test("tradesWithLatestQuote matches a per-row reference on real events") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val base = ev.select(col("event_id"), unix_micros(col("ts")).as("t"),
      col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val quotes = base.filter(_._1 % 2 == 1)
    def expectedFor(uid: Long, t: Long): Option[(Long, Double)] = {
      val c = quotes.filter(q => q._3 == uid && q._2 <= t)
      if (c.isEmpty) None
      // max by (t, q_id) — same tie semantics as the operator
      else { val m = c.maxBy(q => (q._2, q._1)); Some((m._1, math.rint(m._4 * 1e4) / 1e4)) }
    }
    val got = AsOf.tradesWithLatestQuote(ev)
      .filter(col("q_id").isNotNull)
      .select("event_id", "user_id", "t", "q_id", "q_value").collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getDouble(4)))).toMap
    val trades = base.filter(_._1 % 2 == 0)
    val expected = trades.flatMap(tr => expectedFor(tr._3, tr._2).map(tr._1 -> _)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
