package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Pins the ε-DP release (q156): determinism under the seed, seed
  * sensitivity, the two-sided-geometric shape of the noise stream, and
  * the no-raw-counts contract of the released schema.
  */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "src0"),
    (2L, "the quick brown fox jumps over the lazy dog", "src0"),
    (3L, "one two three four five six seven eight", "src1"),
    (4L, "short", "src1"),
    (5L, "the and of to in it is was for on", "src2")
  ).toDF("doc_id", "text", "source")

  test("release is deterministic under the seed and moves with it") {
    val a = Privacy.dpSourceRelease(docs, eps = 1.0, seed = 7L)
      .collect().map(_.toSeq).toSet
    val b = Privacy.dpSourceRelease(docs, eps = 1.0, seed = 7L)
      .collect().map(_.toSeq).toSet
    val c = Privacy.dpSourceRelease(docs, eps = 1.0, seed = 8L)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a !== c) // a different seed draws a different noise stream
  }

  test("released schema carries no un-noised count") {
    val cols = Privacy.dpSourceRelease(docs).columns.toSet
    assert(cols === Set("source", "n_docs_dp", "n_hi_quality_dp", "epsilon"))
  }

  test("noise is integer-valued, centered, and two-sided over many keys") {
    // 20k independent keys at eps=0.5: the two-sided geometric has mean 0,
    // P(N=0) = (1-a)/(1+a) ≈ 0.2449 with a = e^-0.5, and symmetric tails.
    // The stream is deterministic, so these are fixed-fixture assertions
    // with generous tolerances, not flaky statistics.
    val keys = (1 to 20000).toDF("i").select(concat(lit("k"), col("i")).as("k"))
    val drawn = keys.select(
        Privacy.twoSidedGeometric(col("k"), eps = 0.5).as("n"))
      .as[Long].collect()
    assert(drawn.forall(n => n == n.toInt.toLong)) // integers (longs)
    val mean = drawn.sum.toDouble / drawn.length
    assert(math.abs(mean) < 0.1, s"mean $mean")
    val pZero = drawn.count(_ == 0L).toDouble / drawn.length
    assert(math.abs(pZero - 0.2449) < 0.02, s"P(0) $pZero")
    val pos = drawn.count(_ > 0L); val neg = drawn.count(_ < 0L)
    assert(math.abs(pos - neg).toDouble / drawn.length < 0.02)
    // eps controls the spread: a tighter eps concentrates the noise
    val tight = keys.select(
        Privacy.twoSidedGeometric(col("k"), eps = 2.0).as("n"))
      .as[Long].collect()
    assert(tight.map(math.abs).sum < drawn.map(math.abs).sum)
  }

  test("released counts sit within the mechanism's plausible band") {
    // at eps/2 = 0.5 per stat, P(|noise| > 40) < 2e-9: for this fixed
    // seed the release must stay within ±40 of the true counts
    val out = Privacy.dpSourceRelease(docs, eps = 1.0, seed = 0L)
      .select("source", "n_docs_dp").as[(String, Long)].collect().toMap
    val truth = Map("src0" -> 2L, "src1" -> 2L, "src2" -> 1L)
    truth.foreach { case (s, n) =>
      assert(math.abs(out(s) - n) <= 40, s"$s released ${out(s)} vs $n")
    }
  }

  test("invalid epsilon is rejected") {
    intercept[IllegalArgumentException] {
      Privacy.dpSourceRelease(docs, eps = 0.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.twoSidedGeometric(lit("k"), eps = -1.0)
    }
  }

  test("kAnonymityReport: class size and diversity verdicts are exact") {
    import spark.implicits._
    // class (a): 1 row → fails k; class (b): 3 rows, one sensitive
    // value → k ok at 3, fails l; class (c): 3 rows, two values → passes
    val rows = Seq(
      ("a", "x", 1), ("b", "x", 0), ("b", "x", 0), ("b", "x", 0),
      ("c", "x", 0), ("c", "x", 1), ("c", "x", 0))
      .toDF("q1", "q2", "s")
    val out = Privacy.kAnonymityReport(rows, Seq("q1", "q2"),
        org.apache.spark.sql.functions.col("s"), k = 3, l = 2)
      .as[(String, String, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", "x", 1L, 1L, false, false)))
    assert(out("b") === (("b", "x", 3L, 1L, true, false)))
    assert(out("c") === (("c", "x", 3L, 2L, true, true)))
  }

  test("kAnonymize: per-level release, pooled-unsafe promotion, " +
       "suppression, and row conservation (k = 3)") {
    // hierarchy nation → region. Classes (seg fixed at 's'):
    //   n1/rA ×3  → safe at level 0
    //   n2/rA ×2, n3/rA ×2 → unsafe alone, but their POOLED 4 rows make
    //     rA safe at level 1 (the in-flight-rows subtlety: n1's released
    //     3 rows must NOT be what rescues them)
    //   n4/rB ×2 → unsafe at level 0 AND level 1 (rB pool = 2) → '*'
    //     … and the '*' pool (2 rows) is still < k → suppressed
    val rows = (
      (1 to 3).map(i => (i.toLong, "n1", "rA", "s")) ++
      Seq((4L, "n2", "rA", "s"), (5L, "n2", "rA", "s")) ++
      Seq((6L, "n3", "rA", "s"), (7L, "n3", "rA", "s")) ++
      Seq((8L, "n4", "rB", "s"), (9L, "n4", "rB", "s"))
    ).toDF("id", "nation", "region", "seg")
    val out = Privacy.kAnonymize(rows, "id", Seq("nation", "region"),
        Seq("seg"), k = 3)
      .as[(Long, String, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size === 9) // row conservation
    (1L to 3L).foreach(i => assert(out(i) === (("n1", 0))))
    (4L to 7L).foreach(i => assert(out(i) === (("rA", 1))))
    (8L to 9L).foreach(i => assert(out(i) === (("*", -1))))
    // and every RELEASED class in the output really holds >= k rows
    val classes = out.values.filter(_._2 >= 0).groupBy(identity)
      .view.mapValues(_.size)
    assert(classes.forall(_._2 >= 3), s"undersized release: $classes")
  }

  test("forget + forgetReceipt: purge drops exactly the keyed rows and " +
       "the receipt's arithmetic matches; unknown ids delete nothing") {
    val t = Seq((1L, "a"), (2L, "b"), (2L, "c"), (3L, "d"))
      .toDF("uid", "payload")
    val ids = Seq(2L, 99L).toDF("the_id") // 99 matches nothing
    val purged = Privacy.forget(t, "uid", ids)
    assert(purged.select("uid").as[Long].collect().sorted === Seq(1L, 3L))
    val receipt = Privacy.forgetReceipt(Seq(("t", t, "uid")), ids).head()
    assert((receipt.getString(0), receipt.getLong(1), receipt.getLong(2),
      receipt.getLong(3)) === (("t", 4L, 2L, 2L)))
    assert(receipt.getLong(3) === purged.count())
    val none = Privacy.forgetReceipt(Seq(("t", t, "uid")),
      Seq(77L).toDF("x")).head()
    assert((none.getLong(1), none.getLong(2), none.getLong(3)) ===
      ((4L, 0L, 4L)))
  }
}
