package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchDiff

/** BenchDiff must read back exactly what Bench.fullLine writes (the two
  * are a serialization pair — a format drift would silently zero the
  * diff), and its jitter-vs-regression envelope logic decides from the
  * recorded samples, not the minima alone.
  */
class BenchDiffSpec extends AnyFunSuite {

  private val results = Seq(
    "q01_scan_project" -> Seq(1.0, 1.5, 2.0),
    "q84_lm_perplexity" -> Seq(0.25, 0.3, 0.9),
    "q999_failed" -> Seq(-1.0, -1.0, -1.0))

  test("parse round-trips Bench.fullLine") {
    val rec = BenchDiff.parse(Bench.fullLine(results, "/tmp/sf"))
    assert(rec.mins === Map("q01_scan_project" -> 1.0,
      "q84_lm_perplexity" -> 0.25, "q999_failed" -> -1.0))
    assert(rec.samples("q01_scan_project") === Seq(1.0, 1.5, 2.0))
    assert(rec.total === 1.25) // failure marker excluded
    // medians 1.5 + 0.3 over total 1.25 (6-decimal wire rounding)
    assert(math.abs(rec.noise - 1.44) < 1e-6)
  }

  test("movers: slowdown inside the old sample envelope is jitter") {
    val old = BenchDiff.Rec(Map("q" -> 1.0), Map("q" -> Seq(1.0, 1.5, 2.0)),
      1.0, 1.5)
    def neu(min: Double) =
      BenchDiff.Rec(Map("q" -> min), Map("q" -> Seq(min, min, min)), min, 1.0)
    // 1.4x but below the old max sample 2.0: old code reached this under
    // noise, so nothing is proven
    assert(BenchDiff.movers(old, neu(1.4)).head._5 === "jitter")
    // 2.5x AND above anything the old record ever observed
    assert(BenchDiff.movers(old, neu(2.5)).head._5 === "REGRESSION?")
    // inside the band: not a mover at all
    assert(BenchDiff.movers(old, neu(1.2)).isEmpty)
  }

  test("movers: improvement needs the new envelope to exclude the old min") {
    def rec(samples: Seq[Double]) =
      BenchDiff.Rec(Map("q" -> samples.min), Map("q" -> samples),
        samples.min, 1.0)
    // new min 0.5 (2x faster) but a new sample hit 1.2 > old min 1.0:
    // the new code still wanders above the old cost — jitter
    assert(BenchDiff.movers(rec(Seq(1.0, 1.0, 1.0)),
      rec(Seq(0.5, 0.6, 1.2))).head._5 === "jitter")
    // every new sample beats the old min: confirmed improvement
    assert(BenchDiff.movers(rec(Seq(1.0, 1.0, 1.0)),
      rec(Seq(0.5, 0.6, 0.7))).head._5 === "improved")
  }

  test("failure markers are not comparable") {
    val old = BenchDiff.Rec(Map("q" -> -1.0), Map.empty, 0.0, 1.0)
    val neu = BenchDiff.Rec(Map("q" -> 1.0), Map.empty, 1.0, 1.0)
    assert(BenchDiff.movers(old, neu).isEmpty)
  }

  test("diffBlock embeds the envelope verdict against the prior record") {
    val prev = java.nio.file.Files.createTempFile("bench_prev_", ".json")
    try {
      // prior record: q01 min 1.0 (envelope to 2.0), q84 min 0.25
      java.nio.file.Files.write(prev,
        (Bench.fullLine(results, "/tmp/sf") + "\n").getBytes("UTF-8"))
      // new run: q01 5x slower beyond the old envelope (REGRESSION?),
      // q84 1.6x slower but inside the old 0.9 max sample (jitter)
      val now = Seq(
        "q01_scan_project" -> Seq(5.0, 5.0, 5.0),
        "q84_lm_perplexity" -> Seq(0.4, 0.4, 0.4))
      val d = Bench.diffBlock(now, prev.toString)
      assert(d.startsWith(""","diff_vs_prev":{"prev_total":1.25,"""), d)
      assert(d.contains(""""regressions":{"q01_scan_project":{"ratio":5"""), d)
      assert(d.contains(""""improved":{}"""), d)
      assert(d.contains(""""jitter_movers":1"""), d)
      // the block must itself survive a fullLine round-trip as valid
      // parse input (scalars only — no new array shapes)
      val rec = BenchDiff.parse(Bench.fullLine(now, "/tmp/sf", d))
      assert(rec.mins("q01_scan_project") === 5.0)
      // no prior record → no block, never a throw
      assert(Bench.diffBlock(now, "/nonexistent/bench.json") === "")
    } finally java.nio.file.Files.deleteIfExists(prev)
  }

  test("file record names EVERY mover; stdout cap keeps 6; improved cap " +
       "keeps the biggest wins") {
    // synthetic all-regressed round: 10 queries, every one 5x slower and
    // beyond its old envelope — the r17 driver round flagged 19 movers
    // but named only 6, hiding most of its own work-list (VERDICT r17 #2)
    val regressed = (1 to 10).map(i => f"q$i%02d_syn" -> Seq(5.0, 5.0, 5.0))
    val prevRec = (1 to 10).map(i => f"q$i%02d_syn" -> Seq(1.0, 1.0, 1.0))
    // plus 10 improved queries at DISTINCT win factors (2x..11x faster)
    // so the cap's ordering is observable: biggest wins must survive it
    val improved = (1 to 10).map(i =>
      f"q$i%02d_imp" -> Seq(1.0 / (i + 1), 1.0 / (i + 1), 1.0 / (i + 1)))
    val prevImp = (1 to 10).map(i => f"q$i%02d_imp" -> Seq(1.0, 1.0, 1.0))
    val prev = java.nio.file.Files.createTempFile("bench_prev_", ".json")
    try {
      java.nio.file.Files.write(prev,
        (Bench.fullLine(prevRec ++ prevImp, "/tmp/sf") + "\n")
          .getBytes("UTF-8"))
      val full = Bench.diffBlock(regressed ++ improved, prev.toString)
      val capped = Bench.diffBlock(regressed ++ improved, prev.toString,
        cap = 6)
      def namedIn(block: String, suffix: String) =
        ("\"(q\\d\\d_" + suffix + ")\":\\{\"ratio\"").r
          .findAllMatchIn(block).map(_.group(1)).toSeq
      // uncapped: all 10 regressions AND all 10 improvements named
      assert(namedIn(full, "syn").toSet ===
        (1 to 10).map(i => f"q$i%02d_syn").toSet)
      assert(namedIn(full, "imp").toSet ===
        (1 to 10).map(i => f"q$i%02d_imp").toSet)
      assert(full.contains("\"n_regressions\":10"))
      // capped: exactly 6 per category, counts still report the full 10
      assert(namedIn(capped, "syn").size === 6)
      assert(namedIn(capped, "imp").size === 6)
      assert(capped.contains("\"n_regressions\":10"))
      assert(capped.contains("\"n_improved\":10"))
      // improved cap keeps the BIGGEST wins (q05..q10, ratios 1/6..1/11),
      // not the least-improved (ADVICE r17: ratio-desc take(6) named the
      // movers closest to the band)
      assert(namedIn(capped, "imp").toSet ===
        (5 to 10).map(i => f"q$i%02d_imp").toSet)
    } finally java.nio.file.Files.deleteIfExists(prev)
  }
}
