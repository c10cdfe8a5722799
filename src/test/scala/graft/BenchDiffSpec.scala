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
}
