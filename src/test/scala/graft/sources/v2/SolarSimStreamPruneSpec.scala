package graft.sources.v2

import org.apache.spark.sql.sources.{EqualTo, In}
import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r12: `pushFilters` claims panel `=`/`IN` predicates as EXACTLY
  * handled (no residual), so every read path must honor the pruning —
  * including the streaming one, which previously planned all panels.
  * Latent with today's MicroBatchExecution (it never calls pushdown on a
  * streaming scan), but the contract must hold regardless of engine
  * behavior: this pins the micro-batch planner against the same pushed
  * filters the batch planner prunes on. Pure planning-level test, no
  * SparkSession needed.
  */
class SolarSimStreamPruneSpec extends AnyFunSuite {

  private def scanWith(filters: org.apache.spark.sql.sources.Filter*): SolarSimScan = {
    val scan = SolarSimScan(panels = 4, modules = 2, readingsPerModule = 10,
      startEpochSec = 0L, periodSec = 10L, readingsPerTrigger = 5)
    val residual = scan.pushFilters(filters.toArray)
    assert(residual.isEmpty, "panel predicates must be claimed exactly")
    scan
  }

  private def streamPanels(scan: SolarSimScan): Seq[Int] = {
    val mb = scan.toMicroBatchStream("unused")
    mb.planInputPartitions(SimOffset(0L), SimOffset(5L)).toSeq
      .map(_.asInstanceOf[SolarStreamPartition].panel)
  }

  test("streaming planInputPartitions honors a pushed panel equality") {
    assert(streamPanels(scanWith(EqualTo("panel", "panel-2"))) === Seq(2))
  }

  test("streaming planInputPartitions honors a pushed IN set") {
    assert(streamPanels(scanWith(In("panel", Array("panel-0", "panel-3"))))
      === Seq(0, 3))
  }

  test("contradictory pushed conjunction plans zero streaming partitions") {
    assert(streamPanels(scanWith(
      EqualTo("panel", "panel-1"), EqualTo("panel", "panel-2"))) === Seq.empty)
  }

  test("no pushdown plans every panel (batch and stream agree)") {
    val scan = SolarSimScan(panels = 3, modules = 2, readingsPerModule = 10,
      startEpochSec = 0L, periodSec = 10L)
    assert(streamPanels(scan) === Seq(0, 1, 2))
    assert(scan.planInputPartitions().length === 3)
  }
}
