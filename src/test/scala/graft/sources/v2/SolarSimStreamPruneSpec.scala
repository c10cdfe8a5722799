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

  test("runtime filtering (SupportsRuntimeFiltering) prunes batch partitions") {
    val scan = SolarSimScan(panels = 4, modules = 2, readingsPerModule = 10,
      startEpochSec = 0L, periodSec = 10L)
    assert(scan.filterAttributes().map(_.describe()).toSeq === Seq("panel"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("panel", Array("panel-1", "panel-3"))))
    assert(scan.planInputPartitions().toSeq
      .map(_.asInstanceOf[SolarPanelPartition].panel) === Seq(1, 3))
    // composes with planning-time pushdown: the intersection prunes
    scan.pushFilters(Array(EqualTo("panel", "panel-3")))
    assert(scan.planInputPartitions().toSeq
      .map(_.asInstanceOf[SolarPanelPartition].panel) === Seq(3))
    // non-panel runtime filters are ignored, never wrong
    val scan2 = SolarSimScan(panels = 2, modules = 2, readingsPerModule = 10,
      startEpochSec = 0L, periodSec = 10L)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("power", java.lang.Double.valueOf(1.0))))
    assert(scan2.planInputPartitions().length === 2)
  }
}
