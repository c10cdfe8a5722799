package graft

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.SolarStateful
import graft.streaming.SolarStateful._

/** Unit-level test of the custom-state fold via TestGroupState (Spark's
  * harness for mapGroupsWithState logic — no wall clock needed for the
  * processing-time timeout path).
  */
class SolarStatefulSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val key = ModuleKey("p1", "m1")

  test("readings fold into per-window buffers without emitting") {
    val state = TestGroupState.create[ModuleState](
      Optional.empty[ModuleState], GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.of(0L), hasTimedOut = false)
    val out = SolarStateful.updateGroup(key, Iterator(
      Reading(ts("2024-01-01 00:00:05"), "p1", "m1", 10.0),
      Reading(ts("2024-01-01 00:00:10"), "p1", "m1", 20.0),
      Reading(ts("2024-01-01 00:00:35"), "p1", "m1", 5.0)), state)
    assert(out.isEmpty)
    val open = state.get.open.map(b => b.w -> ((b.cnt, b.sum))).toMap
    assert(open(1704067200L) === ((2L, 30.0)))
    assert(open(1704067230L) === ((1L, 5.0)))
  }

  test("watermark past the window ends flushes buffers and clears state") {
    val state = TestGroupState.create[ModuleState](
      Optional.of(ModuleState(List(WindowBuf(1704067200L, 2L, 30.0), WindowBuf(1704067230L, 1L, 5.0)))),
      GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 60000L,
      eventTimeWatermarkMs = Optional.of(1704067260L * 1000L), hasTimedOut = true)
    val out = SolarStateful.updateGroup(key, Iterator.empty, state).toSeq
    assert(out === Seq(
      ModuleWindowAgg(1704067200L, "p1", "m1", 2L, 30.0, 15.0),
      ModuleWindowAgg(1704067230L, "p1", "m1", 1L, 5.0, 5.0)))
    assert(state.isRemoved)
  }

  test("partial flush: only watermark-finalized windows emit, rest stay open") {
    val state = TestGroupState.create[ModuleState](
      Optional.of(ModuleState(List(WindowBuf(1704067200L, 2L, 30.0), WindowBuf(1704067290L, 1L, 5.0)))),
      GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 60000L,
      eventTimeWatermarkMs = Optional.of(1704067260L * 1000L), hasTimedOut = false)
    val out = SolarStateful.updateGroup(key, Iterator.empty, state).toSeq
    assert(out === Seq(ModuleWindowAgg(1704067200L, "p1", "m1", 2L, 30.0, 15.0)))
    assert(state.get.open === List(WindowBuf(1704067290L, 1L, 5.0)))
  }

  test("custom-state stream emits once the watermark finalizes the window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, String, String, Double)]
    val name = s"custom_state_${System.nanoTime()}"
    val q = SolarStateful.moduleAggCustomState(spark,
        input.toDF().toDF("ts", "panel", "module", "power").as[Reading])
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:05"), "p1", "m1", 10.0),
        (ts("2024-01-01 00:00:10"), "p1", "m1", 20.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0) // window still open
      // advance the watermark past the window end via another key
      input.addData((ts("2024-01-01 00:02:00"), "p2", "m2", 1.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("w_start", "m_cnt", "m_sum_power", "m_avg_power")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(rows === Set((1704067200L, 2L, 30.0, 15.0)))
    } finally q.stop()
  }
}
