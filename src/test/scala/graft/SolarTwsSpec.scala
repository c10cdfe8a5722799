package graft

import java.sql.Timestamp

import graft.streaming.{SolarStateful, SolarTws}
import graft.streaming.SolarStateful._

/** End-to-end tests of the transformWithState build (Spark 4's current
  * arbitrary-state API): suppressed emit-once semantics under the
  * watermark, timer-driven flush of quiet keys, and equivalence with the
  * legacy flatMapGroupsWithState twin on the same input.
  */
class SolarTwsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def newInput() = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, String, String, Double)]
  }

  test("TWS stream emits once the watermark finalizes the window") {
    val input = newInput()
    val name = s"tws_${System.nanoTime()}"
    val q = SolarTws.moduleAggTws(spark,
        input.toDF().toDF("ts", "panel", "module", "power").as[Reading])
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:05"), "p1", "m1", 10.0),
        (ts("2024-01-01 00:00:10"), "p1", "m1", 20.0))
      q.processAllAvailable()
      assert(spark.table(name).count() === 0) // window still open
      // advance the watermark past the window end via another key: m1 has
      // no new rows, so its flush must come from the registered timer
      input.addData((ts("2024-01-01 00:02:00"), "p2", "m2", 1.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .filter($"module" === "m1")
        .select("w_start", "m_cnt", "m_sum_power", "m_avg_power")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(rows === Set((1704067200L, 2L, 30.0, 15.0)))
    } finally q.stop()
  }

  test("threshold alerts fire exactly once per key, at the crossing count") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val name = s"alerts_${System.nanoTime()}"
    val q = SolarTws.thresholdAlerts(spark, input.toDS(), threshold = 3L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData("a", "a", "b"); q.processAllAvailable()
      assert(spark.table(name).count() === 0)       // nobody crossed yet
      input.addData("a", "b", "b"); q.processAllAvailable()
      // both cross in this batch; 'a' lands exactly on 3, 'b' on 3
      input.addData("a", "a", "b"); q.processAllAvailable() // no re-fire
      val alerts = spark.table(name)
        .as[SolarTws.Alert].collect().map(a => a.tok -> a.cnt).toMap
      assert(alerts === Map("a" -> 3L, "b" -> 3L))  // once each, at crossing
    } finally q.stop()
  }

  test("TWS and legacy flatMapGroupsWithState emit identical finalized windows") {
    val data = Seq(
      (ts("2024-01-01 00:00:05"), "p1", "m1", 10.0),
      (ts("2024-01-01 00:00:29"), "p1", "m1", 2.0),
      (ts("2024-01-01 00:00:31"), "p1", "m2", 7.0),
      (ts("2024-01-01 00:01:04"), "p2", "m3", 5.0),
      (ts("2024-01-01 00:05:00"), "p9", "m9", 0.0)) // watermark driver
    def run(build: org.apache.spark.sql.Dataset[Reading] =>
              org.apache.spark.sql.Dataset[ModuleWindowAgg]): Set[ModuleWindowAgg] = {
      val input = newInput()
      val name = s"twin_${System.nanoTime()}"
      val q = build(input.toDF().toDF("ts", "panel", "module", "power").as[Reading])
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        data.foreach { r => input.addData(r); q.processAllAvailable() }
        spark.table(name).as[ModuleWindowAgg].collect().toSet
      } finally q.stop()
    }
    val tws = run(SolarTws.moduleAggTws(spark, _))
    val legacy = run(SolarStateful.moduleAggCustomState(spark, _))
    assert(tws === legacy)
    assert(tws.nonEmpty)
  }
}
