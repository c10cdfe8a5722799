package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{SolarStreaming, StateReport}

/** VERDICT r12 #8: the state-store observability report — per-operator
  * state rows/bytes from StreamingQueryProgress as a first-class
  * relation, with the flat-state property of the anomaly pipeline pinned
  * (the probes measured it at 1 M events; this keeps it true).
  */
class StateReportSpec extends SparkSpecBase {
  import spark.implicits._

  test("stateReport surfaces all five stateful operators and pins flat " +
    "state under the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String, Double)]
    val df = input.toDF().toDF("ts", "panel", "module", "power")
    val name = s"statereport_${System.nanoTime()}"
    val query = SolarStreaming.anomalyPipelineStream(df)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // six identical-shape waves a minute apart: each wave's arrival
      // advances the watermark past the previous wave's windows, so a
      // healthy pipeline holds only the in-flight windows' state
      val base = Timestamp.valueOf("2024-01-01 00:00:01").getTime
      for (w <- 0 until 6) {
        input.addData(Seq(
          (new Timestamp(base + w * 60000L), "p1", "m1", 10.0),
          (new Timestamp(base + w * 60000L + 1000), "p1", "m2", 40.0),
          (new Timestamp(base + w * 60000L + 2000), "p2", "m1", 5.0),
          (new Timestamp(base + w * 60000L + 3000), "p2", "m2", 9.0)): _*)
        query.processAllAvailable()
      }
      val states = StateReport.operatorStates(query)
      assert(states.nonEmpty)
      // the chain plans 7 stateful operator instances: the two
      // stream-stream joins plus five stateStoreSave aggregates (each
      // streaming aggregation's final save; SURVEY §2 rows 5-14)
      val ops = states.map(s => (s.opIndex, s.operatorName)).distinct
      assert(ops.size === 7, s"expected 7 stateful operators, got $ops")
      assert(ops.count(_._2 == "symmetricHashJoin") === 2, s"$ops")
      assert(ops.count(_._2 == "stateStoreSave") === 5, s"$ops")
      // every (batch, op) row is well-formed
      assert(states.forall(s => s.rowsTotal >= 0 && s.rowsUpdated >= 0))
      // FLAT STATE: for every operator the final batch's live rows are
      // not the high-water mark of the run — the watermark evicted, the
      // tail plateaued (an unbounded-state bug shows here as last==max
      // strictly growing), and eviction actually happened somewhere
      val growth = StateReport.growthSummary(query)
      assert(growth.size === 7)
      growth.foreach { g =>
        assert(g.lastRows <= g.maxRows, s"$g")
        assert(g.nBatches >= 6)
      }
      assert(growth.map(_.totalRemoved).sum > 0,
        "watermark never evicted any state row")
      // the last wave's state must not exceed the steady-state band: with
      // identical-shape waves, live rows at the end are bounded by the
      // peak seen mid-run (growth would break this)
      val lastTotal = growth.map(_.lastRows).sum
      val peakTotal = growth.map(_.maxRows).sum
      assert(lastTotal <= peakTotal)
      // the DataFrame form carries the same rows (the ops-sink shape)
      val reportDf = StateReport.stateReport(spark, query)
      assert(reportDf.columns.toSeq === Seq("batchId", "opIndex",
        "operatorName", "rowsTotal", "rowsUpdated", "rowsRemoved",
        "memoryBytes"))
      assert(reportDf.count() === states.size.toLong)
    } finally query.stop()
  }

  test("observedMetrics surfaces the inline observe taps per batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String, Double)]
    val df = SolarStreaming.observed(
      input.toDF().toDF("ts", "panel", "module", "power"), "ingest")
    val name = s"obsreport_${System.nanoTime()}"
    val query = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:00:01"), "p1", "m1", 10.0),
        (Timestamp.valueOf("2024-01-01 00:00:02"), "p1", "m2", 30.0))
      query.processAllAvailable()
      val obs = StateReport.observedMetrics(query)
      val byMetric = obs.filter(_.observation == "ingest")
        .groupBy(_.metric).view.mapValues(_.map(_.value).sum).toMap
      assert(byMetric("n_rows") === 2.0)
      assert(byMetric("sum_power") === 40.0)
      // the DataFrame sink shape
      val rdf = StateReport.observedReport(spark, query)
      assert(rdf.columns.toSeq ===
        Seq("batchId", "observation", "metric", "value"))
      assert(rdf.count() === obs.size.toLong)
    } finally query.stop()
  }
}
