package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.AggFunctions

/** Round-22 probe: the r18→r19 q08 adjudication confirmed a real 1.57×
  * regression on the meanQ consumers — `MicrosSumAgg` as a
  * `TypedImperativeAggregate` forced the topology's widest groupBy onto
  * the ObjectHashAggregate path (serialized object buffers, no UnsafeRow
  * hash map) and dragged the sibling sum/count with it. This prices the
  * fixed-width `ImperativeAggregate` respelling head-to-head on
  * ProbeRound21's exact shape (100 M rows / 8 groups, local[32]):
  * `round(avg(x),4)` (the inexact floor) vs [[AggFunctions.mean4]].
  * Recorded (2026-08-16): see SURVEY.md round-22 table.
  */
object ProbeRound22 {

  private def timeMin(label: String)(f: => Unit): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE22 $label%-34s min=${ts.min}%7.2f s samples=" +
      ts.map(t => f"$t%.2f").mkString(","))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.builder("graft-probe22")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n1 = 100000000L
    val means = spark.range(n1).select((col("id") % 8).as("g"),
      ((col("id") * 37 % 200000).cast("double") / 100.0).as("x"))
    def meanOld(): Unit = { means.groupBy("g")
      .agg(round(avg(col("x")), 4).as("m"))
      .agg(sum("m")).collect(); () }
    def meanNew(): Unit = { means.groupBy("g")
      .agg(AggFunctions.mean4(col("x")).as("m"))
      .agg(sum("m")).collect(); () }
    meanOld(); meanNew() // warm both code paths
    timeMin("mean 100M: round(avg,4)")(meanOld())
    timeMin("mean 100M: mean4 exact")(meanNew())
    // the aggregate strategy the price depends on — must say HashAggregate
    val plan = means.groupBy("g").agg(AggFunctions.mean4(col("x")))
      .queryExecution.executedPlan.toString
    println("PROBE22 mean4 ObjectHashAggregate present: " +
      plan.contains("ObjectHashAggregate"))
    spark.stop()
  }
}
