package graft

import graft.operators.Solar
import graft.sources.v2.SolarSimSource

class SolarSimSourceSpec extends SparkSpecBase {
  import spark.implicits._

  test("v2 source generates deterministic partitioned telemetry") {
    val df = spark.read.format("solar-sim")
      .option("panels", 3).option("modules", 4)
      .option("readingsPerModule", 50).load()
    assert(df.count() === 3L * 4 * 50)
    assert(df.rdd.getNumPartitions === 3) // one partition per panel
    assert(df.select("panel").distinct().as[String].collect().toSet
      === Set("panel-0", "panel-1", "panel-2"))
    // deterministic: same options -> same data
    val again = spark.read.format("solar-sim")
      .option("panels", 3).option("modules", 4)
      .option("readingsPerModule", 50).load()
    assert(df.agg(org.apache.spark.sql.functions.sum("power")).head.getDouble(0)
      === again.agg(org.apache.spark.sql.functions.sum("power")).head.getDouble(0))
    assert(SolarSimSource.powerAt(1, 2, 3) === SolarSimSource.powerAt(1, 2, 3))
  }

  test("simulated telemetry flows through the anomaly pipeline") {
    val events = spark.read.format("solar-sim")
      .option("panels", 2).option("modules", 5)
      .option("readingsPerModule", 60).load()
      .select($"ts", $"panel".as("event_type"),
        $"module".as("user_id"), $"power".as("value"))
    val out = Solar.pipeline(events)
    assert(out.count() > 0) // uniform random power yields some z-outliers
    assert(out.columns.contains("deviance"))
  }
}
