package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.streaming.SolarStreaming

/** Checkpoint-recovery semantics: the reference wipes local state at every
  * start (`SolarConsumer.java:192` cleanUp()) and is at-least-once; this
  * engine checkpoints, so a stopped and restarted query must (a) resume
  * from the recorded offsets without reprocessing and (b) emit every
  * finalized window EXACTLY once across the restart boundary.
  */
class StreamingRecoverySpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("panel", StringType),
    StructField("module", StringType), StructField("power", DoubleType)))

  test("append-mode windows emit exactly once across a checkpointed restart") {
    val srcDir = Files.createTempDirectory("graft_src").toString
    val ckptDir = Files.createTempDirectory("graft_ckpt").toString
    val emitted = mutable.Buffer[(Long, String, String, Double)]()

    def writeBatch(rows: Seq[(Timestamp, String, String, Double)]): Unit =
      rows.toDF("ts", "panel", "module", "power")
        .coalesce(1).write.mode("append").parquet(srcDir)

    def runUntilIdle(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = SolarStreaming.moduleAggStream(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: DataFrame, _: Long) =>
          emitted ++= b.select("w_start", "panel", "module", "m_sum_power")
            .collect().map(r =>
              (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: window w0 gets data, then an event that closes it
    writeBatch(Seq(
      (ts("2024-01-01 00:00:05"), "p1", "m1", 10.0),
      (ts("2024-01-01 00:00:07"), "p1", "m1", 5.0),
      (ts("2024-01-01 00:02:00"), "p1", "m2", 1.0))) // watermark past w0
    runUntilIdle()
    val afterRun1 = emitted.toList
    assert(afterRun1.count(r => r._1 == 1704067200L && r._3 == "m1") === 1)
    assert(afterRun1.exists(_ === ((1704067200L, "p1", "m1", 15.0))))

    // run 2 (fresh query, same checkpoint): only NEW data is processed —
    // w0 must NOT re-emit, and the window closed by run 2's data emits once
    writeBatch(Seq(
      (ts("2024-01-01 00:05:00"), "p1", "m3", 2.0))) // closes m2's window
    runUntilIdle()
    val afterRun2 = emitted.toList
    assert(afterRun2.count(r => r._1 == 1704067200L && r._3 == "m1") === 1,
      s"w0 re-emitted after restart: $afterRun2")
    assert(afterRun2.count(r => r._3 == "m2") === 1) // closed exactly once
  }

  test("transformWithState recovers its ListState and timers across a restart") {
    val srcDir = Files.createTempDirectory("graft_tws_src").toString
    val ckptDir = Files.createTempDirectory("graft_tws_ckpt").toString
    val emitted = mutable.Buffer[(Long, String, String, Double)]()

    def writeBatch(rows: Seq[(Timestamp, String, String, Double)]): Unit =
      rows.toDF("ts", "panel", "module", "power")
        .coalesce(1).write.mode("append").parquet(srcDir)

    def runUntilIdle(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
        .as[graft.streaming.SolarStateful.Reading]
      val q = graft.streaming.SolarTws.moduleAggTws(spark, stream).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: DataFrame, _: Long) =>
          emitted ++= b.select("w_start", "panel", "module", "m_sum_power")
            .collect().map(r =>
              (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: m1's window stays OPEN (nothing moves the watermark past it)
    // — its buffer and timer live only in the RocksDB state store
    writeBatch(Seq(
      (ts("2024-01-01 00:00:05"), "p1", "m1", 10.0),
      (ts("2024-01-01 00:00:07"), "p1", "m1", 5.0)))
    runUntilIdle()
    assert(emitted.isEmpty)   // window open at shutdown

    // run 2 (fresh query, same checkpoint): the restored state must fold
    // with PRE-restart rows and flush once the watermark passes — if the
    // ListState or timer were lost, m1 would emit nothing or lose 15.0
    writeBatch(Seq(
      (ts("2024-01-01 00:02:00"), "p2", "m2", 1.0))) // moves the watermark
    runUntilIdle()
    val out = emitted.toList
    assert(out.count(_._3 == "m1") === 1, s"m1 windows: $out")
    assert(out.exists(_ === ((1704067200L, "p1", "m1", 15.0))),
      s"restored buffer lost data: $out")
  }
}
