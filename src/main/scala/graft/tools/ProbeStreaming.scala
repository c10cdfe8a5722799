package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.Engine
import graft.streaming.SolarStreaming

/** Streaming throughput probe (VERDICT r8 #3): every streaming operator
  * was spec-verified at toy scale but none had a measured rows/s or
  * state-size figure. Drives the full 5-stateful-operator
  * `anomalyPipelineStream` with 1M MemoryStream events on local[32]
  * (RocksDB state store — the Engine default) and records:
  *  - end-to-end rows/s over the whole run,
  *  - per-micro-batch state rows (must PLATEAU, not grow, once the
  *    watermark starts finalizing windows — the eviction proof at a
  *    scale the specs don't reach).
  *
  * Event time advances 120 s (4 tumbling windows) per 100k-event batch,
  * with 1,000 live (panel, module) keys, so each batch closes the windows
  * the previous batch opened; the watermark (30 s delay) trails one
  * batch behind.
  */
object ProbeStreaming {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("probe-streaming").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // args: [batches] [perBatch] [mode] — default 10 x 100k "anomaly";
    // a 2 x 500k run measures how much of the steady-state floor is
    // per-micro-batch overhead (stateful ops x 32 shuffle partitions x
    // RocksDB commit) vs per-row cost. mode "curate" drives the
    // streaming curation twin (kernel enrichment + watermark-bounded
    // fp64 dedup + filters) with ~50-word docs, 10% exact duplicates.
    val batches = if (args.length > 0) args(0).toInt else 10
    val perBatch = if (args.length > 1) args(1).toInt else 100000
    val mode = if (args.length > 2) args(2) else "anomaly"
    val baseMs = 1704067200000L // 2024-01-01T00:00:00Z
    val ckpt = java.nio.file.Files
      .createTempDirectory("probe-streaming-ckpt").toString

    def drive[T](query: org.apache.spark.sql.streaming.StreamingQuery,
                 feed: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      var fed = 0L
      for (b <- 0 until batches) {
        feed(b)
        query.processAllAvailable()
        fed += perBatch
        val p = query.lastProgress
        val stateRows = p.stateOperators.map(_.numRowsTotal).sum
        val stateMb = p.stateOperators.map(_.memoryUsedBytes).sum / 1e6
        println(f"PROBE stream_batch b=$b fed=$fed state_rows=$stateRows " +
          f"state_mb=$stateMb%.1f batch_ms=${p.batchDuration}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE stream_${mode}_pipeline rows=$fed sec=$sec%.1f " +
        f"rows_per_sec=${fed / sec}%.0f")
      query.stop()
    }

    if (mode == "curate") {
      val input = MemoryStream[(Timestamp, Long, String)]
      val stream = graft.streaming.StreamingCuration.curateStream(
        input.toDF().toDF("ts", "doc_id", "text"),
        lang = "en", minQuality = 0.0, watermarkDelay = "30 seconds")
      val query = stream.writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt).start()
      drive(query, b => {
        val batch = (0 until perBatch).map { i =>
          val id = b.toLong * perBatch + i
          // 10% of docs repeat an earlier doc's text verbatim (dedup
          // work); the rest vary by a doc-unique token
          val k = if (i % 10 == 9) id - 9 else id
          val text = s"the quick brown fox w$k jumps over the lazy dog " +
            s"and then it was seen near the old mill where w${k % 1000} " +
            "people had gathered for the market day to trade wool and " +
            "grain with the visiting merchants from the northern villages " +
            "before the early winter storms closed the mountain roads"
          (new Timestamp(baseMs + (b * 120L + (i % 120)) * 1000L), id, text)
        }
        input.addData(batch: _*)
      })
    } else {
      val input = MemoryStream[(Timestamp, String, String, Double)]
      val df = input.toDF().toDF("ts", "panel", "module", "power")
      val query = SolarStreaming.anomalyPipelineStream(df)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt).start()
      drive(query, b => {
        val batch = (0 until perBatch).map { i =>
          // 4 windows per batch; 20 panels x 50 modules = 1,000 live keys
          val sec = b * 120L + (i % 120)
          (new Timestamp(baseMs + sec * 1000L),
            "p" + (i % 20), "m" + ((i / 20) % 50), (i % 100).toDouble)
        }
        input.addData(batch: _*)
      })
    }
    spark.stop()
  }
}
