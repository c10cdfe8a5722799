package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Pins the integer EWMA recurrence (q169): hand-folded exactness,
  * per-key reset, partitioning invariance, anomaly-band semantics, and
  * the streaming twin's batch equivalence on an ordered feed.
  */
class TimeSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private def run(rows: Seq[(Long, Timestamp, Long, Long)]) =
    TimeSeries.ewmaAnomaly(rows.toDF("k", "ts", "i", "x"),
        "k", "ts", "i", col("x"))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap

  test("recurrence matches a hand fold, div truncation included") {
    // key 1: x = 100, 110, 80 (scale 1e6, alpha 2/10)
    val out = run(Seq((1L, t(0), 10L, 100L), (1L, t(1), 11L, 110L),
      (1L, t(2), 12L, 80L)))
    val e1 = 100L * 1000000                       // 100000000
    val dev2 = math.abs(110L * 1000000 - e1)      // 10000000
    val e2 = (2 * 110L * 1000000 + 8 * e1) / 10   // 102000000
    val d2 = (2 * dev2) / 10                      // 2000000
    val dev3 = math.abs(80L * 1000000 - e2)       // 22000000
    val e3 = (2 * 80L * 1000000 + 8 * e2) / 10    // 97600000
    val d3 = (2 * dev3 + 8 * d2) / 10             // 6000000
    assert(out(10L) === ((e1, 0L, false)))
    assert(out(11L) === ((e2, d2, false)))
    assert(out(12L) === ((e3, d3, false)))        // warmup: n=3 <= 5
  }

  test("state resets at key boundaries; interleaved keys independent") {
    val a = run(Seq((1L, t(0), 1L, 100L), (2L, t(0), 2L, 500L),
      (1L, t(1), 3L, 100L), (2L, t(1), 4L, 500L)))
    assert(a(1L)._1 === 100000000L && a(3L)._1 === 100000000L)
    assert(a(2L)._1 === 500000000L && a(4L)._1 === 500000000L)
    assert(a.values.forall(_._2 == 0L)) // constant series: d stays 0
  }

  test("output is invariant to input partitioning") {
    val rows = (0 until 400).map { j =>
      (j % 7L, t(j / 7), j.toLong, (j * 37 % 200).toLong)
    }
    val one = TimeSeries.ewmaAnomaly(
      rows.toDF("k", "ts", "i", "x").repartition(1), "k", "ts", "i", col("x"))
      .collect().map(_.toSeq).toSet
    val many = TimeSeries.ewmaAnomaly(
      rows.toDF("k", "ts", "i", "x").repartition(13), "k", "ts", "i", col("x"))
      .collect().map(_.toSeq).toSet
    assert(one === many)
  }

  test("a constant series flags the first post-warmup jump, then adapts") {
    val rows = (0 until 8).map(j => (1L, t(j), j.toLong, 100L)) :+
      (1L, t(8), 8L, 200L)
    val out = run(rows)
    assert((0 until 8).forall(j => !out(j.toLong)._3))
    assert(out(8L)._3, "jump after a flat warmup must flag (dev > 3*0)")
  }

  test("seeded sweep: engine matches a reference fold across the param space") {
    // the differential-fuzz discipline applied in-process: random series
    // (ties, jumps, flats, negatives) and random (alpha, k, warmup)
    // against an independent driver-side fold of the recurrence
    for (seed <- Seq(11, 47, 901)) {
      val rnd = new scala.util.Random(seed)
      val aN = 1 + rnd.nextInt(9); val aD = 10
      val kk = 1 + rnd.nextInt(4); val wu = rnd.nextInt(6)
      val rows = (0 until 300).map { j =>
        val key = rnd.nextInt(5).toLong
        val x = rnd.nextInt(400).toLong - 50 // negatives included
        (key, t(j), j.toLong, x)
      }
      val got = TimeSeries.ewmaAnomaly(rows.toDF("k", "ts", "i", "x"),
          "k", "ts", "i", col("x"), alphaNum = aN, alphaDen = aD,
          k = kk, warmup = wu)
        .as[(Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
      val expected = rows.sortBy(r => (r._1, r._2.getTime, r._3))
        .groupBy(_._1).flatMap { case (_, series) =>
          var e = 0L; var d = 0L
          series.zipWithIndex.map { case ((_, _, i, x), idx) =>
            if (idx == 0) { e = x * 1000000L; d = 0L; i -> ((e, d, false)) }
            else {
              val dev = math.abs(x * 1000000L - e)
              val flag = idx + 1 > wu && dev > kk * d
              e = (aN * x * 1000000L + (aD - aN) * e) / aD
              d = (aN * dev + (aD - aN) * d) / aD
              i -> ((e, d, flag))
            }
          }
        }
      assert(got === expected, s"seed $seed (aN=$aN k=$kk wu=$wu)")
    }
  }

  test("streaming twin equals batch on a per-key time-ordered feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val stream = graft.streaming.StreamingTimeSeries.ewmaAnomalyStream(
      input.toDF.toDF("user_id", "ts", "event_id", "value"))
    val q = stream.writeStream.format("memory").queryName("ewma_test")
      .outputMode("append").start()
    try {
      // chronological batches preserve per-key order across batches
      val rows = events.select("user_id", "ts", "event_id", "value")
        .orderBy("ts", "event_id")
        .as[(Long, Timestamp, Long, Double)].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("ewma_test")
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      val batch = TimeSeries.eventEwmaAnomaly(events)
        .as[(Long, Long, Long, Long, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
