package graft

import graft.streaming.SolarTws

/** MapState TTL semantics for [[graft.streaming.CatCrossProcessor]]
  * (VERDICT r18 #3's MapState/TTL shape). TTL requires processing-time
  * mode, under which Spark constructs micro-batches continuously to
  * advance the state clock — the query NEVER reports idle, so
  * `processAllAvailable()` hangs (found live when StreamFuzz kind 14
  * first ran with a TTL'd state variable). These tests therefore
  * synchronize by deadline-polling the memory sink, and every negative
  * assertion ("no new alert") rides a same-batch SENTINEL crossing, so
  * it is decided by data that provably arrived, never by a sleep.
  *
  * Pinned semantics: within the TTL a crossed pair is fired-once (more
  * rows never re-alert); a pair idle past the TTL is wiped — its count
  * restarts below the threshold (not resumed at the old tally) and the
  * pair re-fires when it re-accumulates, the documented re-arm contract
  * for a monitoring alert over an unbounded key universe.
  */
class TwsTtlSpec extends SparkSpecBase {
  import spark.implicits._

  private def newInput() = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
  }

  /** Poll the memory sink until `cond` holds or the deadline passes —
    * the only sound synchronization under continuous processing-time
    * triggers (see class doc).
    */
  private def awaitTable(name: String, timeoutMs: Long)(
      cond: org.apache.spark.sql.DataFrame => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var ok = cond(spark.table(name))
    while (!ok && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      ok = cond(spark.table(name))
    }
    ok
  }

  test("within the TTL a crossed pair stays fired-once") {
    val input = newInput()
    val name = s"ttl_once_${System.nanoTime()}"
    // TTL far beyond the test's lifetime: nothing expires in here
    val q = SolarTws.catCrossAlerts(spark, input.toDS(), threshold = 2,
        ttl = Some(java.time.Duration.ofMinutes(10)))
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, "a"), (1L, "a"))
      assert(awaitTable(name, 30000)(_.count() === 1),
        "first crossing never arrived")
      // more (1, a) rows + a sentinel crossing in the SAME batch: when
      // the sentinel's alert lands, the a-rows were processed too
      input.addData((1L, "a"), (1L, "a"), (1L, "a"), (9L, "s"), (9L, "s"))
      assert(awaitTable(name, 30000)(_.count() === 2),
        "sentinel crossing never arrived")
      val rows = spark.table(name).as[(Long, String)].collect().toSet
      assert(rows === Set((1L, "a"), (9L, "s")),
        "a crossed pair re-alerted inside the TTL")
    } finally q.stop()
  }

  test("a pair idle past the TTL is wiped: count restarts below the " +
       "threshold and the pair re-fires on re-accumulation") {
    val input = newInput()
    val name = s"ttl_rearm_${System.nanoTime()}"
    val ttlMs = 2000L
    val q = SolarTws.catCrossAlerts(spark, input.toDS(), threshold = 2,
        ttl = Some(java.time.Duration.ofMillis(ttlMs)))
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1L, "a"), (1L, "a"))
      assert(awaitTable(name, 30000)(_.count() === 1),
        "first crossing never arrived")
      // idle past the TTL: expiry = state-update time + ttl, and the
      // update happened BEFORE the await returned, so sleeping 2x TTL
      // from here guarantees the entry is expired at the next read
      Thread.sleep(2 * ttlMs)
      // ONE (1, a) row + a sentinel crossing: the sentinel's alert
      // proves the row was processed; a must NOT re-alert yet — the
      // wiped count restarted at 1, below the threshold (had the old
      // tally survived, this row would have been its third and the
      // fired flag would still hold, also not alerting — the split
      // between wipe and resume is decided by the NEXT feed)
      input.addData((1L, "a"), (9L, "s"), (9L, "s"))
      assert(awaitTable(name, 30000)(_.count() === 2),
        "sentinel crossing never arrived")
      assert(spark.table(name).as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (9L, "s")), "count survived expiry, or phantom alert")
      // two more rows in ONE batch: the threshold is reached within the
      // batch whether or not the cnt=1 entry above survived a host
      // stall (1+2 or 0+2, both ≥ 2, both fired=false) — the pair
      // RE-FIRES iff expiry wiped the fired flag; a RESUMED state would
      // sit fired=true and stay silent, failing the await below
      input.addData((1L, "a"), (1L, "a"))
      assert(awaitTable(name, 30000)(
        _.as[(Long, String)].collect().count(_ == ((1L, "a"))) === 2),
        "expired pair never re-armed: TTL wipe did not restart the tally")
    } finally q.stop()
  }
}
