package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.Solar

/** Edge-case fixtures from FIXTURES.md §3 for the solar anomaly pipeline. */
class SolarSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** events-table-shaped frame: (ts, event_type, user_id, value). */
  private def events(rows: (String, String, Long, Double)*): DataFrame =
    rows.map { case (t, p, m, v) => (ts(t), p, m, v) }
      .toDF("ts", "event_type", "user_id", "value")

  test("two-module window: rounded-mean variance and z-filter") {
    // window [00:00:00, 00:00:30): module 1 sums 10.0, module 2 sums 30.0
    // panel avg = round(20.0, 1) = 20.0; squares = 100 + 100 = 200
    // variance = 100.0; deviance = round(sqrt(100), 1) = 10.0
    // |10-20| = 10 > 10 is FALSE -> no anomaly for either module
    val df = Solar.pipeline(events(
      ("2024-01-01 00:00:05", "p1", 1L, 10.0),
      ("2024-01-01 00:00:10", "p1", 2L, 30.0)))
    assert(df.count() === 0)
  }

  test("three-module window flags the outlier") {
    // sums: 10, 10, 40 -> avg = 20.0; squares = 100+100+400 = 600
    // variance = 200; deviance = round(14.142..,1) = 14.1
    // |10-20| = 10 <= 14.1 ok; |40-20| = 20 > 14.1 -> module 3 anomalous
    val df = Solar.pipeline(events(
      ("2024-01-01 00:00:01", "p1", 1L, 10.0),
      ("2024-01-01 00:00:02", "p1", 2L, 10.0),
      ("2024-01-01 00:00:03", "p1", 3L, 40.0)))
    val rows = df.select("module", "deviance").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("3"))
    assert(rows.head.getDouble(1) === 14.1)
  }

  test("single-module window: deviance 0, diff 0 -> no anomaly (0/0=NaN in reference)") {
    // one module, sum = 10.0, avg = round(10.0,1) = 10.0 exactly -> diff 0
    val df = Solar.pipeline(events(("2024-01-01 00:00:05", "p1", 1L, 10.0)))
    assert(df.count() === 0)
  }

  test("single-module window: rounding jitter -> deviance 0, diff > 0 -> anomaly (x/0=Inf)") {
    // sum = 10.06 -> avg = round(10.06,1) = 10.1; diff = 0.04 > 0
    // squares = 0.0016, variance = 0.0016, deviance = round(0.04,1) = 0.0
    // reference: 0.04/0.0 = Infinity > 1 -> anomaly; our division-free
    // predicate: 0.04 > 0.0 -> anomaly. Same verdict.
    val df = Solar.pipeline(events(("2024-01-01 00:00:05", "p1", 1L, 10.06)))
    assert(df.count() === 1)
  }

  test("window boundaries are [start, end): boundary record starts the next window") {
    val m = Solar.moduleAgg(events(
      ("2024-01-01 00:00:29.999", "p1", 1L, 1.0),
      ("2024-01-01 00:00:30.000", "p1", 1L, 2.0)))
    val starts = m.select("w_start").as[Long].collect().sorted
    assert(starts.length === 2)
    assert(starts(1) - starts(0) === 30L)
  }

  test("HALF_UP rounding at scale 1 (x.x5 rounds away from zero)") {
    // avg = (10.05 + 10.05)/2 = 10.05 -> HALF_UP -> 10.1 when the double
    // for 10.05 is above the true decimal; pin with an exact-binary value:
    // 10.125 -> BigDecimal HALF_UP at scale 1 = 10.1? No: 10.125 -> 10.1
    // (second decimal 2 < 5). Use 2.25: exactly representable, HALF_UP -> 2.3
    val m = Solar.moduleAgg(events(("2024-01-01 00:00:01", "p1", 1L, 2.25)))
    assert(m.select("m_avg_power").as[Double].head() === 2.3)
  }

  test("panels are independent within a window") {
    val df = Solar.pipeline(events(
      ("2024-01-01 00:00:01", "p1", 1L, 10.0),
      ("2024-01-01 00:00:02", "p1", 2L, 10.0),
      ("2024-01-01 00:00:03", "p1", 3L, 40.0),
      ("2024-01-01 00:00:04", "p2", 1L, 5.0),
      ("2024-01-01 00:00:05", "p2", 2L, 5.0)))
    assert(df.select("panel", "module").as[(String, String)].collect().toSet
      === Set(("p1", "3")))
  }
}
