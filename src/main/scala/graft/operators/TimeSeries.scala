package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential per-key time-series recurrences — the one operator family
  * where the value at row t genuinely depends on the value at row t−1,
  * so neither an aggregate nor a window function can express it and the
  * per-partition imperative escape hatch is the RIGHT Spark shape
  * (reference: n/a — the reference's anomaly detection is windowed
  * z-scores, `SolarConsumer.java`; this adds the classic smoothed
  * alternative a telemetry pipeline runs next to it).
  *
  * Why INTEGER EWMA: the recurrence eₜ = α·xₜ + (1−α)·eₜ₋₁ compounds —
  * a floating-point implementation's low bits depend on nothing but
  * history length, yet an oracle replaying it in another engine must
  * agree on EVERY row, anomaly flags amplify ulp differences through
  * the k·d threshold, and cross-run determinism is what makes the flag
  * auditable. With x scaled to integer micro-units and every step a
  * long multiply/`div` (α = alphaNum/alphaDen kept rational), both
  * engines compute the identical number at any history length — the
  * PageRank/BPE fixed-point discipline applied to time series.
  *
  * Scale shape: ONE hash shuffle on the key, a per-partition sort, and
  * a single sequential pass with O(1) state per key — no per-key
  * collect_list (a year-long series never materializes as one array),
  * no window. The sequential dependency is per KEY, so parallelism is
  * across keys; one pathologically long series serializes only its own
  * partition-local run — irreducible for an order-dependent recurrence.
  */
object TimeSeries {

  /** EWMA smoothing + mean-absolute-deviation anomaly bands over per-key
    * series. Rows are ordered per key by (`ts`, `id`) (`id` a unique
    * long tiebreaker). `xv` must already be an integer-scaled long
    * (e.g. cents); |xv|·scale must fit a long.
    *
    * Recurrence (all longs, `div` truncation):
    *   e₁ = x₁·scale,  d₁ = 0,  flag₁ = false
    *   devₜ = |xₜ·scale − eₜ₋₁|
    *   flagₜ = t > warmup ∧ devₜ > k·dₜ₋₁
    *   eₜ = (alphaNum·xₜ·scale + (alphaDen−alphaNum)·eₜ₋₁) div alphaDen
    *   dₜ = (alphaNum·devₜ + (alphaDen−alphaNum)·dₜ₋₁) div alphaDen
    *
    * The deviation is measured against the PRE-update mean (a point
    * can't vouch for itself) and the band against the pre-update
    * deviation state; d grows only through observed deviations, so a
    * constant series keeps d = 0 and any later change flags — wanted
    * for telemetry. Returns (id, key, ewma_micro, dev_micro,
    * is_anomaly), one row per input row.
    */
  def ewmaAnomaly(rows: DataFrame, key: String, ts: String, id: String,
      xv: org.apache.spark.sql.Column,
      alphaNum: Long = 2L, alphaDen: Long = 10L,
      k: Long = 3L, warmup: Int = 5, scale: Long = 1000000L): DataFrame = {
    require(alphaDen > 0 && alphaNum >= 0 && alphaNum <= alphaDen && k >= 0)
    val spark = rows.sparkSession
    import spark.implicits._
    val prepared = rows
      .select(col(key).cast("long").as("_k"), col(ts).as("_t"),
        col(id).cast("long").as("_i"), xv.cast("long").as("_x"))
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_i"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
    prepared.mapPartitions { it =>
      var cur = 0L
      var have = false
      var e = 0L; var d = 0L; var n = 0L
      it.map { case (kk, _, i, x) =>
        if (!have || kk != cur) {
          cur = kk; have = true
          e = x * scale; d = 0L; n = 1L
          (i, kk, e, d, false)
        } else {
          n += 1
          val dev = math.abs(x * scale - e)
          val flag = n > warmup && dev > k * d
          e = (alphaNum * x * scale + (alphaDen - alphaNum) * e) / alphaDen
          d = (alphaNum * dev + (alphaDen - alphaNum) * d) / alphaDen
          (i, kk, e, d, flag)
        }
      }
    }.toDF("id", "key", "ewma_micro", "dev_micro", "is_anomaly")
  }

  /** The gated composition: per-user EWMA anomaly screen over the events
    * table, value in cents (round(value·100) — exact for 2-decimal
    * doubles, and both engines round the same double identically).
    */
  def eventEwmaAnomaly(events: DataFrame): DataFrame =
    ewmaAnomaly(events, "user_id", "ts", "event_id",
      round(col("value") * 100).cast("long"))
      .select(col("id").as("event_id"), col("key").as("user_id"),
        col("ewma_micro"), col("dev_micro"), col("is_anomaly"))
}
