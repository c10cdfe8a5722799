package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window shapes beyond the reference's tumbling windows (SURVEY.md §2.13:
  * Kafka Streams offers sliding/hopping and session windows; the reference
  * uses none — provided here for engine completeness).
  *
  * Both are single-shuffle streaming-capable aggregations: `window(ts, w,
  * slide)` expands each event to its w/slide windows before the shuffle
  * (map-side, no extra pass), and `session_window` merges per-key sessions
  * inside the aggregation state.
  */
object Windows {

  /** Hopping/sliding-window aggregate: overlapping windows of `windowDur`
    * sliding by `slideDur`, per panel.
    */
  def slidingAgg(events: DataFrame,
                 windowDur: String = "60 seconds",
                 slideDur: String = "30 seconds"): DataFrame =
    Solar.normalize(events)
      .groupBy(window(col("ts"), windowDur, slideDur).as("w"), col("panel"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("power")), 4).as("sum_power"))
      .select(col("w.start").cast("long").as("w_start"), col("panel"),
        col("cnt"), col("sum_power"))

  /** Session-window aggregate: per-user sessions closed after `gap` of
    * inactivity; session end = last event + gap (Spark semantics).
    */
  def sessionAgg(events: DataFrame, gap: String = "1 hour"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("s_start"),
        unix_micros(col("w.end")).as("s_end"),
        col("user_id"), col("cnt"), col("sum_value"))

  /** OHLC time-series downsampling (the candle/compaction aggregate every
    * monitoring and market pipeline runs): per (user, tumbling bucket) the
    * first/last/min/max of `value` plus count and mean. open/close are
    * `min_by`/`max_by` over the (ts, event_id) struct — ONE aggregation
    * pass with fixed per-group state and a deterministic tie-break, no
    * window function, no sort; at 100 TB this is a plain map-side-combining
    * shuffle on (user, bucket). open/high/low/close are exact input values
    * (no rounding needed); only the mean is rounded.
    */
  def ohlcDownsample(events: DataFrame, bucket: String = "1 hour"): DataFrame =
    events
      .groupBy(col("user_id"), window(col("ts"), bucket).as("w"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        graft.functions.AggFunctions.mean4(col("value")).as("mean_value"))
      .select(col("user_id"), col("w.start").cast("long").as("w_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("mean_value"))

  /** Time-bucket gap filling with last-observation-carried-forward — the
    * `time_bucket_gapfill` + `locf` operator time-series stores make
    * first-class (a telemetry stream's dashboards need dense series;
    * sensors drop buckets): per user, mean-value buckets of `bucketSec`
    * seconds; every missing bucket between the user's first and last
    * observation is GENERATED (`sequence` + explode — no driver loop, no
    * cross join against a global calendar) and filled with the last
    * observed value; `is_gap` keeps filled rows distinguishable. The
    * bucket width is ONE integer parameter so the aggregation and the
    * grid step cannot disagree.
    *
    * Scale shape: one aggregate to buckets (map-side combining), a
    * two-scalar span aggregate per user, and the LOCF window partitioned
    * BY USER over bucket counts bounded by time-range/bucket — never a
    * global sort, never a skew-prone partition (a user's series length
    * is capped by the calendar, not by data volume).
    */
  def gapFillLocf(events: DataFrame, bucketSec: Long = 3600L,
                  chunkLen: Long = 65536L): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    val b = events
      .groupBy(col("user_id"),
        window(col("ts"), s"$bucketSec seconds").as("w"))
      .agg(graft.functions.AggFunctions.mean4(col("value")).as("v"))
      .select(col("user_id"), col("w.start").cast("long").as("b_start"),
        col("v"))
    // Dense-grid generation is CHUNKED (ADVICE r13): a single
    // sequence(mn, mx, bucketSec) array is bounded by Spark's max array
    // length, so ONE user whose span ÷ bucket exceeds it (a multi-year
    // sensor with a small bucket — expected at scale, not adversarial)
    // would throw and fail the whole job. Two-level explode instead:
    // chunk origins at `chunkLen` buckets apiece, then a bounded inner
    // sequence per chunk — every generated array is ≤ chunkLen elements
    // (512 KiB of longs at the default) regardless of span, and the outer
    // array only reaches Spark's limit at spans past the representable
    // epoch. `chunkLen` is a parameter only so specs can prove boundary
    // behavior with a tiny chunk; the default is the production value.
    val chunkSpan = bucketSec * chunkLen
    val grid = b.groupBy(col("user_id"))
      .agg(min(col("b_start")).as("mn"), max(col("b_start")).as("mx"))
      .select(col("user_id"), col("mx"),
        explode(sequence(col("mn"), col("mx"), lit(chunkSpan)))
          .as("c_start"))
      .select(col("user_id"),
        explode(sequence(col("c_start"),
          least(col("mx"), col("c_start") + lit(chunkSpan - bucketSec)),
          lit(bucketSec))).as("b_start"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("b_start"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(b, Seq("user_id", "b_start"), "left")
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", when(col("v").isNull, 1).otherwise(0))
      .select(col("user_id"), col("b_start"), col("v_filled"), col("is_gap"))
  }

  /** RANGE-frame analytic window: per-user trailing-1h moving sum/count by
    * EVENT TIME (value-based frame), vs the row-count frames of
    * `Relational.orderRunningStats`. Range frames are tie-safe by
    * construction — all rows sharing the order key are peers and enter the
    * frame together, so no tie-break column is needed for determinism.
    */
  def trailingHourStats(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(-hourUs, 0)
    events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("value"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("sum_trailing", round(sum(col("value")).over(w), 4))
      .drop("value")
  }
}
