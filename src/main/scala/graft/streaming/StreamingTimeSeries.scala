package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.ewmaAnomaly]]: the
  * EWMA recurrence is the textbook case for keyed custom state — O(1)
  * state per key (the running e/d/n longs), one output row per input
  * row, no watermark needed because nothing is ever evicted or windowed.
  * Within a micro-batch the group's rows sort by (ts, event_id) — a
  * batch-sized, per-key buffer — and fold from the carried state, so a
  * feed that is per-key time-ordered ACROSS micro-batches (the tailing-
  * a-log contract the OHLC and incremental twins document) reproduces
  * the batch operator bit for bit at every prefix.
  */
object StreamingTimeSeries {

  case class EwmaIn(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, xv: Long)
  case class EwmaState(e: Long, d: Long, n: Long)
  case class EwmaOut(event_id: Long, user_id: Long,
      ewma_micro: Long, dev_micro: Long, is_anomaly: Boolean)

  /** events: a streaming DataFrame with (user_id, ts, event_id, value).
    * Parameters mirror the batch defaults (α = 2/10, k = 3, warmup 5,
    * scale 10⁶, value in rounded cents).
    */
  def ewmaAnomalyStream(events: DataFrame,
      alphaNum: Long = 2L, alphaDen: Long = 10L, k: Long = 3L,
      warmup: Int = 5, scale: Long = 1000000L): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        round(col("value") * 100).cast("long").as("xv"))
      .as[EwmaIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[EwmaIn], state: GroupState[EwmaState]) =>
          val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.event_id))
          var st = state.getOption.getOrElse(EwmaState(0L, 0L, 0L))
          val out = sorted.map { r =>
            if (st.n == 0L) {
              st = EwmaState(r.xv * scale, 0L, 1L)
              EwmaOut(r.event_id, key, st.e, st.d, is_anomaly = false)
            } else {
              val dev = math.abs(r.xv * scale - st.e)
              val flag = st.n + 1 > warmup && dev > k * st.d
              st = EwmaState(
                (alphaNum * r.xv * scale + (alphaDen - alphaNum) * st.e) / alphaDen,
                (alphaNum * dev + (alphaDen - alphaNum) * st.d) / alphaDen,
                st.n + 1)
              EwmaOut(r.event_id, key, st.e, st.d, flag)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
