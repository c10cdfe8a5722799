package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state build of the per-module windowed aggregate using
  * `flatMapGroupsWithState` — the escape hatch for stateful logic that
  * windowed aggregation can't express (per-key custom buffers, bespoke
  * eviction, multi-window state machines).
  *
  * For the reference topology the built-in windowed aggregation
  * ([[SolarStreaming.moduleAggStream]]) is the right tool — this exists to
  * cover the arbitrary-stateful-processing API surface and as the template
  * for operators that genuinely need it. Semantics match the windowed
  * aggregate: per (panel, module) the state holds open 30 s windows,
  * flushed when the event-time watermark passes the window end — either
  * inline (group saw new data) or via EventTimeTimeout (group went
  * quiet). This re-implements suppress-until-window-final by hand
  * (`SolarConsumer.java:114`), which is exactly the boilerplate the
  * built-in watermark + append mode makes unnecessary. (Processing-time
  * timeouts were rejected: they force a micro-batch per trigger forever,
  * each one re-planning the query — watermark timeouts only fire when
  * data moves the clock.)
  *
  * State size is bounded: one (cnt, sum) pair per open window per key,
  * evicted on flush.
  */
object SolarStateful {

  case class Reading(ts: Timestamp, panel: String, module: String, power: Double)
  case class ModuleKey(panel: String, module: String)
  /** One open window buffer. */
  case class WindowBuf(w: Long, cnt: Long, sum: Double)
  /** Open windows, one buffer per window start. Kept flat (a list of flat
    * case classes, not Map[Long, (Long, Double)]): nested map/tuple
    * encoders expand into expression trees large enough that per-batch
    * incremental planning dominated the stream (profiled: the stream
    * execution thread spent seconds per micro-batch in TreeNode.transform
    * over the state serializer).
    */
  case class ModuleState(open: List[WindowBuf])
  case class ModuleWindowAgg(w_start: Long, panel: String, module: String,
                             m_cnt: Long, m_sum_power: Double, m_avg_power: Double)

  val WindowSeconds = 30L

  private def round1(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(1, java.math.RoundingMode.HALF_UP).doubleValue()

  private def toAgg(key: ModuleKey)(b: WindowBuf): ModuleWindowAgg =
    ModuleWindowAgg(b.w, key.panel, key.module, b.cnt, b.sum, round1(b.sum / b.cnt))

  /** One group invocation: fold new readings into per-window buffers, then
    * emit every window the watermark has finalized; when the group went
    * quiet, the event-time timeout delivers the flush instead.
    */
  def updateGroup(key: ModuleKey, rows: Iterator[Reading],
                  state: GroupState[ModuleState]): Iterator[ModuleWindowAgg] = {
    val wmMs = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(ModuleState(Nil)).open
      .map(b => b.w -> b).toMap
    val next = rows.foldLeft(prev) { (acc, r) =>
      val w = Math.floorDiv(r.ts.getTime, 1000L * WindowSeconds) * WindowSeconds
      val b = acc.getOrElse(w, WindowBuf(w, 0L, 0.0))
      acc.updated(w, WindowBuf(w, b.cnt + 1, b.sum + r.power))
    }
    val (closed, open) = next.values.toList
      .partition(b => (b.w + WindowSeconds) * 1000L <= wmMs)
    if (open.isEmpty) state.remove()
    else {
      state.update(ModuleState(open))
      // wake this group when the watermark passes its earliest open window
      state.setTimeoutTimestamp(open.map(b => (b.w + WindowSeconds) * 1000L).min)
    }
    closed.sortBy(_.w).map(toAgg(key)).iterator
  }

  /** Streaming query fragment: normalized readings → suppressed-style
    * per-module window aggregates via custom state.
    */
  def moduleAggCustomState(spark: SparkSession,
                           normalized: Dataset[Reading]): Dataset[ModuleWindowAgg] = {
    import spark.implicits._
    normalized
      .withWatermark("ts", s"$WindowSeconds seconds")
      .groupByKey(r => ModuleKey(r.panel, r.module))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateGroup)
  }
}
