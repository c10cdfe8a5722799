package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.streaming.SolarStateful.{ModuleKey, ModuleWindowAgg, Reading,
  WindowBuf, WindowSeconds}

/** The per-module windowed aggregate on `transformWithState` — Spark 4's
  * current arbitrary-state API (SPARK-46815), kept semantically identical
  * to the legacy [[SolarStateful]] `flatMapGroupsWithState` build and to
  * the built-in windowed aggregation ([[SolarStreaming.moduleAggStream]]),
  * which remains the right tool for this topology. This twin exists
  * because new stateful operators should be written against TWS, not the
  * legacy API: typed state handles (here a [[ListState]] of open-window
  * buffers — stored per ELEMENT in RocksDB, so an update rewrites one
  * buffer, not the whole blob the legacy GroupState serializes), explicit
  * per-key timers instead of one implicit timeout, and state-variable
  * eviction via TTL when semantics allow it.
  *
  * Flush discipline matches [[SolarStateful.updateGroup]]: windows close
  * when the event-time watermark passes their end, either inline (the key
  * saw new rows this batch) or via the timer registered for the earliest
  * open window end. State is bounded: one (cnt, sum) buffer per open
  * window per key, evicted on flush.
  */
class ModuleAggProcessor
    extends StatefulProcessor[ModuleKey, Reading, ModuleWindowAgg] {

  @transient private var open: ListState[WindowBuf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[WindowBuf]("open",
      Encoders.product[WindowBuf], TTLConfig.NONE)

  private def round1(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(1, java.math.RoundingMode.HALF_UP).doubleValue()

  private def toAgg(key: ModuleKey)(b: WindowBuf): ModuleWindowAgg =
    ModuleWindowAgg(b.w, key.panel, key.module, b.cnt, b.sum,
      round1(b.sum / b.cnt))

  /** Emit the windows the watermark finalized, persist the rest, and arm
    * the timer for the earliest still-open window end.
    */
  private def flush(key: ModuleKey, windows: Iterable[WindowBuf],
                    watermarkMs: Long): Iterator[ModuleWindowAgg] = {
    val (closed, stillOpen) = windows.toList
      .partition(b => (b.w + WindowSeconds) * 1000L <= watermarkMs)
    if (stillOpen.isEmpty) open.clear()
    else {
      open.put(stillOpen.toArray)
      getHandle.registerTimer(
        stillOpen.map(b => (b.w + WindowSeconds) * 1000L).min)
    }
    closed.sortBy(_.w).map(toAgg(key)).iterator
  }

  override def handleInputRows(key: ModuleKey, rows: Iterator[Reading],
                               timerValues: TimerValues): Iterator[ModuleWindowAgg] = {
    val prev = open.get().map(b => b.w -> b).toMap
    val next = rows.foldLeft(prev) { (acc, r) =>
      val w = Math.floorDiv(r.ts.getTime, 1000L * WindowSeconds) * WindowSeconds
      val b = acc.getOrElse(w, WindowBuf(w, 0L, 0.0))
      acc.updated(w, WindowBuf(w, b.cnt + 1, b.sum + r.power))
    }
    flush(key, next.values, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: ModuleKey, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[ModuleWindowAgg] =
    flush(key, open.get().toList, timerValues.getCurrentWatermarkInMs())
}

object SolarTws {

  /** Streaming query fragment: normalized readings → suppressed-style
    * per-module window aggregates via the TWS processor. RocksDB state
    * store required (set in [[graft.Engine.builder]]).
    */
  def moduleAggTws(spark: SparkSession,
                   normalized: Dataset[Reading]): Dataset[ModuleWindowAgg] = {
    import spark.implicits._
    normalized
      .withWatermark("ts", s"$WindowSeconds seconds")
      .groupByKey(r => ModuleKey(r.panel, r.module))
      .transformWithState(new ModuleAggProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
