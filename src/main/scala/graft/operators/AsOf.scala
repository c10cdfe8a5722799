package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator class Spark has no built-in
  * for and the reference never needed (its joins are windowed equi-joins,
  * `SolarConsumer.java:142-147`), but any telemetry/trading/training-data
  * pipeline does: for each left row, attach the MOST RECENT right row of
  * the same key with right.time <= left.time.
  *
  * Scale shape: the naive formulation is a non-equi range join (nested
  * loop, O(n·m) per key). This implementation is the classic union +
  * ordered-window rewrite instead: tag sides, union, and take
  * `last(payload, ignoreNulls)` over (key ORDER BY time, side, tiebreak
  * ROWS UNBOUNDED PRECEDING). One hash shuffle on the key, one sort, one
  * linear scan — the same plan a dedicated as-of SparkStrategy would
  * produce, with no custom physical operator to maintain. At 100 TB both
  * sides shuffle once by key; no state is quadratic.
  *
  * Tie semantics: a right row at exactly left.time IS visible (side 0
  * sorts before side 1 at equal time), matching ASOF `<=`; equal-time
  * right rows are ordered by `rightOrder`, so the largest wins —
  * deterministic for the hash gate.
  */
object AsOf {

  /** Generic as-of join. `left` and `right` must both carry `keys` and
    * `time`; `right` additionally carries `rightOrder` (deterministic
    * tie-break among equal-time right rows) and the `payload` columns to
    * attach. Returns every left row with the payload of its most recent
    * right match (nulls when no right row precedes it).
    *
    * The payload travels as ONE struct through `last(_, ignoreNulls)` —
    * per-column `last` would let a right row carrying a NULL in one field
    * emit a row mixing fields from two different right rows. Row-level
    * atomicity: all payload fields always come from the same right row,
    * even when individual fields are NULL.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               time: String, rightOrder: String, payload: Seq[String]): DataFrame = {
    val ordType = right.schema(rightOrder).dataType
    val leftType = StructType(left.schema.fields)
    val payloadType = StructType(payload.map(p => right.schema(p)))
    val lU = left.select(
      keys.map(col) ++ Seq(col(time).as("_t"), lit(1).as("_side"),
        lit(null).cast(ordType).as("_ord"),
        struct(left.columns.map(col).toSeq: _*).as("_l"),
        lit(null).cast(payloadType).as("_p")): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(col(time).as("_t"), lit(0).as("_side"),
        col(rightOrder).as("_ord"),
        lit(null).cast(leftType).as("_l"),
        struct(payload.map(col): _*).as("_p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .select(col("_side"), col("_l"),
        last(col("_p"), ignoreNulls = true).over(w).as("_p"))
      .filter(col("_side") === 1)
      .select(Seq(col("_l.*")) ++ payload.map(p => col(s"_p.$p").as(p)): _*)
  }

  /** Concrete instance over the events table: even event_ids are "trades",
    * odd ones are "quotes"; each trade gets its user's most recent quote
    * (the classic trades⋈quotes as-of). Values are rounded per the
    * project's double-output rule; unmatched trades (no prior quote) are
    * kept by the operator but filtered in the gated query for hash
    * stability.
    */
  def tradesWithLatestQuote(events: DataFrame): DataFrame = {
    val base = events.select(col("event_id"), unix_micros(col("ts")).as("t"),
      col("user_id"), col("value"))
    val trades = base.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("t"),
        round(col("value"), 4).as("value"))
    val quotes = base.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("t"), col("event_id").as("q_id"),
        round(col("value"), 4).as("q_value"))
    asOfJoin(trades, quotes, Seq("user_id"), "t", "q_id", Seq("q_id", "q_value"))
  }
}
