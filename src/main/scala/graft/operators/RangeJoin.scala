package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval / time-proximity join — the other range-shaped operator class
  * (next to [[AsOf]]) with no Spark built-in: pair rows of two streams
  * whose event times fall within a tolerance of each other.
  *
  * Scale shape: the naive predicate `abs(t_b - t_a) <= tol` is non-equi →
  * BroadcastNestedLoopJoin. The standard rewrite buckets time into
  * tol-width bins and replicates the right side into its bin ± 1: any
  * qualifying pair must then share a (key, bin) cell, so candidates are an
  * equi-join and the exact predicate only verifies. 3× replication of one
  * side buys an all-equi shuffle plan — the same trick as the simhash
  * block buckets (q31), applied to continuous time instead of hamming
  * space. Each qualifying pair lands in exactly one shared bin (the right
  * row's three bins are distinct), so no dedup pass is needed.
  */
object RangeJoin {

  /** Pairs of (typeA, typeB) events of the same user within `tolSec` of
    * each other, via the bin-bucketed equi-join. dt_us = t_b − t_a (signed
    * microseconds).
    */
  def proximityPairs(events: DataFrame, typeA: String, typeB: String,
                     tolSec: Long): DataFrame = {
    val tol = tolSec * 1000000L
    val a = events.filter(col("event_type") === typeA)
      .select(col("user_id"), col("event_id").as("id_a"),
        unix_micros(col("ts")).as("t_a"))
      .withColumn("bin", expr(s"t_a div ${tol}L"))
    val b = events.filter(col("event_type") === typeB)
      .select(col("user_id"), col("event_id").as("id_b"),
        unix_micros(col("ts")).as("t_b"))
      .withColumn("bin0", expr(s"t_b div ${tol}L"))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"), col("bin0") + 1)))
      .drop("bin0")
    a.join(b, Seq("user_id", "bin"))
      .filter(abs(col("t_b") - col("t_a")) <= tol)
      .select(col("id_a"), col("id_b"), col("user_id"),
        (col("t_b") - col("t_a")).as("dt_us"))
  }

  /** LEFT OUTER interval join — every `typeA` event keeps a row even
    * with no `typeB` partner in its tolerance window (the "errors with
    * no follow-up purchase" report the inner form cannot express). The
    * scalable formulation: the bin-bucketed INNER pairs (never a
    * non-equi NLJ) plus an 8-byte-id anti-join for the unmatched left
    * side, null-padded — a left-outer written directly against the
    * exploded bins would instead null-pad per BIN, tripling unmatched
    * rows.
    */
  def proximityPairsLeftOuter(events: DataFrame, typeA: String,
                              typeB: String, tolSec: Long): DataFrame = {
    val inner = proximityPairs(events, typeA, typeB, tolSec)
    inner.unionByName(padUnmatched(events, inner, typeA, "id_a"))
  }

  /** RIGHT OUTER interval join — the mirror report ("purchases with no
    * preceding error"): every `typeB` event keeps a row even with no
    * `typeA` partner in tolerance. Same anti-join null-pad shape as the
    * left-outer, keyed on id_b.
    */
  def proximityPairsRightOuter(events: DataFrame, typeA: String,
                               typeB: String, tolSec: Long): DataFrame = {
    val inner = proximityPairs(events, typeA, typeB, tolSec)
    inner.unionByName(padUnmatched(events, inner, typeB, "id_b"))
  }

  /** FULL OUTER interval join — inner pairs plus BOTH unmatched sides
    * null-padded once each (the anti-join generalizes symmetrically: an
    * unmatched-left row and an unmatched-right row are distinct outputs,
    * so the union introduces no double-count). All three outer flavors
    * share the one bin-bucketed inner plan; the outer decoration costs
    * two 8-byte-id anti-joins, never a second non-equi pass.
    */
  def proximityPairsFullOuter(events: DataFrame, typeA: String,
                              typeB: String, tolSec: Long): DataFrame = {
    val inner = proximityPairs(events, typeA, typeB, tolSec)
    inner.unionByName(padUnmatched(events, inner, typeA, "id_a"))
      .unionByName(padUnmatched(events, inner, typeB, "id_b"))
  }

  /** One null-padded row per `eventType` event with no partner in the
    * inner pairs — the shared pad all three outer flavors decorate the
    * single bin-bucketed inner plan with (`idCol` ∈ {id_a, id_b} names
    * the side being kept; the opposite id and dt_us pad with nulls).
    */
  private def padUnmatched(events: DataFrame, inner: DataFrame,
                           eventType: String, idCol: String): DataFrame = {
    val kept = events.filter(col("event_type") === eventType)
      .select(col("event_id").as(idCol), col("user_id"))
      .join(inner.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
    val otherCol = if (idCol == "id_a") "id_b" else "id_a"
    kept
      .withColumn(otherCol, lit(null).cast("long"))
      .withColumn("dt_us", lit(null).cast("long"))
      .select(col("id_a"), col("id_b"), col("user_id"), col("dt_us"))
  }
}
