package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream: funnel conversion and
  * cohort retention — the two reports every product/behavioral pipeline
  * runs next to the windowed aggregates the reference topology covers
  * (SURVEY.md §2.13: Kafka Streams leaves sequence analytics to the
  * application; provided here as engine operators).
  *
  * Scale design (100 TB posture):
  *  - [[funnel]] pays ONE shuffle: the chained per-stage window minima all
  *    share the `user_id` partitioning, the per-user collapse reuses it,
  *    and only the per-partition partials of the final summary aggregate
  *    cross the wire (one row per partition). No sort — every window is an
  *    unordered full-partition MIN frame.
  *  - [[retentionCohorts]] shuffles on compact (user, day) / (user) keys
  *    with map-side combine; the cohort-size join is a broadcast of a
  *    ≤ #days-row relation by construction.
  */
object EventAnalytics {

  /** The gated funnel's stage sequence, mirrored in the q115 oracle. */
  val DefaultFunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Staged conversion funnel: for each user, the earliest event of
    * stage 0, then the earliest stage-1 event STRICTLY AFTER that, then the
    * earliest stage-2 event after THAT, and so on — the classic
    * first-touch funnel semantics (a click before the first view does not
    * count as a conversion).
    *
    * Output is one row per stage: `(stage_idx, stage, n_users,
    * conv_from_prev, avg_hours_from_prev)` — users reaching the stage,
    * conversion from the previous stage, and the mean hours between the
    * two stage timestamps (NULL for stage 0, and NULL when no user
    * converts). Rates and hours round to 4 decimals (the engine-wide FP
    * discipline); counts and the rank key are exact integers.
    *
    * Plan shape: an AGGREGATE CASCADE, not a window (the q102 survivor
    * lesson — an unordered window over `user_id` buffers each user's
    * entire event list in one WindowExec task, and a single bot user
    * with 10⁸ events would funnel them all through one buffer at
    * 100 TB). Stage 0 is a map-side-combining `min` per user of that
    * stage's events; stage i joins stage i−1's user-cardinality minima
    * (reusing the aggregation's own hash partitioning), filters
    * strictly-after, and folds with another combining `min` — per-task
    * state is one hash entry per user, nothing is ever buffered. The
    * stage relations shrink monotonically (stage-i users ⊆ stage-i−1
    * users), each event type is shuffled at most once (types not in the
    * funnel are filtered at the scan), and the summary collapses to one
    * row via partial aggregation. PlanShapeSpec pins the window-free
    * plan.
    */
  def funnel(events: DataFrame,
             stages: Seq[String] = DefaultFunnelStages): DataFrame =
    funnelCore(events, stages, None)

  /** [[funnel]] with a CONVERSION WINDOW: stage i counts only within
    * `maxGapHours` of the user's stage-(i−1) timestamp — the product
    * question every funnel tool actually asks ("signed up within 24 h
    * of the click"), and the difference between measuring a flow and
    * measuring coincidence over a long history. Anchoring stays
    * first-touch (the earliest qualifying event at every stage, like
    * [[funnel]]) — the deterministic industry semantics; a user who
    * misses the window at stage i is NOT re-anchored at a later
    * stage-(i−1) event. Same window-free cascade plan.
    */
  def funnelWithin(events: DataFrame, maxGapHours: Double,
                   stages: Seq[String] = DefaultFunnelStages): DataFrame = {
    require(maxGapHours > 0, s"need maxGapHours > 0, got $maxGapHours")
    funnelCore(events, stages, Some((maxGapHours * 3.6e9).toLong))
  }

  private def funnelCore(events: DataFrame, stages: Seq[String],
                         maxGapMicros: Option[Long]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t"))
    // m(i): (user_id, t_i) — the earliest qualifying stage-i timestamp
    val stageMins = stages.zipWithIndex.scanLeft(null: DataFrame) {
      case (_, (st, 0)) =>
        base.filter(col("event_type") === st)
          .groupBy(col("user_id")).agg(min(col("t")).as("t_0"))
      case (prev, (st, i)) =>
        val within = maxGapMicros.fold(lit(true))(g =>
          col("t") <= col(s"t_${i - 1}") + g)
        base.filter(col("event_type") === st)
          .join(prev.select(col("user_id"), col(s"t_${i - 1}")), "user_id")
          .filter(col("t") > col(s"t_${i - 1}") && within)
          .groupBy(col("user_id")).agg(min(col("t")).as(s"t_$i"))
    }.drop(1)
    // stage-i users are a subset of stage-i−1 users, so left joins at
    // user cardinality rebuild the wide per-user row; every relation here
    // is already hash-partitioned by user_id by its own aggregate
    val perUser = stageMins.reduce((a, b) => a.join(b, Seq("user_id"), "left"))
    val sumCols = stages.indices.map(i => count(col(s"t_$i")).as(s"n_$i")) ++
      stages.indices.drop(1).map(i =>
        graft.functions.AggFunctions
          .mean4((col(s"t_$i") - col(s"t_${i - 1}")) / lit(3.6e9))
          .as(s"h_$i"))
    val summary = perUser.agg(sumCols.head, sumCols.tail: _*)
    // one-row wide summary → long format via ONE explode (re-selecting the
    // summary per stage would re-run the whole aggregate per stage)
    val stageStructs = array(stages.zipWithIndex.map { case (st, i) =>
      struct(
        lit(i).as("stage_idx"),
        lit(st).as("stage"),
        col(s"n_$i").as("n_users"),
        (if (i == 0) lit(null).cast("double")
         else graft.functions.AggFunctions.ratioQ(
           col(s"n_$i"), col(s"n_${i - 1}"), 4))
          .as("conv_from_prev"),
        (if (i == 0) lit(null).cast("double") else col(s"h_$i"))
          .as("avg_hours_from_prev"))
    }: _*)
    summary.select(explode(stageStructs).as("s")).select(col("s.*"))
  }

  /** Day-granularity cohort retention: users are cohorted by their first
    * active day; for each (cohort day, day offset) the report counts the
    * cohort's users active that day and the retention rate against the
    * cohort's size. Offset 0 is the cohort itself (retention 1.0 by
    * construction — every user is active on their first day).
    *
    * Scale shape: `(user, day)` distinct and the first-day aggregate are
    * map-side-combining shuffles on 12-byte keys; the events⋈first-day
    * join keys on `user_id` (the aggregate's own partitioning); the
    * cohort-size join broadcasts a ≤ #days-row relation. Nothing larger
    * than (active user-days) ever crosses the wire, and no window
    * function touches a corpus-sized relation.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstDay = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    // (user, day) is distinct and each user has exactly one cohort_day, so
    // count(*) per (cohort_day, offset) IS the distinct active-user count
    val activity = active.join(firstDay, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    activity.join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("n_cohort"),
        graft.functions.AggFunctions.ratioQ(
          col("n_active"), col("n_cohort"), 4).as("retention"))
  }

  /** First-order Markov transition matrix over per-user event sequences
    * — the path-analysis companion to [[funnel]] (which checks ONE
    * prescribed order; this reports where users actually go next):
    * per (event_type → next event_type), the transition count and the
    * row-normalized probability. Sequencing uses the TimeSeries
    * discipline, not a window: one hash shuffle on the user, a
    * per-partition sort, and a single sequential pass emitting
    * consecutive-pair rows — a power user's year of events never
    * buffers in a WindowExec, and per-key state is one element. Pair
    * order within a user is (ts, event_id) — the EWMA tiebreak, so the
    * matrix is deterministic under any execution order.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .select(col("user_id").cast("long").as("_k"), col("ts").as("_t"),
        col("event_id").cast("long").as("_i"),
        col("event_type").as("_e"))
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_i"))
      .as[(Long, java.sql.Timestamp, Long, String)]
    val pairs = prepared.mapPartitions { it =>
      var cur = 0L
      var have = false
      var prev: String = null
      it.flatMap { case (k, _, _, e) =>
        val out =
          if (have && k == cur) Iterator.single((prev, e))
          else Iterator.empty
        cur = k; have = true; prev = e
        out
      }
    }.toDF("from_type", "to_type")
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        graft.functions.AggFunctions.ratioQ(
          col("n"), col("n_from"), 4).as("p"))
  }

  /** Top-k most frequent 3-step paths — the sequence-mining extension of
    * [[transitionMatrix]]'s pair counts: per (a → b → c) trigram of
    * consecutive events within a user, exact counts, top-k by
    * (count DESC, path ASC) so the selection is deterministic under
    * ties. Same fold discipline with O(2) state per key (the previous
    * two event types); the ranking runs over the type³-bounded count
    * relation via a TakeOrdered heap, never a corpus-sized sort.
    */
  def topPaths(events: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .select(col("user_id").cast("long").as("_k"), col("ts").as("_t"),
        col("event_id").cast("long").as("_i"),
        col("event_type").as("_e"))
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_i"))
      .as[(Long, java.sql.Timestamp, Long, String)]
    val triples = prepared.mapPartitions { it =>
      var cur = 0L
      var have = false
      var p1: String = null // previous
      var p2: String = null // before previous
      it.flatMap { case (kk, _, _, e) =>
        if (!have || kk != cur) { cur = kk; have = true; p1 = null; p2 = null }
        val out =
          if (p2 != null) Iterator.single((p2, p1, e))
          else Iterator.empty
        p2 = p1; p1 = e
        out
      }
    }.toDF("a", "b", "c")
    triples.groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a").asc, col("b").asc, col("c").asc)
      .limit(k)
  }

  /** Transition timing — [[transitionMatrix]]'s companion question
    * "how LONG do users take between steps": per (from → to) pair of
    * consecutive events, exact counts and the mean gap in seconds
    * (exact integer micro-second sums, one double division, rounded 4).
    * Same one-shuffle fold, O(1) state.
    */
  def transitionTiming(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .select(col("user_id").cast("long").as("_k"),
        unix_micros(col("ts")).as("_t"),
        col("event_id").cast("long").as("_i"),
        col("event_type").as("_e"))
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_i"))
      .as[(Long, Long, Long, String)]
    val pairs = prepared.mapPartitions { it =>
      var cur = 0L
      var have = false
      var prevT = 0L
      var prevE: String = null
      it.flatMap { case (kk, t, _, e) =>
        val out =
          if (have && kk == cur) Iterator.single((prevE, e, t - prevT))
          else Iterator.empty
        cur = kk; have = true; prevE = e; prevT = t
        out
      }
    }.toDF("from_type", "to_type", "gap_us")
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("gap_us")).as("sum_us"))
      .select(col("from_type"), col("to_type"), col("n"),
        // sum_us/(n·1e6) as one exact integer ratio (ratioQ)
        graft.functions.AggFunctions.ratioQ(
          col("sum_us"), col("n") * lit(1000000L), 4)
          .as("mean_gap_sec"))
  }

  /** Conversion attribution — per touch type, how many conversions it
    * gets credited under the FIRST-touch and LAST-touch models (the
    * two bookends every marketing/growth stack reports): each
    * `conversionType` event closes a path segment made of the touches
    * since the user's previous conversion (or stream start); the
    * segment's earliest touch takes first-touch credit, its latest
    * last-touch credit, and a conversion with no preceding touch
    * credits `(direct)` under both. `ignoreTypes` events (telemetry
    * noise like errors) neither earn credit nor break a path.
    *
    * Plan: the [[transitionMatrix]] fold discipline, not a window —
    * one hash shuffle on the user, per-partition (user, ts, event_id)
    * sort, a single sequential pass carrying O(1) state (the open
    * segment's first/last touch), then a touch-type-sized aggregate.
    * A user's thousand-touch path never buffers; determinism comes
    * from the (ts, event_id) total order.
    */
  def attribution(events: DataFrame, conversionType: String = "purchase",
                  ignoreTypes: Set[String] = Set("error")): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .select(col("user_id").cast("long").as("_k"), col("ts").as("_t"),
        col("event_id").cast("long").as("_i"),
        col("event_type").as("_e"))
      .filter(!col("_e").isInCollection(ignoreTypes))
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_i"))
      .as[(Long, java.sql.Timestamp, Long, String)]
    val credits = prepared.mapPartitions { it =>
      var cur = 0L
      var have = false
      var first: String = null
      var last: String = null
      it.flatMap { case (k, _, _, e) =>
        if (!have || k != cur) { cur = k; have = true; first = null; last = null }
        if (e == conversionType) {
          val out = Iterator.single(
            (if (first == null) "(direct)" else first,
             if (last == null) "(direct)" else last))
          first = null; last = null
          out
        } else {
          if (first == null) first = e
          last = e
          Iterator.empty
        }
      }
    }.toDF("ft", "lt")
    credits.select(explode(array(
        struct(col("ft").as("touch_type"), lit("f").as("which")),
        struct(col("lt").as("touch_type"), lit("l").as("which")))).as("c"))
      .groupBy(col("c.touch_type").as("touch_type"))
      .agg(sum(when(col("c.which") === "f", 1L).otherwise(0L))
          .as("first_credits"),
        sum(when(col("c.which") === "l", 1L).otherwise(0L))
          .as("last_credits"))
  }
}
