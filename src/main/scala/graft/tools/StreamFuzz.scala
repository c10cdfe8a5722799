package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ↔ streaming differential fuzzer (VERDICT r16 #3): seeded
  * windowed-aggregation/join/dedup plans run TWICE over identical data —
  * once through Structured Streaming (MemoryStream micro-batches +
  * watermark, append mode) and once as a plain batch plan — and the two
  * answers must be row-for-row identical, the way `QueryFuzz`'s 4,500-seed
  * battery pins batch-vs-DuckDB. This is the generated-plan generalization
  * of the hand-written equivalence specs (StreamingSpec,
  * StreamStreamJoinSpec): one builder function produces BOTH legs
  * (`withWatermark` is a no-op in batch), so any divergence is the
  * streaming ENGINE's incremental state semantics, never a re-spelling.
  *
  * Equivalence is only well-defined under two disciplines the generator
  * enforces by construction:
  *
  *  - **No beyond-watermark late data.** Rows feed in ts-contiguous
  *    micro-batch chunks, with seeded IN-watermark disorder (a bounded
  *    suffix of each chunk is deferred into the next one — late, but
  *    never later than the delay). Beyond-watermark drop is a documented
  *    batch/stream DIVERGENCE, pinned separately in
  *    SuppressAndLatenessSpec — fuzzing it would just fuzz the fixture.
  *  - **Order-insensitive aggregates.** Sums run over exact integer
  *    cents (`value` is 2-dp by construction), means divide an exact
  *    cents sum once — a raw double `sum` can differ by ulps between the
  *    batch partial-sum tree and the streaming state fold (the mean4
  *    lesson applied before the fuzzer could rediscover it here).
  *
  * Append mode only emits windows the watermark has passed, so every
  * seed appends three far-future FLUSH rows (key = −1, dropped by the
  * builder's own filter AFTER the watermark is applied) in three
  * separate micro-batches: watermark eviction uses the PREVIOUS batch's
  * maximum, and chained stateful operators (dedup→agg, agg→join) need
  * one extra batch per level to drain.
  *
  * Eleven plan kinds: tumbling agg, sliding agg, session windows,
  * tumbling agg + post-aggregation filter, the two-aggregate
  * stream-stream join (the SolarStreaming.streamStreamJoin shape),
  * exact-duplicate drop → windowed agg, the RAW stream-stream
  * time-range join (the join state machine itself — even keys left,
  * odd keys right, ±tol interval condition), the stream-static
  * broadcast dimension join re-aggregated per (window, tier), and two
  * non-append kinds (VERDICT r17 #5): UPDATE-mode tumbling aggregation
  * (per-key update history reduced to finals by the strictly-monotone
  * `a_cnt`, compared against BOTH the batch fold and the append-mode
  * suppress twin on the same feed) and KILL-AND-RESUME (a file-source
  * feed checkpointed across a mid-feed stop/start, itself running in
  * append OR update mode by a seeded coin — append: the accumulated
  * emissions must equal the batch fold exactly once, no replays, no
  * losses; update: the per-key finals must show a_cnt CONTINUING
  * through the checkpoint, i.e. exact state restoration under update
  * semantics). Kind 10 seeds the `transformWithState` operator itself:
  * the mapped feed runs through the REAL `SolarTws.moduleAggTws`
  * processor (ListState buffers + event-time timers) against the exact
  * batch fold — see [[runTws]] for the kind's disciplines.
  *
  * Round-22 kinds (VERDICT r18 #3/#7) widen that to SEVENTEEN: kind 11
  * fuzzes DECIMAL measures through the streaming state store (exact
  * decimal(12,2) sum/min/max + the decimal-division avg, append or
  * update by a seeded coin — the batch grammar's decimal plane, kinds
  * 15-17, finally has a streaming twin); kind 12 feeds
  * `moduleAggTws` UNSORTED (disorder bounded at 14 s under the
  * processor's fixed 30 s watermark — the late-arrival merge into a
  * still-open window and the timer re-arm path, which the sorted kind
  * 10 never exercises); kind 13 runs the same processor ACROSS a
  * kill-and-resume checkpoint boundary (kinds 9+10 composed — ListState
  * and armed timers must restore exactly); kind 14 drives the MapState
  * `CatCrossProcessor` (per-(key, cat) first-crossing set,
  * chunking-invariant by construction) against the batch
  * `count >= threshold` fold — TTL-free: TTL forces processing-time
  * mode, whose continuous clock-advancing micro-batches never report
  * idle and hang `processAllAvailable` (found live by this kind's first
  * battery); the TTL/re-arm path is pinned by TwsTtlSpec's
  * deadline-polling harness instead. Kind 15 runs the same MapState
  * differential ACROSS a kill-and-resume checkpoint boundary — tallies
  * and fired flags must restore exactly, the MapState twin of kind
  * 13's ListState/timer restore. Kind 16 is the decimal plane of the
  * kind-6 RAW stream-stream time-range join: the buffered rows carry
  * decimal(12,2) measures, so the JOIN state store serializes and
  * restores decimals (kind 11 covers only aggregation state), plus an
  * exact decimal sum across the two sides. Run standalone: `sbt "runMain
  * graft.tools.StreamFuzz <fromSeed> <toSeed>"` (STREAM_FUZZ_VERBOSE=1
  * prints every seed's kind/rows); StreamFuzzSpec runs the recorded
  * battery in-suite.
  */
object StreamFuzz {

  type Ev = (Timestamp, Long, String, Double)

  /** One generated differential case: micro-batch chunks (main data),
    * flush batches, and the single builder both legs share. `mode`
    * selects the streaming harness: "append" (memory sink, emit-once),
    * "update" (memory sink in update mode, finals extracted by the
    * strictly-monotone a_cnt and ALSO compared to the append twin), or
    * "restart" (file source + checkpoint, killed and resumed mid-feed).
    */
  final case class SFQuery(name: String, chunks: Seq[Seq[Ev]],
                           flush: Seq[Ev], build: DataFrame => DataFrame,
                           mode: String = "append", param: Long = 0L) {
    def allRows: Seq[Ev] = chunks.flatten ++ flush
  }

  private val Base = 1704067200L // 2024-01-01 00:00:00 UTC, epoch seconds

  /** Pure function of the seed (battery reproducibility — same contract
    * as `QueryFuzz.generate`).
    */
  def generate(seed: Long): SFQuery = {
    // double-seeded like QueryFuzz.generate: java.util.Random's first
    // draws correlate across adjacent seeds, so sequential batteries
    // would sweep correlated horizons/delays (the kind itself sat deep
    // enough in the draw stream to spread, but the data-shape params
    // did not)
    val rnd = new scala.util.Random(new scala.util.Random(seed).nextLong())
    val horizon = 300 + rnd.nextInt(600)
    val n = 150 + rnd.nextInt(250)
    val nKeys = 1 + rnd.nextInt(8)
    val cats = Seq("a", "b", "c", "d").take(1 + rnd.nextInt(4))
    val delay = 5 + rnd.nextInt(56)
    val win = 10 + rnd.nextInt(111)

    val rows0: Seq[Ev] = (0 until n).map { _ =>
      (new Timestamp((Base + rnd.nextInt(horizon)) * 1000L),
        rnd.nextInt(nKeys).toLong,
        cats(rnd.nextInt(cats.length)),
        rnd.nextInt(20000) / 100.0)
    }
    // exact duplicates (same ts ⇒ adjacent in the sorted feed, so the
    // dedup kind's state is never evicted between copies)
    val dups = Seq.fill(rnd.nextInt(10))(rows0(rnd.nextInt(rows0.size)))
    val rows = (rows0 ++ dups).sortBy(_._1.getTime)

    // ts-contiguous chunks + bounded in-watermark disorder: rows within
    // delay/2 of a chunk's max may defer into the next chunk — late for
    // the stream, but above the watermark by construction
    val nChunks = 1 + rnd.nextInt(4)
    val cut = rows.grouped(math.max(1, rows.size / nChunks)).toSeq
    val chunks = scala.collection.mutable.ArrayBuffer
      .from(cut.map(scala.collection.mutable.ArrayBuffer.from(_)))
    for (i <- 0 until chunks.size - 1) {
      val mx = chunks(i).map(_._1.getTime).max
      val (stay, defer) = chunks(i).partition(r =>
        r._1.getTime <= mx - delay * 500L || rnd.nextBoolean())
      if (stay.nonEmpty) { // never leave a chunk empty (batch feed order)
        chunks(i) = stay
        chunks(i + 1) = defer ++ chunks(i + 1)
      }
    }
    val maxTs = rows.map(_._1.getTime).max
    // three flush batches: each advances the watermark past everything
    // the previous batch could still hold; chained stateful operators
    // drain one level per batch
    val flush = (1 to 3).map(i =>
      (new Timestamp(maxTs + i * (delay + 2L * win + horizon) * 1000L),
        -1L, "zz_flush", 0.0))
    // the flush filter must reference the EVENT-TIME column: a predicate
    // that doesn't (e.g. key >= 0) is pushed BELOW the EventTimeWatermark
    // node by PushPredicateThroughNonJoin, and the flush rows then never
    // reach the watermark accumulator — found live by this fuzzer's first
    // 10 seeds (every streaming leg missing its tail windows)
    val cutoff = new Timestamp(maxTs)

    // (name, column) pairs: the names drive the post-agg flatten, so no
    // alias is ever parsed back out of a Column rendering
    val aggDefs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "a_cnt" -> count(lit(1)),
      "a_cents" -> sum((col("value") * 100).cast("long")),
      "a_min" -> min(col("value")),
      "a_max" -> max(col("value")),
      "a_mean" -> round(sum((col("value") * 100).cast("long")) /
        (lit(100.0) * count(lit(1))), 4))
    val picked = aggDefs.take(2 + rnd.nextInt(aggDefs.size - 1))
    val pickCols = picked.map { case (nm, c) => c.as(nm) }
    val pickNames = picked.map(_._1)
    val wdur = s"$win seconds"

    val kind = rnd.nextInt(17)
    // every seeded parameter draws HERE: the build closure runs once per
    // LEG, so a draw inside it would desynchronize the two plans (and
    // break generate's purity)
    val slide = math.max(5, win / (1 + rnd.nextInt(3)))
    val gap = 5 + rnd.nextInt(60)
    val havingK = 1 + rnd.nextInt(3)
    val tol = 5 + rnd.nextInt(46) // raw join time-range tolerance, seconds
    // seed-built dimension relation for the stream-static kind
    val dim = (0 until nKeys).map(k => (k.toLong,
      Seq("gold", "silver", "bronze")(rnd.nextInt(3))))
    // kind 9's restart harness runs in append OR update mode — drawn
    // LAST so every earlier draw (data, windows, aggs) stays
    // byte-identical to the recorded batteries' generator version
    val restartUpdate = rnd.nextBoolean()
    // round-22 kind params, drawn after everything above for the same
    // battery-stability reason
    val decUpdate = rnd.nextBoolean() // kind 11: update OR append mode
    val crossK = 2L + rnd.nextInt(5)  // kind 14: crossing threshold
    // kind 12 feeds the TWS processor UNSORTED: re-chunk with disorder
    // bounded at 14 s — under the processor's FIXED 30 s watermark, a
    // row deferred from chunk i (ts > max_i − 14 s) stays above the
    // watermark Spark computes from the PREVIOUS batch max (max_i −
    // 30 s), so it exercises the late-arrival merge into a still-open
    // window and the timer re-arm, never the beyond-watermark drop
    val twsChunks: Seq[Seq[Ev]] =
      if (kind != 12) Seq.empty
      else {
        val sorted = (rows).sortBy(_._1.getTime)
        val cut2 = sorted.grouped(math.max(1, sorted.size / nChunks)).toSeq
        val cs = scala.collection.mutable.ArrayBuffer
          .from(cut2.map(scala.collection.mutable.ArrayBuffer.from(_)))
        for (i <- 0 until cs.size - 1) {
          val mx = cs(i).map(_._1.getTime).max
          val (stay, defer) = cs(i).partition(r =>
            r._1.getTime <= mx - 14000L || rnd.nextBoolean())
          if (stay.nonEmpty) {
            cs(i) = stay
            cs(i + 1) = defer ++ cs(i + 1)
          }
        }
        cs.map(_.toSeq).toSeq
      }
    val build: DataFrame => DataFrame = { df =>
      // watermark FIRST, then the flush filter: flush rows advance the
      // clock but never reach an operator (ts-referencing, so it stays
      // ABOVE the watermark node — see `cutoff`)
      val w = df.withWatermark("ts", s"$delay seconds")
        .filter(col("ts") <= lit(cutoff))
      def flat(d: DataFrame, extra: Seq[String]) =
        d.select((Seq(col("w.start").cast("long").as("w_start")) ++
          extra.map(col) ++ pickNames.map(col)): _*)
      kind match {
        case 0 => // tumbling, per-category
          flat(w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(pickCols.head, pickCols.tail: _*), Seq("cat"))
        case 1 => // sliding
          flat(w.groupBy(
            window(col("ts"), wdur, s"$slide seconds").as("w"), col("cat"))
            .agg(pickCols.head, pickCols.tail: _*), Seq("cat"))
        case 2 => // session windows per key
          w.groupBy(session_window(col("ts"), s"$gap seconds")
              .as("w"), col("key"))
            .agg(pickCols.head, pickCols.tail: _*)
            .select((Seq(col("w.start").cast("long").as("s_start"),
              col("w.end").cast("long").as("s_end"), col("key")) ++
              pickNames.map(col)): _*)
        case 3 => // tumbling + post-aggregation filter
          flat(w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(pickCols.head, pickCols.tail: _*), Seq("cat"))
            .filter(col("a_cnt") > lit(havingK))
        case 4 => // two windowed aggregates stream-stream joined on the window
          val a = w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(count(lit(1)).as("a_cnt"),
              sum((col("value") * 100).cast("long")).as("a_cents"))
          val b = w.groupBy(window(col("ts"), wdur).as("w"))
            .agg(count(lit(1)).as("t_cnt"),
              sum((col("value") * 100).cast("long")).as("t_cents"))
          a.join(b, Seq("w"))
            .select(col("w.start").cast("long").as("w_start"), col("cat"),
              col("a_cnt"), col("a_cents"), col("t_cnt"), col("t_cents"))
        case 5 => // exact-duplicate drop, then the windowed aggregate
          flat(w.dropDuplicates(Seq("ts", "key", "cat", "value"))
            .groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(pickCols.head, pickCols.tail: _*), Seq("cat"))
        case 8 =>
          // UPDATE-mode tumbling aggregation (harness differs: the
          // memory sink accumulates every per-batch update; the runner
          // reduces the history to finals by max a_cnt, which is
          // strictly monotone across one key's updates). a_cnt leads so
          // the extraction key always exists.
          val u = Seq("a_cnt" -> count(lit(1))) ++
            picked.filterNot(_._1 == "a_cnt")
          w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(u.map { case (nm, c) => c.as(nm) }.head,
              u.map { case (nm, c) => c.as(nm) }.tail: _*)
            .select((Seq(col("w.start").cast("long").as("w_start"),
              col("cat")) ++ u.map(_._1).map(col)): _*)
        case 9 if !restartUpdate =>
          // KILL-AND-RESUME (append): the kind-0 plan, but the runner
          // feeds it through a checkpointed file source stopped and
          // restarted mid-feed — the plan under test is the recovery
          // path, not a new operator shape
          flat(w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(pickCols.head, pickCols.tail: _*), Seq("cat"))
        case 9 =>
          // KILL-AND-RESUME (update): the kind-8 plan across a restart
          // boundary — restored state must CONTINUE the per-key update
          // lineage (a_cnt stays monotone through the checkpoint), so
          // the post-restart finals equal the batch fold only if the
          // aggregation state was restored exactly
          val u = Seq("a_cnt" -> count(lit(1))) ++
            picked.filterNot(_._1 == "a_cnt")
          w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(u.map { case (nm, c) => c.as(nm) }.head,
              u.map { case (nm, c) => c.as(nm) }.tail: _*)
            .select((Seq(col("w.start").cast("long").as("w_start"),
              col("cat")) ++ u.map(_._1).map(col)): _*)
        case 10 =>
          // transformWithState differential (the one streaming surface
          // the fuzzer had not seeded): this BATCH leg is the exact fold
          // of SolarTws.moduleAggTws's output over the mapped feed —
          // fixed 30 s tumbling windows per (cat → panel, key → module).
          // The processor's m_avg_power is EXCLUDED (it rounds a
          // sequential-fold double sum at 1 — order-sensitive at .05
          // boundaries by design, wire parity); the double sum is
          // compared at round 4, where the 2-dp value grid sits 5e-3
          // from any half boundary so batch-tree-vs-state-fold ulps
          // cannot flip it
          w.groupBy(window(col("ts"), "30 seconds").as("w"),
              col("cat"), col("key"))
            .agg(count(lit(1)).as("m_cnt"),
              round(sum(col("value")), 4).as("m_sum4"))
            .select(col("w.start").cast("long").as("w_start"),
              col("cat").as("panel"),
              col("key").cast("string").as("module"),
              col("m_cnt"), col("m_sum4"))
        case 11 =>
          // DECIMAL-measure tumbling aggregation (VERDICT r18 #7): the
          // batch grammar fuzzes decimal sums/joins/rollups (QueryFuzz
          // kinds 15-17) but the streaming state store had never
          // serialized a decimal buffer under the differential gate.
          // Exact decimal(12,2) sum/min/max + the decimal-division avg
          // (deterministic function of exact sum and count), running in
          // append OR update mode by the decUpdate coin — a_cnt leads
          // for the update-finals extraction.
          val dv = col("value").cast("decimal(12,2)")
          w.groupBy(window(col("ts"), wdur).as("w"), col("cat"))
            .agg(count(lit(1)).as("a_cnt"), sum(dv).as("d_sum"),
              min(dv).as("d_min"), max(dv).as("d_max"),
              avg(dv).as("d_avg"))
            .select(col("w.start").cast("long").as("w_start"), col("cat"),
              col("a_cnt"), col("d_sum"), col("d_min"), col("d_max"),
              col("d_avg"))
        case 12 =>
          // transformWithState under UNSORTED feeds (VERDICT r18 #3):
          // same batch fold as kind 10 — the streaming leg runs the
          // REAL processor over the disorder-bounded twsChunks without
          // the kind-10 re-sort, exercising late-row merges into open
          // windows and timer re-arms
          w.groupBy(window(col("ts"), "30 seconds").as("w"),
              col("cat"), col("key"))
            .agg(count(lit(1)).as("m_cnt"),
              round(sum(col("value")), 4).as("m_sum4"))
            .select(col("w.start").cast("long").as("w_start"),
              col("cat").as("panel"),
              col("key").cast("string").as("module"),
              col("m_cnt"), col("m_sum4"))
        case 13 =>
          // transformWithState ACROSS A RESTART (VERDICT r18 #3, kinds
          // 9+10 composed): the kind-10 fold, streamed through a
          // checkpointed file source killed and resumed mid-feed — the
          // ListState buffers and armed timers must restore exactly
          w.groupBy(window(col("ts"), "30 seconds").as("w"),
              col("cat"), col("key"))
            .agg(count(lit(1)).as("m_cnt"),
              round(sum(col("value")), 4).as("m_sum4"))
            .select(col("w.start").cast("long").as("w_start"),
              col("cat").as("panel"),
              col("key").cast("string").as("module"),
              col("m_cnt"), col("m_sum4"))
        case 14 | 15 =>
          // MapState processor (VERDICT r18 #3): the batch twin of
          // CatCrossProcessor's first-crossing set — crossed ⟺ the
          // (key, cat) total reaches the threshold, independent of
          // chunking (kind 15 runs the same fold but streams through a
          // kill-and-resume checkpoint: MapState entries — tallies AND
          // fired flags — must restore exactly). No watermark (no
          // timers); flush rows drop on key
          df.filter(col("key") >= 0)
            .groupBy(col("key"), col("cat"))
            .agg(count(lit(1)).as("c"))
            .filter(col("c") >= lit(crossK))
            .select(col("key"), col("cat"))
        case 6 | 16 =>
          // RAW stream-stream inner join with a time-range condition —
          // the join STATE MACHINE itself (the agg-join of kind 4 only
          // exercises finalized windows): even keys left, odd keys
          // right, equi on key/2, right row within ±tol of the left.
          // Both sides carry the one watermark; state evicts as it
          // passes ts+tol. Exact-value columns only. Kind 16 is the
          // DECIMAL plane of the same join: the buffered rows carry
          // decimal(12,2) measures, so the join state store serializes
          // and restores decimals (kind 11 covers only AGG state), and
          // the output adds the exact decimal(13,2) sum of the two
          // sides — deterministic in both engines.
          val dec16 = kind == 16
          val lval =
            if (dec16) col("value").cast("decimal(12,2)").as("l_dec")
            else (col("value") * 100).cast("long").as("lcents")
          val rval =
            if (dec16) col("value").cast("decimal(12,2)").as("r_dec")
            else (col("value") * 100).cast("long").as("rcents")
          val l = w.filter(col("key") % 2 === 0)
            .select(col("ts").as("lts"), (col("key") / 2).as("jk"), lval)
          val r = w.filter(col("key") % 2 === 1)
            .select(col("ts").as("rts"), ((col("key") - 1) / 2).as("jk2"),
              rval)
          val joined = l.join(r, col("jk") === col("jk2") &&
            col("rts") >= col("lts") - expr(s"INTERVAL $tol SECONDS") &&
            col("rts") <= col("lts") + expr(s"INTERVAL $tol SECONDS"))
          if (dec16)
            joined.select(col("jk"), col("lts").cast("long").as("l_sec"),
              col("rts").cast("long").as("r_sec"), col("l_dec"),
              col("r_dec"), (col("l_dec") + col("r_dec")).as("lr_sum"))
          else
            joined.select(col("jk"), col("lts").cast("long").as("l_sec"),
              col("rts").cast("long").as("r_sec"), col("lcents"),
              col("rcents"))
        case _ =>
          // stream-static dimension join: the broadcast-enrich class —
          // the static side is a seed-built (key → tier) relation, the
          // enriched stream re-aggregates per (window, tier)
          val dimDf = df.sparkSession.createDataFrame(dim)
            .toDF("key", "tier")
          flat(w.join(broadcast(dimDf), Seq("key"))
            .groupBy(window(col("ts"), wdur).as("w"), col("tier"))
            .agg(pickCols.head, pickCols.tail: _*), Seq("tier"))
      }
    }
    SFQuery(s"sfz_${seed}_k$kind",
      if (kind == 12) twsChunks else chunks.map(_.toSeq).toSeq,
      flush, build,
      mode = kind match {
        case 8  => "update"
        case 9  => if (restartUpdate) "restart_update" else "restart"
        case 10 => "tws"
        case 11 => if (decUpdate) "update" else "append"
        case 12 => "tws2"
        case 13 => "restart_tws"
        case 14 => "twsmap"
        case 15 => "restart_twsmap"
        case _  => "append"
      },
      param = if (kind == 14 || kind == 15) crossK else 0L)
  }

  /** Canonical row rendering: null-safe stringification sorted — the
    * compare is set-like with multiplicity.
    */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq
      .map(_.toSeq.map(v => String.valueOf(v)).mkString("|")).sorted

  /** Runs both legs; returns (streamed, batch) canonical rows. For
    * mode = "update" the streamed leg is the per-key FINAL update (and a
    * divergence from the append-mode suppress twin on the same feed is
    * reported as a marker row, so it can never pass silently); for
    * mode = "restart" the streamed leg is the emission history of a
    * checkpointed query killed and resumed mid-feed.
    */
  def runOne(spark: SparkSession, q: SFQuery): (Seq[String], Seq[String]) = {
    val batch = {
      import spark.implicits._
      canon(q.build(q.allRows.toDF("ts", "key", "cat", "value")))
    }
    val streamed = q.mode match {
      case "update"         => runUpdate(spark, q)
      case "restart"        => runRestart(spark, q)
      case "restart_update" => runRestart(spark, q, update = true)
      case "tws"            => runTws(spark, q)
      case "tws2"           => runTws(spark, q, sorted = false)
      case "restart_tws"    => runRestartTws(spark, q)
      case "twsmap"         => runTwsMap(spark, q)
      case "restart_twsmap" => runRestartTwsMap(spark, q)
      case _                => runAppend(spark, q)
    }
    (streamed, batch)
  }

  /** transformWithState leg: the mapped feed runs through the REAL
    * `SolarTws.moduleAggTws` processor (ListState window buffers +
    * event-time timers) and must equal the batch fold in `q.build`.
    * Disciplines specific to this kind: the processor carries a FIXED
    * 30 s watermark, smaller than some seeds' disorder bound, so the
    * feed is deterministically re-sorted and re-chunked (no late data
    * at all — the generator's in-watermark disorder contract can't be
    * promised against a delay it didn't draw); flush rows form their
    * own (zz_flush) groups and are filtered from the OUTPUT (their job
    * — advancing the watermark — is done upstream of the filter); the
    * order-sensitive derived avg is projected away and the sum compared
    * at round 4 (see the kind-10 generator note).
    */
  private def runTws(spark: SparkSession, q: SFQuery,
                     sorted: Boolean = true): Seq[String] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val name = q.name + "_tws"
    val readings = input.toDF().toDF("ts", "key", "cat", "value")
      .select(col("ts"), col("cat").as("panel"),
        col("key").cast("string").as("module"), col("value").as("power"))
      .as[graft.streaming.SolarStateful.Reading]
    val out = graft.streaming.SolarTws.moduleAggTws(spark, readings).toDF()
      .filter(col("panel") =!= "zz_flush")
      .select(col("w_start"), col("panel"), col("module"), col("m_cnt"),
        round(col("m_sum_power"), 4).as("m_sum4"))
    val sq = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val feed: Seq[Seq[Ev]] =
        if (!sorted) q.chunks // kind 12: generator-bounded disorder
        else {
          val s = q.chunks.flatten.sortBy(_._1.getTime)
          val per = math.max(1, s.size / math.max(1, q.chunks.size))
          s.grouped(per).toSeq
        }
      feed.foreach { c =>
        input.addData(c: _*); sq.processAllAvailable()
      }
      q.flush.foreach { f => input.addData(f); sq.processAllAvailable() }
      canon(spark.table(name))
    } finally {
      sq.stop()
      spark.catalog.dropTempView(name)
      ()
    }
  }

  /** MapState leg (kind 14): the (key, cat) feed runs through the REAL
    * `SolarTws.catCrossAlerts` processor (MapState tallies, TTL-free —
    * TimeMode.None, so the query goes idle and `processAllAvailable`
    * synchronizes; no watermark, so no flush choreography) and the
    * emitted first-crossing set must equal the batch
    * `count >= threshold` fold; the seeded threshold rides
    * `SFQuery.param` so both legs share it.
    */
  private def runTwsMap(spark: SparkSession, q: SFQuery): Seq[String] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val name = q.name + "_twsmap"
    val thr = q.param
    val pairs = input.toDF().toDF("ts", "key", "cat", "value")
      .filter(col("key") >= 0)
      .select(col("key"), col("cat")).as[(Long, String)]
    val out = graft.streaming.SolarTws.catCrossAlerts(spark, pairs, thr).toDF()
    val sq = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.chunks.foreach { c => input.addData(c: _*); sq.processAllAvailable() }
      q.flush.foreach { f => input.addData(f); sq.processAllAvailable() }
      canon(spark.table(name))
    } finally {
      sq.stop()
      spark.catalog.dropTempView(name)
      ()
    }
  }

  /** transformWithState ACROSS A RESTART (kind 13): the kind-10 plan
    * fed from a checkpointed parquet file source that is stopped after
    * the first half of the (sorted) chunks and resumed — open ListState
    * window buffers and armed timers must restore exactly, so the
    * accumulated append emissions equal the batch fold with no replays
    * and no losses.
    */
  private def runRestartTws(spark: SparkSession, q: SFQuery): Seq[String] = {
    import spark.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_sfz_twssrc_").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_sfz_twsckpt_").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cat",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val emitted = scala.collection.mutable.Buffer[org.apache.spark.sql.Row]()
    var outSchema: org.apache.spark.sql.types.StructType = null
    def writeBatch(rows: Seq[Ev]): Unit =
      rows.toDF("ts", "key", "cat", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runUntilIdle(): Unit = {
      val readings = spark.readStream.schema(schema).parquet(srcDir)
        .select(col("ts"), col("cat").as("panel"),
          col("key").cast("string").as("module"), col("value").as("power"))
        .as[graft.streaming.SolarStateful.Reading]
      val sq = graft.streaming.SolarTws.moduleAggTws(spark, readings).toDF()
        .filter(col("panel") =!= "zz_flush")
        .select(col("w_start"), col("panel"), col("module"), col("m_cnt"),
          round(col("m_sum_power"), 4).as("m_sum4"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: DataFrame, _: Long) =>
          emitted.synchronized {
            outSchema = b.schema
            emitted ++= b.collect()
          }
          ()
        }
        .start()
      try sq.processAllAvailable() finally sq.stop()
    }
    try {
      // the fixed 30 s watermark demands the kind-10 sorted feed
      val sorted = q.chunks.flatten.sortBy(_._1.getTime)
      val per = math.max(1, sorted.size / math.max(1, q.chunks.size))
      val chunks = sorted.grouped(per).toSeq
      val splitAt = math.max(1, chunks.size / 2)
      chunks.take(splitAt).foreach(writeBatch)
      runUntilIdle() // run 1, killed mid-feed
      chunks.drop(splitAt).foreach(writeBatch)
      q.flush.foreach(f => writeBatch(Seq(f)))
      runUntilIdle() // run 2 resumes from the checkpoint
      if (emitted.isEmpty) Seq.empty
      else canon(spark.createDataFrame(
        spark.sparkContext.parallelize(emitted.toSeq, 1), outSchema))
    } finally {
      def rm(p: String): Unit = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
      }
      rm(srcDir); rm(ckptDir)
    }
  }

  /** MapState ACROSS A RESTART (kind 15): the kind-14 differential fed
    * from a checkpointed parquet file source stopped after the first
    * half of the chunks and resumed — the MapState entries (per-cat
    * tallies AND fired flags) must restore exactly, so the accumulated
    * first-crossing emissions equal the batch fold with no replays
    * (a lost tally under-counts and misses crossings; a lost fired
    * flag re-alerts) — the MapState twin of [[runRestartTws]]'s
    * ListState/timer restore. No watermark, so no flush choreography;
    * flush rows drop on the key filter inside the plan.
    */
  private def runRestartTwsMap(spark: SparkSession, q: SFQuery): Seq[String] = {
    import spark.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_sfz_twsmsrc_").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_sfz_twsmckpt_").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cat",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val emitted = scala.collection.mutable.Buffer[org.apache.spark.sql.Row]()
    var outSchema: org.apache.spark.sql.types.StructType = null
    def writeBatch(rows: Seq[Ev]): Unit =
      rows.toDF("ts", "key", "cat", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runUntilIdle(): Unit = {
      val pairs = spark.readStream.schema(schema).parquet(srcDir)
        .filter(col("key") >= 0)
        .select(col("key"), col("cat")).as[(Long, String)]
      val sq = graft.streaming.SolarTws
        .catCrossAlerts(spark, pairs, q.param).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: DataFrame, _: Long) =>
          emitted.synchronized {
            outSchema = b.schema
            emitted ++= b.collect()
          }
          ()
        }
        .start()
      try sq.processAllAvailable() finally sq.stop()
    }
    try {
      val splitAt = math.max(1, q.chunks.size / 2)
      q.chunks.take(splitAt).foreach(writeBatch)
      runUntilIdle() // run 1, killed mid-feed
      q.chunks.drop(splitAt).foreach(writeBatch)
      runUntilIdle() // run 2 resumes from the checkpoint
      if (emitted.isEmpty) Seq.empty
      else canon(spark.createDataFrame(
        spark.sparkContext.parallelize(emitted.toSeq, 1), outSchema))
    } finally {
      def rm(p: String): Unit = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
      }
      rm(srcDir); rm(ckptDir)
    }
  }

  private def runAppend(spark: SparkSession, q: SFQuery,
                        suffix: String = "_t"): Seq[String] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val name = q.name + suffix
    val sq = q.build(input.toDF().toDF("ts", "key", "cat", "value"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      q.chunks.foreach { c => input.addData(c: _*); sq.processAllAvailable() }
      q.flush.foreach { f => input.addData(f); sq.processAllAvailable() }
      canon(spark.table(name))
    } finally {
      sq.stop()
      spark.catalog.dropTempView(name)
      ()
    }
  }

  /** Update-mode leg: the memory sink accumulates every per-batch
    * update; the FINAL row per (w_start, cat) is the one at max a_cnt
    * (strictly monotone — every update to a key adds rows, so its count
    * grows). The finals must equal the batch fold AND the append-mode
    * suppress twin over the same feed — the twin check rides along as a
    * marker row on divergence.
    */
  private def runUpdate(spark: SparkSession, q: SFQuery): Seq[String] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val name = q.name + "_u"
    val sq = q.build(input.toDF().toDF("ts", "key", "cat", "value"))
      .writeStream.format("memory").queryName(name).outputMode("update")
      .start()
    val finals = try {
      q.chunks.foreach { c => input.addData(c: _*); sq.processAllAvailable() }
      q.flush.foreach { f => input.addData(f); sq.processAllAvailable() }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("w_start", "cat").orderBy(col("a_cnt").desc)
      canon(spark.table(name)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn"))
    } finally {
      sq.stop()
      spark.catalog.dropTempView(name)
      ()
    }
    val twin = runAppend(spark, q, suffix = "_u_twin")
    if (twin == finals) finals
    else finals :+ s"UPDATE_VS_APPEND_TWIN_DIVERGED: twin=${twin.size} " +
      s"finals=${finals.size} firstDiff=${
        (twin.diff(finals) ++ finals.diff(twin)).headOption.getOrElse("?")}"
  }

  /** Kill-and-resume leg: the feed lands in a parquet directory read by
    * a checkpointed file-source query that is STOPPED after the first
    * half of the chunks and resumed as a fresh query on the same
    * checkpoint (the StreamingRecoverySpec discipline, seeded). In
    * append mode the accumulated foreachBatch emissions must equal the
    * batch fold — exactly once across the restart boundary, no replays,
    * no losses. With `update = true` the same harness runs the kind-8
    * update plan: the emission history reduces to per-key finals by the
    * monotone a_cnt (which must CONTINUE through the checkpoint —
    * restored state, not a re-seeded count), and an at-least-once
    * replay of the last uncommitted batch re-emits only byte-identical
    * rows, which the finals extraction absorbs.
    */
  private def runRestart(spark: SparkSession, q: SFQuery,
                         update: Boolean = false): Seq[String] = {
    import spark.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_sfz_src_").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_sfz_ckpt_").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cat",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val emitted = scala.collection.mutable.Buffer[org.apache.spark.sql.Row]()
    var outSchema: org.apache.spark.sql.types.StructType = null
    def writeBatch(rows: Seq[Ev]): Unit =
      rows.toDF("ts", "key", "cat", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runUntilIdle(): Unit = {
      val sq = q.build(spark.readStream.schema(schema).parquet(srcDir))
        .writeStream.outputMode(if (update) "update" else "append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: DataFrame, _: Long) =>
          emitted.synchronized {
            outSchema = b.schema
            emitted ++= b.collect()
          }
          ()
        }
        .start()
      try sq.processAllAvailable() finally sq.stop()
    }
    try {
      val splitAt = math.max(1, q.chunks.size / 2)
      q.chunks.take(splitAt).foreach(writeBatch)
      runUntilIdle() // run 1, killed mid-feed
      q.chunks.drop(splitAt).foreach(writeBatch)
      q.flush.foreach(f => writeBatch(Seq(f)))
      runUntilIdle() // run 2 resumes from the checkpoint
      val all =
        if (emitted.isEmpty) spark.emptyDataFrame
        else spark.createDataFrame(
          spark.sparkContext.parallelize(emitted.toSeq, 1), outSchema)
      if (!update) canon(all)
      else if (emitted.isEmpty) Seq.empty
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("w_start", "cat").orderBy(col("a_cnt").desc)
        canon(all.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn"))
      }
    } finally {
      def rm(p: String): Unit = {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .reverseIterator.foreach(java.nio.file.Files.deleteIfExists(_))
      }
      rm(srcDir); rm(ckptDir)
    }
  }

  def main(args: Array[String]): Unit = {
    val from = if (args.length > 0) args(0).toLong else 1L
    val to = if (args.length > 1) args(1).toLong else 200L
    val spark = graft.Engine.builder("graft-streamfuzz")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var fails = 0
    (from to to).foreach { seed =>
      val q = generate(seed)
      val (s, b) = runOne(spark, q)
      if (s != b) {
        fails += 1
        println(s"SEED $seed (${q.name}) DIVERGED: " +
          s"streamed=${s.size} batch=${b.size}")
        (s.diff(b) ++ b.diff(s)).take(6).foreach(r => println(s"  $r"))
      } else if (seed % 25 == 0 || sys.env.contains("STREAM_FUZZ_VERBOSE"))
        println(s"seed $seed ok (${q.name}, ${s.size} rows)")
    }
    println(if (fails == 0) s"STREAMFUZZ ALL OK (${to - from + 1} seeds)"
    else s"STREAMFUZZ $fails FAILURES")
    spark.stop()
  }
}
