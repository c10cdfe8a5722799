package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EditDistance

/** Exact edit-distance join semantics (q164): the pigeonhole candidates
  * + verify must equal the naive quadratic join on any input.
  */
class EditDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def naive(rows: DataFrame, k: Int): Set[(Long, Long, Int)] = {
    val a = rows.select(col("id").as("ia"), col("s").as("sa"))
    val b = rows.select(col("id").as("ib"), col("s").as("sb"))
    a.crossJoin(b)
      .filter(col("ia") < col("ib") &&
        levenshtein(col("sa"), col("sb")) <= k)
      .select(col("ia"), col("ib"),
        levenshtein(col("sa"), col("sb")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def run(rows: DataFrame, k: Int): Set[(Long, Long, Int)] = {
    val st = EditDistance.editDistanceJoinStage(rows, "id", "s", k)
    val out = st.result.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    st.unpersist()
    out
  }

  test("hand fixture: substitutions, indels, boundary edits, duplicates") {
    val rows = Seq(
      (1L, "kitten"), (2L, "sitten"), // sub, d=1
      (3L, "sittin"), // d(2,3)=1, d(1,3)=2
      (4L, "sitting"), // insert at end: d(3,4)=1
      (5L, "itten"), // delete at front: d(1,5)=1
      (6L, "kitten"), // duplicate of 1: d=0
      (7L, "banana") // far from everything
    ).toDF("id", "s")
    for (k <- 0 to 3)
      assert(run(rows, k) === naive(rows, k), s"k=$k")
  }

  test("short strings route through the fallback branch") {
    val rows = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"),
      (5L, "abcd"), (6L, "b"), (7L, "zzzz")).toDF("id", "s")
    for (k <- 1 to 3)
      assert(run(rows, k) === naive(rows, k), s"k=$k")
  }

  test("seeded random sweep equals the naive join at k=0..3") {
    val rnd = new scala.util.Random(4242)
    val rows = (1L to 80L).map { id =>
      val len = rnd.nextInt(9) // 0..8: includes empty + short strings
      (id, Seq.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString)
    }.toDF("id", "s")
    for (k <- 0 to 3) {
      val got = run(rows, k)
      val want = naive(rows, k)
      assert(got === want,
        s"k=$k missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("longer realistic strings: one edit anywhere is found") {
    val base = "Customer#000001234"
    val variants = (('0' to '9').zipWithIndex.map { case (c, i) =>
      (i.toLong + 2, base.updated(9 + (i % 9), c))
    } :+ (1L -> base) :+ (20L -> (base + "X")) :+ (21L -> base.drop(1)))
      .toDF("id", "s")
    assert(run(variants, 1) === naive(variants, 1))
    assert(run(variants, 2) === naive(variants, 2))
  }

  test("null strings are dropped, not paired") {
    val rows = Seq((1L, "abc"), (2L, null.asInstanceOf[String]),
      (3L, "abd")).toDF("id", "s")
    assert(run(rows, 1) === Set((1L, 3L, 1)))
  }

  test("corpus-constant prefix+suffix strip exactly (the probe's hazard)") {
    val rnd = new scala.util.Random(777)
    // every string is "User#" + 0..6 random chars + ".com" — the
    // un-stripped pigeonhole would degenerate on the constant segments
    val rows = (1L to 60L).map { id =>
      val len = rnd.nextInt(7)
      (id, "User#" +
        Seq.fill(len)(if (rnd.nextBoolean()) 'x' else 'y').mkString + ".com")
    }.toDF("id", "s")
    for (k <- 0 to 3)
      assert(run(rows, k) === naive(rows, k), s"k=$k")
  }

  test("all-identical corpus: cores strip to empty, only ed=0 pairs") {
    val rows = (1L to 4L).map(id => (id, "same-name")).toDF("id", "s")
    assert(run(rows, 2) ===
      (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b, 0)).toSet)
  }

  private def naiveInc(corpus: DataFrame, incoming: DataFrame,
                       k: Int): Set[(Long, Long, Int)] = {
    val a = incoming.select(col("id").as("ii"), col("s").as("sa"))
    val b = corpus.select(col("id").as("ic"), col("s").as("sb"))
    a.crossJoin(b)
      .filter(levenshtein(col("sa"), col("sb")) <= k)
      .select(col("ii"), col("ic"),
        levenshtein(col("sa"), col("sb")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("incremental vs corpus equals naive; exact dup crosses at dist 0") {
    val corpus = Seq((1L, "kitten"), (2L, "banana"), (3L, "ab"),
      (4L, "shared")).toDF("id", "s")
    val incoming = Seq((10L, "sitten"), (11L, "bananas"), (12L, "a"),
      (13L, "shared"), (14L, "unrelated-zzz")).toDF("id", "s")
    for (k <- 0 to 3) {
      val st = graft.operators.EditDistance
        .editDistanceAgainstCorpusStage(corpus, incoming, "id", "s", k)
      val got = st.result.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      st.unpersist()
      assert(got === naiveInc(corpus, incoming, k), s"k=$k")
    }
  }

  test("incremental seeded sweep: union-affix stripping stays exact") {
    val rnd = new scala.util.Random(909)
    // shared "ID-" prefix across BOTH relations; incoming adds strings
    // that break the corpus-only affix — union-affix must handle it
    def gen(ids: Range, pfx: String) = ids.map { id =>
      (id.toLong, pfx +
        Seq.fill(rnd.nextInt(6))(if (rnd.nextBoolean()) 'p' else 'q').mkString)
    }
    val corpus = gen(1 to 40, "ID-").toDF("id", "s")
    val incoming = (gen(100 to 130, "ID-") ++ Seq((200L, "XD-pq")))
      .toDF("id", "s")
    for (k <- 1 to 2) {
      val st = graft.operators.EditDistance
        .editDistanceAgainstCorpusStage(corpus, incoming, "id", "s", k)
      val got = st.result.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      st.unpersist()
      assert(got === naiveInc(corpus, incoming, k), s"k=$k")
    }
  }

  test("streaming twin equals the batch incremental on the same input") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((1L, "kitten"), (2L, "banana"), (3L, "ab"),
      (4L, "dup"), (5L, "dup")).toDF("id", "s")
    val incRows = Seq((10L, "sitten"), (11L, "banana"), (12L, "a"),
      (13L, "dup"), (14L, "far-away-zzz"))
    val input = MemoryStream[(Long, String)]
    val stage = graft.streaming.StreamingDedup
      .editDistanceAgainstCorpusStreamStage(
        input.toDF.toDF("id", "s")
          .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp")),
        corpus, "id", "s", k = 1)
    val q = stage.result.writeStream.format("memory")
      .queryName("ed_stream_test").outputMode("append").start()
    try {
      input.addData(incRows.take(2)); q.processAllAvailable()
      input.addData(incRows.drop(2)); q.processAllAvailable()
      val streamed = spark.table("ed_stream_test")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val bst = graft.operators.EditDistance.editDistanceAgainstCorpusStage(
        corpus, incRows.toDF("id", "s"), "id", "s", 1)
      val batch = bst.result.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      bst.unpersist()
      assert(streamed === batch,
        "unstripped streaming pigeonhole must equal the batch incremental")
      // the duplicated corpus string pairs the incoming 'dup' with BOTH
      // corpus ids, exactly once each (watermark pair dedup)
      assert(streamed.count { case (i, _, d) => i == 13L && d == 0 } == 2)
    } finally { q.stop(); stage.unpersist() }
  }
}
