package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins the corpus-wide k-NN join (q155): equality with the broadcast
  * query-sample twin, brute-force exactness at full probe, self-pair
  * semantics, and plan shape (no nested loop, probe explode present).
  */
class KnnJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val embs =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val model = Similarity.kmeansFit(embs, k = 4, iters = 2)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "vec_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet

  test("knnJoin equals the broadcast multi-probe twin on a query sample") {
    // same model, same k/nProbe: the symmetric-shuffle plan must produce
    // exactly the broadcast-query-side plan's answer
    val sample: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("vec_id") < 16)
    val twin = rows(Similarity.ivfTopKMultiProbeModel(
      embs, model, sample, k = 5, nProbe = 2))
    val knn = rows(Similarity.knnJoin(sample(embs), embs, model,
      k = 5, nProbe = 2))
    assert(knn === twin)
    assert(knn.nonEmpty)
  }

  test("knnJoin probing every cell equals the exact brute-force top-k") {
    // nProbe = kCells scores the whole corpus per query: the IVF join
    // degenerates to exact k-NN, so it must match bruteTopK bit-for-bit
    val sample = embs.filter(col("vec_id") < 8)
    val brute = rows(Similarity.bruteTopK(embs, sample, k = 5))
    val full = rows(Similarity.knnJoin(sample, embs, model,
      k = 5, nProbe = 4))
    assert(full === brute)
  }

  test("excludeSameId=false surfaces the self-pair at rank 1 with cos 1") {
    val sample = embs.filter(col("vec_id") < 4)
    val out = Similarity.knnJoin(sample, embs, model, k = 1, nProbe = 1,
      excludeSameId = false)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)]
      .collect().toSet
    assert(out === Set((0L, 0L, 1.0), (1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 1.0)))
  }

  test("every query emits at most k neighbors, ranks dense from 1") {
    val out = Similarity.knnJoin(embs, embs, model, k = 5, nProbe = 2)
      .groupBy("q_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, n, lo, hi) => n <= 5 && lo == 1 && hi == n })
  }

  test("plan shape: probe explode + cell equi-join, never a nested loop") {
    val df = Similarity.knnJoin(embs, embs, model, k = 5, nProbe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Generate")) // the nProbe cell explode
  }

  test("hardNegatives: no pair shares a label, and the candidate-stage " +
       "filter out-fills a post-filtered knnJoin") {
    val labels = embs.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val hard = Similarity.hardNegatives(embs, model, k = 5, nProbe = 2)
      .select("q_id", "vec_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect()
    assert(hard.nonEmpty)
    hard.foreach { case (q, v, _, _) =>
      assert(labels(q) !== labels(v), s"pair ($q, $v) shares a label")
    }
    // filtering AFTER a top-k would under-fill: nearest neighbors are
    // mostly same-label, so per-query hard-negative counts must be >=
    // the post-filter's everywhere and > somewhere
    val post = rows(Similarity.knnJoin(embs, embs, model, k = 5, nProbe = 2))
      .toSeq.filter { case (q, v, _, _) => labels(q) != labels(v) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val hardCnt = hard.groupBy(_._1).view.mapValues(_.size).toMap
    assert(hardCnt.keySet.forall(q =>
      hardCnt(q) >= post.getOrElse(q, 0)))
    assert(hardCnt.exists { case (q, n) => n > post.getOrElse(q, 0) })
  }
}
