package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.nearest_cells
import graft.operators.Similarity

/** Pins the r19 driver-side Lloyd ([[Similarity.kmeansFitLocal]]) against
  * an in-test replica of the distributed loop it replaced — the exact
  * `aggregate(array_sort(collect_list))`/`round(·,6)` spelling, run in
  * Spark SQL — bit-for-bit on the centroid doubles. The driver fit must
  * be arithmetic-identical (same sample, same kernel assignment, same
  * sorted IEEE fold, same HALF_UP round), not merely close: every oracle
  * replay of a kmeans consumer interpolates these doubles as literals.
  */
class KmeansLocalSpec extends SparkSpecBase {

  /** The pre-r19 distributed Lloyd, verbatim semantics. */
  private def distributedFit(e: DataFrame, k: Int, iters: Int,
                             trainN: Int): Array[Seq[Double]] = {
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    val train = v.orderBy(col("vec_id")).limit(trainN)
    var cents: Array[Seq[Double]] = train.limit(k)
      .select(col("emb")).collect().map(_.getSeq[Double](0))
    for (_ <- 1 to iters) {
      val means = train
        .select(col("vec_id"), col("emb"),
          element_at(nearest_cells(col("emb"), cents.toIndexedSeq, 1), 1)
            .as("cell"))
        .select(col("cell"), posexplode(col("emb")))
        .groupBy(col("cell"), col("pos"))
        .agg(collect_list(col("col")).as("vs"))
        .select(col("cell"), col("pos"),
          round(aggregate(array_sort(col("vs")), lit(0.0d), (a, x) => a + x)
            / size(col("vs")), 6).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(col("cell"), col("ms.m").as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents = cents.indices.map(j => means.getOrElse(j, cents(j))).toArray
    }
    cents
  }

  private lazy val embs =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("driver-side Lloyd ≡ the distributed loop, bit for bit") {
    for ((k, iters, trainN) <- Seq((4, 2, 256), (5, 3, 64), (2, 1, 200))) {
      val local = Similarity.kmeansFit(embs, k, iters, trainN).centroids
      val dist = distributedFit(embs, k, iters, trainN)
      assert(local.length === dist.length, s"k=$k")
      local.zip(dist).zipWithIndex.foreach { case ((l, d), j) =>
        assert(l === d, s"centroid $j diverged at k=$k iters=$iters")
      }
    }
    spark.catalog.clearCache()
  }

  test("pqFit codebooks ≡ per-subspace distributed fits on sliced input") {
    val dim = 64; val m = 4; val sub = dim / m
    val model = Similarity.pqFit(embs, dim = dim, m = m, k = 8,
      iters = 2, trainN = 128)
    (0 until m).foreach { mi =>
      val sliced = embs.select(col("vec_id"),
        slice(col("embedding"), mi * sub + 1, sub).as("embedding"))
      val ref = distributedFit(sliced, k = 8, iters = 2, trainN = 128)
      assert(model.codebooks(mi).map(_.toIndexedSeq) ===
        ref.toIndexedSeq.map(_.toIndexedSeq), s"subspace $mi")
    }
    spark.catalog.clearCache()
  }

  test("k > sample size and tiny samples keep the old edge semantics") {
    import spark.implicits._
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val local = Similarity.kmeansFit(tiny, k = 5, iters = 2, trainN = 3)
      .centroids
    val dist = distributedFit(tiny, k = 5, iters = 2, trainN = 3)
    assert(local.toIndexedSeq === dist.toIndexedSeq)
    assert(local.length === 3) // only 3 sample rows exist
  }
}
