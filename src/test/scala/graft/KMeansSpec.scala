package graft

import graft.operators.Similarity

class KMeansSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmeans recovers well-separated clusters and feeds ivfTopK") {
    // three tight clusters around (10,0), (0,10), (-10,-10)
    def jitter(i: Int) = (i % 3) * 0.1f
    val vecs = (0 until 30).map { i =>
      val c = i % 3
      val base = c match {
        case 0 => (10.0f, 0.0f)
        case 1 => (0.0f, 10.0f)
        case _ => (-10.0f, -10.0f)
      }
      (i.toLong, Array(base._1 + jitter(i), base._2 + jitter(i)), 0)
    }.toDF("vec_id", "embedding", "label")

    val cells = Similarity.kmeansCells(vecs, k = 3, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // all members of a true cluster land in the same learned cell,
    // and the three clusters get three distinct cells
    val byTrueCluster = (0 until 30).groupBy(_ % 3)
      .map { case (c, ids) => c -> ids.map(i => cells(i.toLong)).toSet }
    assert(byTrueCluster.values.forall(_.size == 1))
    assert(byTrueCluster.values.flatten.toSet.size === 3)

    // IVF with learned cells: probing vec 0's cell returns only its cluster
    val withCells = vecs.drop("label")
      .join(Similarity.kmeansCells(vecs, k = 3, iters = 5), "vec_id")
      .withColumnRenamed("cell", "label")
    val nn = Similarity.ivfTopK(withCells, withCells.filter($"vec_id" === 0), k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(nn.subsetOf((0 until 30).filter(_ % 3 == 0).map(_.toLong).toSet))
    assert(nn.size === 5)
  }
}
