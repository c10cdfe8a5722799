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

  test("two-level assignment ≡ flat argmin when all groups are probed, " +
    "and stays high-agreement at p=1 on separated clusters") {
    import org.apache.spark.sql.functions._
    // 8 separated direction clusters in 4-d, 200 vectors
    val vecs = (0 until 200).map { i =>
      val c = i % 8
      val base = Array.fill(4)(0.05f * ((i / 8) % 3))
      base(c % 4) = if (c < 4) 1.0f else -1.0f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val model = Similarity.kmeansFit(vecs, k = 8, iters = 4, trainN = 200)
    val idx = Similarity.hierIndex(model, groups = 3)
    // every cell belongs to exactly one group
    assert(idx.members.flatten.sorted === (0 until 8))
    val flat = model.cells.as[(Long, Int)].collect().toMap
    // probing ALL groups makes the two-level argmin exhaustive -> must
    // equal the flat kernel bit-for-bit (same tie semantics)
    val allP = Similarity.assignCellsTwoLevel(vecs, model, idx,
      nProbeGroups = idx.groupCents.length).as[(Long, Int)].collect().toMap
    assert(allP === flat)
    // p=1 on separated clusters: near-total agreement (the probe's
    // measured quantity; here geometry makes it exact or near-exact)
    val p1 = Similarity.assignCellsTwoLevel(vecs, model, idx, 1)
      .as[(Long, Int)].collect().toMap
    val agree = p1.count { case (id, c) => flat(id) == c }
    assert(agree >= (p1.size * 0.9).toInt,
      s"p=1 agreement too low: $agree of ${p1.size}")
  }

  test("hierIndex is internally consistent: every member cell is nearest " +
    "its OWN group among all published groups") {
    // a deliberately non-converged geometry (cells on a line, one Lloyd
    // iteration, init = first 3 cells): the final centroid update moves
    // the group centers far from the pre-update assignment, so the old
    // members-from-stale-assignment bug (ADVICE r13) fails this pin
    val centroids: Array[Seq[Double]] =
      (0 until 12).map(i => Seq(i.toDouble, 0.0)).toArray
    val model = Similarity.KmeansModel(centroids, spark.emptyDataFrame)
    for (iters <- Seq(1, 2, 5)) {
      val idx = Similarity.hierIndex(model, groups = 3, iters = iters)
      // partition: every cell in exactly one group
      assert(idx.members.flatten.sorted === (0 until 12))
      // consistency: recomputing each member's nearest group against the
      // PUBLISHED groupCents (same |c|²−2·x·c distance, same first-wins
      // tie) must land it in the group that lists it
      val norms = idx.groupCents.map(c => c.map(x => x * x).sum)
      for (gi <- idx.members.indices; cell <- idx.members(gi)) {
        val x = centroids(cell)
        val dists = idx.groupCents.indices.map { g =>
          norms(g) - 2.0 * idx.groupCents(g).zip(x).map(t => t._1 * t._2).sum
        }
        val best = dists.indices.minBy(g => (dists(g), g))
        assert(best === gi,
          s"cell $cell sits in group $gi but is nearest group $best " +
            s"(iters=$iters) — members/groupCents out of sync")
      }
    }
  }
}
