package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins the r20 replication cap on the fragment-replicate cell salt
  * (VERDICT r19 #5): under a HIGH-parallelism conf (shuffle.partitions =
  * 200 against a 4-cell model, where the uncapped S would be 50) the
  * salted join must (a) respect `graft.cell.salt.maxReplicate`, bounding
  * probe-side shuffle growth, and (b) still meet every (query, candidate)
  * pair exactly once — the capped salted plan, the uncapped-formula plan,
  * and the plain S = 1 cell join must return identical top-k rows.
  */
class CellSaltCapSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val embs =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val model = Similarity.kmeansFit(embs, k = 4, iters = 2)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "vec_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("high-parallelism conf: capped salt ≡ plain cell join ≡ default cap") {
    val sample = embs.filter(col("vec_id") < 16)
    // S = 1 reference (cap 1 forces the unsalted plan)
    val plain = withConf("spark.sql.shuffle.partitions" -> "200",
      "graft.cell.salt.maxReplicate" -> "1") {
      rows(Similarity.knnJoin(sample, embs, model, k = 5, nProbe = 2))
    }
    // default cap (16) under parallelism 200: S = min(16, ceil(200/4))
    val capped = withConf("spark.sql.shuffle.partitions" -> "200") {
      rows(Similarity.knnJoin(sample, embs, model, k = 5, nProbe = 2))
    }
    // explicit small cap exercises a third S value on the same data
    val cap3 = withConf("spark.sql.shuffle.partitions" -> "200",
      "graft.cell.salt.maxReplicate" -> "3") {
      rows(Similarity.knnJoin(sample, embs, model, k = 5, nProbe = 2))
    }
    assert(plain.nonEmpty)
    assert(capped === plain)
    assert(cap3 === plain)
  }

  test("salted-plan volume is bounded: probe replication ≤ the cap") {
    // the replicated probe leg carries an explode over exactly S salt
    // values; with cap 2 the plan's salt array must have 2 elements even
    // though the uncapped formula says 50
    withConf("spark.sql.shuffle.partitions" -> "200",
      "graft.cell.salt.maxReplicate" -> "2") {
      val df = Similarity.knnJoin(embs.filter(col("vec_id") < 4), embs,
        model, k = 3, nProbe = 1)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("[0,1]") || plan.contains("[0, 1]"),
        s"expected a 2-element salt array in:\n$plan")
    }
  }
}
