package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Pins the r20 [[Sketches.tokenAlgebra]] respelling (per-pair union
  * scalars from ONE sketch self-join on bucket) against the
  * replicate-merge form it replaces (every sketch row tagged per pair,
  * unioned, max-aggregated on (sa, sb, bucket), then hllEstimate) —
  * bit-for-bit, including the linear-counting branch and pairs whose
  * sources share few or no buckets.
  */
class TokenAlgebraSpec extends SparkSpecBase {
  import spark.implicits._

  /** The pre-r20 algebra, verbatim. */
  private def referenceAlgebra(docs: DataFrame): DataFrame = {
    val sk = Sketches.tokenSketches(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = Sketches.hllEstimate(sk)
    val sources = sk.select(col("g")).distinct()
    val pairs = sources.select(col("g").as("sa"))
      .join(sources.select(col("g").as("sb")), col("sa") < col("sb"))
    val aRegs = pairs.join(sk, col("g") === col("sa"))
      .select(col("sa"), col("sb"), col("bucket"), col("m"))
    val bRegs = pairs.join(sk, col("g") === col("sb"))
      .select(col("sa"), col("sb"), col("bucket"), col("m"))
    val unionSk = aRegs.union(bRegs)
      .groupBy(col("sa"), col("sb"), col("bucket"))
      .agg(max(col("m")).as("m"))
    val estU = Sketches.hllEstimate(unionSk, Seq("sa", "sb"))
      .withColumnRenamed("est", "est_union")
    estU
      .join(est.select(col("g").as("sa"), col("est").as("est_a")), "sa")
      .join(est.select(col("g").as("sb"), col("est").as("est_b")), "sb")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_inter"))
  }

  private def asSet(df: DataFrame) =
    df.as[(String, String, Double, Double, Double, Double)].collect().toSet

  test("self-join algebra ≡ replicate-merge algebra on a mixed corpus") {
    val rnd = new scala.util.Random(20)
    // 6 sources: two big overlapping vocabularies, two mid, two tiny
    // (1-2 tokens — likely few/no shared buckets, exercising the left
    // join's dup = nc = 0 branch and linear counting)
    val docs = ((0 until 400).map { i =>
      val src = s"src${i % 4}"
      val toks = Seq.fill(8 + rnd.nextInt(20))(
        s"tok${rnd.nextInt(600) + (i % 4) * 150}").mkString(" ")
      (src, toks)
    } ++ Seq(("tinyA", "solo"), ("tinyB", "uno dos")))
      .toDF("source", "text")
    val fast = asSet(Sketches.tokenAlgebra(docs))
    spark.catalog.clearCache()
    val ref = asSet(referenceAlgebra(docs))
    spark.catalog.clearCache()
    assert(fast === ref)
    assert(fast.size === 6 * 5 / 2) // every unordered source pair present
  }

  test("two disjoint one-token sources still pair (no-common-bucket path)") {
    val docs = Seq(("a", "aardvark"), ("b", "bobcat")).toDF("source", "text")
    val fast = asSet(Sketches.tokenAlgebra(docs))
    spark.catalog.clearCache()
    val ref = asSet(referenceAlgebra(docs))
    spark.catalog.clearCache()
    assert(fast === ref)
    assert(fast.size === 1)
  }
}
