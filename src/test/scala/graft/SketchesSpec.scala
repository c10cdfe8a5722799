package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Pins the HLL sketch-algebra family (q157): register validity, the
  * merge-equals-sketch-of-union law, estimate accuracy against exact
  * distinct counts, inclusion–exclusion coherence, and determinism.
  */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val corpus =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  private def exactDistinct(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("n"))
      .as[(String, Long)].collect().toMap

  test("registers are valid: bucket in [0,256), rho in [1,53]") {
    val regs = Sketches.registerUpdates(corpus, col("source"), col("text"))
      .agg(min("bucket"), max("bucket"), min("rho"), max("rho"))
      .as[(Int, Int, Int, Int)].head()
    assert(regs._1 >= 0 && regs._2 < 256)
    assert(regs._3 >= 1 && regs._4 <= 53)
  }

  test("merging two sketch relations equals the sketch of the union") {
    // the lossless-merge law that makes the register relation a storable,
    // incrementally-maintainable artifact
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 === 1)
    val merged = Sketches.tokenSketches(half1)
      .union(Sketches.tokenSketches(half2))
      .groupBy(col("g"), col("bucket")).agg(max(col("m")).as("m"))
      .as[(String, Int, Int)].collect().toSet
    val direct = Sketches.tokenSketches(corpus)
      .as[(String, Int, Int)].collect().toSet
    assert(merged === direct)
  }

  test("per-source estimates sit within the ~6.5% HLL error band (4 sd)") {
    val exact = exactDistinct(corpus)
    val est = Sketches.hllEstimate(Sketches.tokenSketches(corpus))
      .as[(String, Double)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (s, n) =>
      val rel = math.abs(est(s) - n) / n.toDouble
      assert(rel < 0.26, s"source $s: est ${est(s)} vs exact $n (rel $rel)")
    }
  }

  test("algebra coherence: union bounds, symmetry with exact overlap") {
    val exact = exactDistinct(corpus)
    val rows = Sketches.tokenAlgebra(corpus)
      .as[(String, String, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, ea, eb, eu, ei) =>
      assert(a < b)
      // union estimate at least each side's (max-merge can only raise
      // registers, and the estimator is monotone in registers)
      assert(eu >= math.max(ea, eb) - 1e-9, s"($a,$b)")
      assert(math.abs(ea + eb - eu - ei) < 1e-6) // inclusion-exclusion
      // the sf0.001 sources share most of the synthetic vocabulary: the
      // intersection estimate must be positive and union below the sum
      assert(ei > 0, s"($a,$b) est_inter $ei")
    }
    // spot-check one pair against exact set arithmetic
    val (a, b, _, _, eu, ei) = rows.head
    val ta = corpus.filter(col("source") === a)
    val tb = corpus.filter(col("source") === b)
    val exactU = exactDistinct(
      ta.union(tb).withColumn("source", lit("u")))("u")
    val exactI = exact(a) + exact(b) - exactU
    assert(math.abs(eu - exactU) / exactU < 0.26, s"union $eu vs $exactU")
    assert(math.abs(ei - exactI) / math.max(exactI, 1L) < 0.6,
      s"inter $ei vs $exactI") // intersection error compounds 3 estimates
  }

  test("identical groups estimate identically (union = each side)") {
    val dup = corpus.withColumn("source", lit("x"))
      .union(corpus.withColumn("source", lit("y")))
    val rows = Sketches.tokenAlgebra(dup)
      .as[(String, String, Double, Double, Double, Double)].collect()
    assert(rows.length === 1)
    val (_, _, ea, eb, eu, ei) = rows.head
    assert(ea === eb)
    assert(eu === ea) // same registers -> same union estimate
    assert(ei === ea) // inclusion-exclusion collapses
  }

  test("small-range linear counting is near-exact on a tiny vocabulary") {
    val tiny = Seq((1L, "alpha beta gamma", "s")).toDF("doc_id", "text", "source")
    val est = Sketches.hllEstimate(Sketches.tokenSketches(tiny))
      .as[(String, Double)].head()._2
    assert(math.abs(est - 3.0) < 0.2, s"est $est")
  }

  test("streaming register maintenance equals the batch sketch") {
    // two micro-batches through the no-watermark bounded-state
    // aggregation: the final register relation must equal the batch
    // sketch of everything ingested
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val stream = graft.streaming.StreamingCuration.tokenSketchStream(
      input.toDF.toDF("doc_id", "text", "source"))
    val q = stream.writeStream.format("memory").queryName("hll_regs_test")
      .outputMode("complete").start()
    try {
      val rows = corpus.select("doc_id", "text", "source")
        .as[(Long, String, String)].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("hll_regs_test")
        .as[(String, Int, Int)].collect().toSet
      val batch = Sketches.tokenSketches(corpus)
        .as[(String, Int, Int)].collect().toSet
      assert(streamed === batch)
      assert(streamed.size <= 20 * 256) // the structural state bound
    } finally q.stop()
  }

  test("sketches and estimates are deterministic") {
    val a = Sketches.tokenAlgebra(corpus).collect().map(_.toSeq).toSet
    val b = Sketches.tokenAlgebra(corpus).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  // ---- log-binned quantile sketch (q168) ----

  private lazy val li =
    graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("qsketch: merging split sketches equals the whole-corpus sketch") {
    // the count analogue of the HLL max-merge law: groupBy-sum over the
    // union of partial sketch relations == one sketch of all the data
    val price = (col("l_extendedprice") * 100).cast("long")
    val h1 = Sketches.qsketchBuckets(
      li.filter(col("l_linenumber") % 2 === 0), col("l_returnflag"), price)
    val h2 = Sketches.qsketchBuckets(
      li.filter(col("l_linenumber") % 2 === 1), col("l_returnflag"), price)
    val merged = h1.union(h2)
      .groupBy(col("g"), col("blen"), col("sub"))
      .agg(sum(col("cnt")).as("cnt"))
      .as[(String, Int, Long, Long)].collect().toSet
    val direct = Sketches.qsketchBuckets(li, col("l_returnflag"), price)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(merged === direct)
  }

  test("qsketch estimates sit within the 2^-(r+1) relative-error bound") {
    val est = Sketches.priceQuantiles(li)
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (g, qn, qd, e, _) => (g, qn.toDouble / qd) -> e }.toMap
    val exact = li
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 100).cast("long").as("v"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sorted }
    for (((g, q), e) <- est) {
      val vs = exact(g)
      // the bucket holding rank ceil(q*n): its midpoint is within half a
      // bucket width of the true rank value → 1/32 relative at r = 4
      val truth = vs((Math.ceil(q * vs.length) - 1).toInt.max(0))
      assert(math.abs(e - truth) <= truth / 16.0 + 1,
        s"($g, $q): est $e vs exact $truth")
    }
  }

  test("streaming qsketch registers equal the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = li.select(col("l_returnflag"),
        (col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long)].collect()
    val input = MemoryStream[(String, Long)]
    val stream = graft.streaming.StreamingCuration.quantileSketchStream(
      input.toDF.toDF("g", "v"))
    val q = stream.writeStream.format("memory").queryName("qsk_regs_test")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("qsk_regs_test")
        .as[(String, Int, Long, Long)].collect().toSet
      val batch = Sketches.qsketchBuckets(li, col("l_returnflag"),
          (col("l_extendedprice") * 100).cast("long"))
        .as[(String, Int, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.size <= 3 * (63 - Sketches.QSubBits) *
        (1 << (Sketches.QSubBits + 1))) // the structural state bound
    } finally q.stop()
  }

  test("qsketch handles extreme magnitudes without overflow") {
    // Long.MaxValue: blen=63, s=58, sub=31 → rep = 31<<58 + 1<<57 must
    // stay inside a long; quantiles over a set spanning 19 orders of
    // magnitude stay rank-correct
    val vals = Seq(0L, 1L, 2L, 1L << 62, Long.MaxValue - 1, Long.MaxValue)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("i", "v")
    val sk = Sketches.qsketchBuckets(rows, lit("x"), col("v"))
    val est = Sketches.qsketchQuantiles(sk, Seq(1 -> 2, 99 -> 100))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._2, r._3) -> r._4).toMap
    assert(est((1L, 2L)) === 2L) // rank 3 of 6 → the exact small bucket
    val p99 = est((99L, 100L)) // rank 6 → the top bucket's midpoint
    assert(p99 > Long.MaxValue / 2 && p99 > 0, s"overflowed: $p99")
    assert(math.abs(p99 - Long.MaxValue).toDouble / Long.MaxValue <= 1.0 / 16)
  }

  test("qsketch bucket key is monotone with the value; 0 and negatives total") {
    // adjacent values land in (blen, sub) buckets whose lexicographic
    // order never inverts the value order — the property rank extraction
    // rests on; 0 shares no bucket with 1; negatives get exact buckets
    val vals = Seq(-7L, -1L, 0L, 1L, 2L, 3L, 30L, 31L, 32L, 33L,
      1000L, 1023L, 1024L, Long.MaxValue / 2)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("i", "v")
    val got = Sketches.qsketchBuckets(rows, lit("x"), col("v"))
      .as[(String, Int, Long, Long)].collect()
    // rebuild per-value keys (cnt==1 everywhere except none collide here)
    val keyed = vals.map { v =>
      val blen = if (v < 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v).min(63)
      val blenFixed = if (v == 0) 1 else blen
      val s = blenFixed - 1 - Sketches.QSubBits
      val sub = if (v >= 0 && s > 0) v >> s else v
      (blenFixed, sub)
    }
    assert(keyed === keyed.sorted, "bucket keys must be monotone in v")
    assert(got.map(_._4).sum === vals.length.toLong)
    // values with <= r+1 bits keep EXACT buckets (sub == v)
    assert(got.exists { case (_, blen, sub, _) => blen == 1 && sub == 0L })
    assert(got.exists { case (_, blen, sub, _) => blen == 0 && sub == -7L })
  }
}
