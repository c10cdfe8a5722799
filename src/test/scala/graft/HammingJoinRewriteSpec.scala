package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.HammingJoinRewrite]]: the naive hamming-threshold join
  * and the pigeonhole rewrite must agree bit-for-bit — including row
  * MULTIPLICITY (duplicate hashes on both sides), null fingerprints, and
  * rider conjuncts — and the rewritten physical plan must carry no
  * nested-loop/cartesian join.
  */
class HammingJoinRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private val EnabledKey = "spark.graft.hammingJoinRewrite.enabled"

  /** Run `q` with the rule off, then on; return (naive, rewritten). */
  private def ab(q: => DataFrame): (Seq[String], Seq[String]) = {
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    spark.conf.set(EnabledKey, "false")
    val naive = try rows(q) finally spark.conf.set(EnabledKey, "true")
    (naive, rows(q))
  }

  // hand-picked 64-bit fixture: exact dup (1,2), hamming-1 (1,3),
  // hamming-3 via three flipped bits incl. the SIGN bit (1,4) — the
  // top block must use a logical shift — hamming-4 miss (1,5), a
  // DUPLICATE hash (6 repeats 2's hash: multiplicity), and a null.
  private val h1 = 0x0123456789abcdefL
  private def left64 = Seq(
    (1L, h1), (2L, h1), (3L, h1 ^ 1L),
    (4L, h1 ^ (1L << 63) ^ (1L << 31) ^ 1L),
    (5L, h1 ^ 0xf0L), (6L, h1)
  ).toDF("id_a", "h_a")
  private def right64 = left64.select(col("id_a").as("id_b"), col("h_a").as("h_b"))
    .union(Seq((7L, Option.empty[Long])).toDF("id_b", "h_b"))

  test("64-bit parity: multiplicity, sign-bit block, nulls, rider conjuncts") {
    def q = left64.join(right64,
      col("id_b") > col("id_a") &&
        bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3)
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
    val (naive, rewritten) = ab(q)
    assert(naive === rewritten)
    assert(naive.nonEmpty)
    // the duplicate-hash rows must pair with everything their twin pairs
    // with: (2,6) exact, (1,6)/(1,2) exact, (3,6) hamming-1 ...
    assert(naive.count(_.contains("[2,6,0]")) === 1)
    assert(naive.count(_.contains("[1,4,3]")) === 1) // sign-bit block pair
    assert(!naive.exists(_.contains("7")))           // null never matches
  }

  test("t=0 degenerates to an equi-join on the whole fingerprint") {
    def q = left64.join(right64,
      bit_count(col("h_a").bitwiseXOR(col("h_b"))) === 0 &&
        col("id_b") =!= col("id_a"))
      .select("id_a", "id_b")
    val (naive, rewritten) = ab(q)
    assert(naive === rewritten)
    assert(naive.size === 6) // ids {1,2,6} share h1: 3 ordered pairs ×2
  }

  test("32-bit int fingerprints rewrite with 32-bit blocks") {
    // Spark's bit_count SIGN-EXTENDS ints to 64 bits, so a sign-bit flip
    // costs 33, never <= small t — (1,3) differ only in bit 31 and must
    // NOT pair. The rewrite stays sound: bit_count(signext(xor)) <= t
    // implies the low-32 hamming <= t, so the 32-bit pigeonhole still
    // covers every qualifying pair and the retained original conjunct
    // verifies with Spark's own semantics.
    val a = Seq((1L, 0x80000001), (2L, 0x80000003), (3L, 0x00000001))
      .toDF("id_a", "h_a")
    val b = a.select(col("id_a").as("id_b"), col("h_a").as("h_b"))
    def q = a.join(b,
      col("id_b") > col("id_a") &&
        bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 1)
      .select("id_a", "id_b")
    val (naive, rewritten) = ab(q)
    assert(naive === rewritten)
    assert(naive === Seq("[1,2]")) // (2,3): bits 1 and 31 → 34; (1,3): 33
  }

  test("rewritten plan is equi-join shaped; naive plan is the nested loop") {
    def q = left64.join(right64,
      col("id_b") > col("id_a") &&
        bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3)
    spark.conf.set(EnabledKey, "false")
    val naivePlan = try q.queryExecution.executedPlan.toString
      finally spark.conf.set(EnabledKey, "true")
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    assert(plan.contains("Generate")) // the per-side block explode
  }

  test("a join that already has an equi key is left alone") {
    val df = left64.withColumn("k", col("id_a") % 2)
    val other = df.select(col("id_a").as("id_b"), col("h_a").as("h_b"),
      col("k").as("k2"))
    val q = df.join(other,
      col("k") === col("k2") && col("id_b") > col("id_a") &&
        bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Generate"))
  }

  test("outer joins are not rewritten (explode would break their padding)") {
    val q = left64.join(right64,
      bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3, "left_outer")
    assert(!q.queryExecution.optimizedPlan.toString.contains("Generate"))
  }

  test("SQL spelling: bit_count(a.h ^ b.h) <= t rewrites and agrees") {
    left64.createOrReplaceTempView("hjl")
    right64.createOrReplaceTempView("hjr")
    def q = spark.sql(
      """SELECT id_a, id_b, bit_count(h_a ^ h_b) AS hamming
        |FROM hjl JOIN hjr ON id_b > id_a AND bit_count(h_a ^ h_b) <= 3
        |""".stripMargin)
    val (naive, rewritten) = ab(q)
    assert(naive === rewritten)
    assert(q.queryExecution.executedPlan.toString.contains("Generate"))
  }

  test("rewritten join equals the hand-built bucketed operator on documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val s = graft.operators.Dedup.simhash(docs)
    val a = s.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = s.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val viaRule = a.join(b,
      col("id_b") > col("id_a") &&
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .collect().map(_.toString).sorted
    val viaOperator = graft.operators.Dedup
      .simhashBucketedNearDups(docs, maxHamming = 3)
      .collect().map(_.toString).sorted
    assert(viaRule === viaOperator)
  }

  test("fingerprint exprs are hoisted below the explode, not re-evaluated per pair") {
    // the join condition (evaluated per candidate pair) must reference
    // only the projected hash attributes — an expensive fingerprint
    // (here sim_hash64 over tokenized text) re-evaluated per pair turned
    // a duplicate-heavy fuzz seed from seconds into hours
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = graft.operators.Dedup.simhash(docs)
    val a = sh.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    val q = a.join(b, col("id_b") > col("id_a") &&
      bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
    val joinConds = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
    }
    assert(joinConds.nonEmpty)
    assert(!joinConds.exists(_.contains("sim_hash64")),
      "fingerprint function leaked into a per-pair join condition")
  }

  test("semi/anti joins rewrite via value-set factoring: parity + nulls + dups") {
    // left carries DUPLICATE rows (multiplicity must survive 1:1), a
    // null fingerprint (anti KEEPS it, semi drops it), and hashes at
    // hamming 0/1/4 of the right side
    val l = Seq((1L, Option(h1)), (2L, Option(h1)), (3L, Option(h1 ^ 1L)),
      (4L, Option(h1 ^ 0xf0L)), (5L, Option.empty[Long]), (4L, Option(h1 ^ 0xf0L)))
      .toDF("id_a", "h_a")
    val r = Seq(10L -> h1).toDF("id_b", "h_b")
    for (flavor <- Seq("left_semi", "left_anti")) {
      def q = l.join(r,
        bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3, flavor)
      val (naive, rewritten) = ab(q)
      assert(naive === rewritten, flavor)
      if (flavor == "left_semi")
        assert(naive === Seq("[1," + h1 + "]", "[2," + h1 + "]",
          "[3," + (h1 ^ 1L) + "]").map(_.toString).sorted)
      else {
        // hamming-4 rows kept TWICE (duplicate left rows), null kept
        assert(naive.count(_.startsWith("[4,")) === 2, naive.mkString(","))
        assert(naive.exists(_.startsWith("[5,")), naive.mkString(","))
        assert(naive.size === 3)
      }
      // plan: equi semi/anti against the matched value set, no NLJ
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), flavor)
      assert(plan.contains("Generate"), flavor)
    }
  }

  test("semi/anti stand down when the verdict depends on more than the hash") {
    val l = Seq((1L, 5L, h1)).toDF("id_a", "v_a", "h_a")
    val r = Seq((10L, 7L, h1)).toDF("id_b", "v_b", "h_b")
    // the extra conjunct references a LEFT column other than the hash —
    // value-set factoring would be unsound, so the rule must not fire
    val q = l.join(r,
      bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3 &&
        col("v_a") < col("v_b"), "left_semi")
    assert(!q.queryExecution.optimizedPlan.toString.contains("Generate"))
    // right-only extras are fine: they filter the benchmark side
    val q2 = l.join(r,
      bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3 &&
        col("v_b") > 0L, "left_anti")
    assert(q2.queryExecution.optimizedPlan.toString.contains("Generate"))
    val (naive, rewritten) = ab(q2.select("id_a"))
    assert(naive === rewritten)
  }

  test("exhaustive 10-bit sweep: every pair at every distance, t=1..5") {
    // 64-bit hashes whose low 10 bits enumerate 0..1023 over a fixed
    // high pattern: all pairwise hamming distances 0..10 appear; parity
    // must hold at several thresholds (odd/even block widths both hit)
    val rows = (0 until 1024).map(i => (i.toLong, 0x5a5a5a5a5a5a5400L | i.toLong))
    val a = rows.toDF("id_a", "h_a")
    val b = rows.toDF("id_b", "h_b")
    for (t <- Seq(1, 2, 5)) {
      def q = a.join(b,
        col("id_b") > col("id_a") &&
          bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= t)
        .agg(count(lit(1)).as("n"),
          sum(col("id_a") * 1024 + col("id_b")).as("chk"))
      val (naive, rewritten) = ab(q)
      assert(naive === rewritten, s"t=$t")
    }
  }
}
