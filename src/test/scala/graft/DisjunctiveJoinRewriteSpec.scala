package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.DisjunctiveJoinRewrite]]: the naive OR-of-equalities
  * join and the union-of-hash-joins decomposition must agree
  * bit-for-bit — including row MULTIPLICITY when BOTH disjuncts hold
  * (exactly-one-branch), duplicate rows, null keys under `=` vs `<=>`,
  * and rider conjuncts — and the rewritten physical plan must carry no
  * nested-loop/cartesian join.
  */
class DisjunctiveJoinRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private val EnabledKey = "spark.graft.orJoinRewrite.enabled"

  private def ab(q: => DataFrame): (Seq[String], Seq[String]) = {
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    spark.conf.set(EnabledKey, "false")
    val naive = try rows(q) finally spark.conf.set(EnabledKey, "true")
    (naive, rows(q))
  }

  // linkage fixture: (email, phone) with overlaps on either key, BOTH
  // keys (the exactly-one-branch case), nulls, and a DUPLICATE left row
  private def left = Seq(
    (1L, Option("a@x"), Option("111")),
    (2L, Option("a@x"), Option("111")), // both keys match r10 — no dup rows
    (3L, Option("b@x"), Option("222")),
    (4L, Option.empty[String], Option("333")),
    (5L, Option.empty[String], Option.empty[String]),
    (6L, Option("c@x"), Option("999")),
    (6L, Option("c@x"), Option("999"))  // duplicate row: multiplicity
  ).toDF("id_a", "em_a", "ph_a")
  private def right = Seq(
    (10L, Option("a@x"), Option("111")),
    (11L, Option("b@y"), Option("222")),
    (12L, Option.empty[String], Option("333")),
    (13L, Option.empty[String], Option.empty[String]),
    (14L, Option("c@x"), Option("000"))
  ).toDF("id_b", "em_b", "ph_b")

  test("parity: overlap pairs once, nulls never match under =, dups kept") {
    def q = left.join(right,
      col("em_a") === col("em_b") || col("ph_a") === col("ph_b"))
      .select("id_a", "id_b")
    val (naive, rewritten) = ab(q)
    assert(naive === rewritten)
    // both-keys-match pairs appear EXACTLY once
    assert(naive.count(_ == "[1,10]") === 1)
    assert(naive.count(_ == "[2,10]") === 1)
    // null = null is not a match (4↔13 phone-null, 5↔13 all-null)
    assert(!naive.contains("[5,13]"))
    assert(naive.count(_ == "[4,12]") === 1) // phone 333 matches
    // the duplicated left row pairs twice
    assert(naive.count(_ == "[6,14]") === 2)
  }

  test("parity: <=> disjunct matches null = null; rider conjunct rides") {
    def q = left.join(right,
      (col("em_a") <=> col("em_b") || col("ph_a") === col("ph_b")) &&
        col("id_b") > col("id_a") + 5)
      .select("id_a", "id_b")
    val (naive, rewritten) = ab(q)
    assert(naive === rewritten)
    // <=> pairs the null emails: 4↔12 (both null em), 4↔13, 5↔12, 5↔13
    assert(naive.count(_ == "[5,13]") === 1)
    assert(naive.count(_ == "[4,13]") === 1)
  }

  test("rewritten plan is a union of hash joins — no nested loop") {
    val q = left.join(right,
      col("em_a") === col("em_b") || col("ph_a") === col("ph_b"))
    val plan = q.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Union"), plan)
    // and with the rule off the naive spelling IS the nested loop —
    // the shape this rule exists to kill
    spark.conf.set(EnabledKey, "false")
    try {
      val naivePlan = left.join(right,
        col("em_a") === col("em_b") || col("ph_a") === col("ph_b"))
        .queryExecution.sparkPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)
    } finally spark.conf.set(EnabledKey, "true")
  }

  test("stand-downs: equi conjunct, outer join, three-way OR fan cap") {
    // an existing conjunct equi key → Spark hash-joins, rule must not touch
    val q1 = left.join(right,
      col("id_a") === col("id_b") &&
        (col("em_a") === col("em_b") || col("ph_a") === col("ph_b")))
    assert(!q1.queryExecution.optimizedPlan.toString.contains("Union"))
    // outer joins: the decomposition's null-padding would double-pad
    val q2 = left.join(right,
      col("em_a") === col("em_b") || col("ph_a") === col("ph_b"), "left")
    assert(!q2.queryExecution.optimizedPlan.toString.contains("Union"))
    val (n2, r2) = ab(left.join(right,
      col("em_a") === col("em_b") || col("ph_a") === col("ph_b"), "left")
      .select("id_a", "id_b"))
    assert(n2 === r2) // and the result is untouched either way
    // a 3-way OR still rewrites (within the fan cap) — parity holds
    val (n3, r3) = ab(left.join(right,
      col("em_a") === col("em_b") || col("ph_a") === col("ph_b") ||
        col("id_a") === col("id_b") - 9).select("id_a", "id_b"))
    assert(n3 === r3)
    assert(n3.nonEmpty)
  }

  test("seeded random corpora: parity across key skew and null density") {
    for (seed <- Seq(5, 83)) {
      val rnd = new scala.util.Random(seed)
      def gen(n: Int, pfx: String) = (1 to n).map { i =>
        def k(card: Int) =
          if (rnd.nextInt(5) == 0) Option.empty[String]
          else Option(pfx + rnd.nextInt(card))
        (i.toLong, k(7), k(11))
      }
      val a = gen(120, "k").toDF("id_a", "em_a", "ph_a")
      val b = gen(120, "k").toDF("id_b", "em_b", "ph_b")
      val (naive, rewritten) = ab(a.join(b,
        col("em_a") === col("em_b") || col("ph_a") === col("ph_b"))
        .select("id_a", "id_b"))
      assert(naive === rewritten, s"seed $seed")
      assert(naive.nonEmpty)
    }
  }
}
