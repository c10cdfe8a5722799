package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: decompose an OR-of-equalities join into a union of
  * hash joins.
  *
  * The record-linkage spelling every SQL user writes first —
  *
  * {{{
  *   SELECT ... FROM a JOIN b
  *     ON a.email = b.email OR a.phone = b.phone
  * }}}
  *
  * has no single equi key (ExtractEquiJoinKeys only pulls conjuncts),
  * so Spark plans a BroadcastNestedLoopJoin — |A|·|B| predicate
  * evaluations, the same scale-killer shape the hamming and band
  * rewrites target. Yet each DISJUNCT is individually hash-joinable,
  * and the classic decomposition
  *
  * {{{
  *   (A ⋈_{d₁} B)  ∪ⁱ  (A ⋈_{dᵢ ∧ ¬d₁ ∧ … ∧ ¬dᵢ₋₁} B)
  * }}}
  *
  * preserves multiplicity EXACTLY with no dedup: a qualifying pair
  * matches in precisely the first branch whose disjunct holds.
  * "Not-true" is `IsNull(d) OR NOT d` — a null equality (either key
  * null under `=`) never satisfied the OR, so it must not block a later
  * disjunct either; `<=>` disjuncts are never null and reduce to plain
  * `NOT`. Branch i's plan is a hash join on dᵢ's key pair with the
  * earlier disjuncts' negations (and any other original conjuncts) as
  * residual filters — evaluated only on hash-matched candidates, never
  * per cross pair.
  *
  * Scope guards: inner joins only; no pre-existing conjunct equi key
  * (Spark already hash-joins those, the OR rides as residual); exactly
  * one OR conjunct, all of whose ≥ 2 disjuncts are cross-side
  * deterministic equalities (`=` or `<=>`); at most [[MaxDisjuncts]]
  * branches (each branch re-scans both inputs — ReuseExchange
  * deduplicates the shuffles, but the fan is still linear in branches).
  * Branch joins carry equi keys, so this rule and the hamming/band
  * rules all stand down on the rewritten children.
  *
  * Disable with `spark.graft.orJoinRewrite.enabled=false`.
  */
object DisjunctiveJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  import JoinRewriteSupport._

  private val EnabledKey = "spark.graft.orJoinRewrite.enabled"
  private val MaxDisjuncts = 4

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(EnabledKey, "true") != "true") plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else {
          val (orConjs, others) = conjuncts.partition { c =>
            val ds = splitDisjunctivePredicates(c)
            ds.size >= 2 && ds.forall(isCrossEquality(_, left, right))
          }
          orConjs match {
            case Seq(orConj) =>
              val ds = splitDisjunctivePredicates(orConj)
              if (ds.size <= MaxDisjuncts) rewrite(j, ds, others) else j
            case _ => j
          }
        }
    }

  private def isCrossEquality(e: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean = e match {
    case EqualTo(a, b) => splitsAcross(a, b, left, right)
    case EqualNullSafe(a, b) => splitsAcross(a, b, left, right)
    case _ => false
  }

  /** d is "not true" — false OR null. `<=>` never evaluates null. */
  private def notTrue(d: Expression): Expression = d match {
    case _: EqualNullSafe => Not(d)
    case _ => Or(IsNull(d), Not(d))
  }

  private def rewrite(j: Join, disjuncts: Seq[Expression],
      others: Seq[Expression]): LogicalPlan = {
    val branches = disjuncts.zipWithIndex.map { case (d, i) =>
      val guards = disjuncts.take(i).map(notTrue)
      val cond = (d +: (guards ++ others)).reduce(And)
      Join(j.left, j.right, Inner, Some(cond), j.hint)
    }
    // the first branch reuses the original children verbatim, so the
    // Union's output carries the original attribute ids and parents
    // resolve unchanged (the df.union(df) shape — legal plan reuse)
    Union(branches)
  }
}
