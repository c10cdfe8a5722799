package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rollup rewrite — the fourth optimizer rule, and the
  * one that changes the 100 TB economics of REPORTING: a dashboard
  * aggregation over the full corpus (`GROUP BY source` over 10¹² rows)
  * re-priced as a scan of a pre-aggregated summary relation, when a
  * registered summary can answer it exactly.
  *
  * Matching is deliberately conservative — a rewrite fires only when it
  * is PROVABLY exact:
  *  - the aggregate's child is the registered base relation (same file
  *    roots), optionally under attribute-only Projects (column pruning)
  *    and deterministic Filters over the view's GROUPING columns only —
  *    those commute with the rollup (every row of a view cell shares
  *    the group values, so filtering cells equals filtering rows) and
  *    re-apply over the view; a predicate touching any other column
  *    blocks the rewrite (group-level sums cannot answer it);
  *  - every grouping expression is a bare base column contained in the
  *    view's grouping set (the view's grouping SUBSUMES the query's —
  *    rollup re-aggregates the finer cells);
  *  - every result is `count(literal)` / `sum(col)` / `min(col)` /
  *    `max(col)` over a column the view pre-aggregated, non-DISTINCT and
  *    unfiltered. These are the self-decomposable aggregates: count
  *    rolls up as sum-of-counts (coalesced to 0 so the rewritten output
  *    keeps count's non-null type), sum/min/max as themselves over the
  *    view's partial columns. `avg`/`count(DISTINCT)` are NOT
  *    decomposable from these views and correctly fall through to the
  *    base scan.
  *
  * The rewritten Aggregate preserves the original output `exprId`s (the
  * alias trick below), so parent operators keep resolving; the view plan
  * is re-instanced per use so two consumers in one query never share
  * attribute ids. The rule self-quiesces: a rewritten aggregate's child
  * is the VIEW relation, which is not a registered base.
  *
  * Reference: n/a (reference is a fixed Kafka topology) — this is the
  * Calcite/warehouse MV-matching idea (Goldstein–Larson SIGMOD'01)
  * instantiated for Spark's optimizer.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(g, a, child, _) =>
        tryRewrite(g, a, child).getOrElse(agg)
    }

  /** Base-relation file roots under attribute-only projections and
    * deterministic filters (collected for the commute check below).
    */
  private def stripToBase(
      p: LogicalPlan): Option[(Set[String], Seq[Expression])] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripToBase(c)
    case Filter(cond, c) if cond.deterministic =>
      stripToBase(c).map { case (r, fs) => (r, cond +: fs) }
    case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
      Some((h.location.rootPaths.map(_.toString).toSet, Nil))
    case _ => None
  }

  private def tryRewrite(g: Seq[Expression], a: Seq[NamedExpression],
                         child: LogicalPlan): Option[LogicalPlan] = {
    if (g.isEmpty) return None // global aggregate: empty-input semantics
                               // (count=0 vs null sums) differ — stand down
    val (roots, filters) = stripToBase(child).getOrElse(return None)
    val mv = MvCatalog.forBase(roots).getOrElse(return None)
    // a filter COMMUTES with the rollup iff it touches only the view's
    // grouping columns: every row of a view cell shares those values,
    // so filtering cells equals filtering rows. Anything else (a
    // predicate over an aggregated column) stands down.
    if (!filters.forall(_.references.forall(r => mv.groupCols(r.name))))
      return None
    val gAttrs = g.map {
      case ar: AttributeReference if mv.groupCols(ar.name) => ar
      case _ => return None
    }
    val gIds = gAttrs.map(_.exprId).toSet
    val fresh = mv.freshPlan()
    val mvOutMap = fresh.output.map(o => o.name -> o).toMap
    // a misregistered view (column name not in the view's schema) must
    // stand down at plan time, never throw inside the optimizer — the
    // register-time validation in MvCatalog makes this unreachable for
    // views built through registerParquet, but defs can be handcrafted
    val referenced = Iterator(mv.cntCol) ++ gAttrs.iterator.map(_.name) ++
      filters.iterator.flatMap(_.references.map(_.name)) ++
      mv.sumCols.valuesIterator ++ mv.minCols.valuesIterator ++
      mv.maxCols.valuesIterator
    if (!referenced.forall(mvOutMap.contains)) return None
    val mvOut = mvOutMap

    def rollup(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val rewritten: Option[Expression] = ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) =>
          Some(Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(mvOut(mv.cntCol))),
            Literal(0L))))
        case s @ Sum(ar: AttributeReference, _) =>
          mv.sumCols.get(ar.name).map(c =>
            ae.copy(aggregateFunction = s.copy(child = mvOut(c))))
        case m @ Min(ar: AttributeReference) =>
          mv.minCols.get(ar.name).map(c =>
            ae.copy(aggregateFunction = m.copy(child = mvOut(c))))
        case m @ Max(ar: AttributeReference) =>
          mv.maxCols.get(ar.name).map(c =>
            ae.copy(aggregateFunction = m.copy(child = mvOut(c))))
        case _ => None
      }
      // re-aggregating a partial can WIDEN the result type (Sum over
      // decimal(p,s) yields decimal(p+10,s), so sum-of-view-sums would be
      // decimal(p+20,s)): parents resolved against the original attribute,
      // and past precision 18 the unsafe-row layout itself flips from
      // long-backed to byte-backed. Exactness requires the rewritten
      // expression to keep the original type bit-for-bit — stand down
      // otherwise (all shipped summaries aggregate longs, which Sum maps
      // to long, so this guard only bites general decimal registrations).
      rewritten.filter(_.dataType == ae.dataType)
    }

    val newA: Seq[NamedExpression] = a.map {
      case al @ Alias(ae: AggregateExpression, name) =>
        val ne = rollup(ae).getOrElse(return None)
        Alias(ne, name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = al.explicitMetadata)
      case ar: AttributeReference if gIds.contains(ar.exprId) =>
        Alias(mvOut(ar.name), ar.name)(exprId = ar.exprId)
      // a renaming Project collapsed into the Aggregate (CollapseProject
      // runs before user rules) leaves group columns as Alias(attr, name)
      // — still a bare view group column, so the rewrite stays exact
      case al @ Alias(ar: AttributeReference, name)
          if gIds.contains(ar.exprId) =>
        Alias(mvOut(ar.name), name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata)
      case _ => return None
    }
    val filtered = filters.foldLeft(fresh: LogicalPlan)((c, f) =>
      Filter(f.transform {
        case ar: AttributeReference => mvOut(ar.name)
      }, c))
    Some(Aggregate(gAttrs.map(ar => mvOut(ar.name)), newA, filtered))
  }
}

/** Session-shared registry of materialized summaries [[MvRewrite]] can
  * roll up from. A view is registered with the base's file roots, its
  * grouping columns, and the mapping from base columns to the view's
  * partial-aggregate columns.
  */
object MvCatalog {

  /** @param freshPlan supplier of a NEW-instanced analyzed plan of the
    *                  view relation (fresh attribute ids per use)
    */
  final case class MvDef(
      name: String,
      baseRoots: Set[String],
      groupCols: Set[String],
      cntCol: String,
      sumCols: Map[String, String],
      minCols: Map[String, String],
      maxCols: Map[String, String],
      freshPlan: () => LogicalPlan)

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def isEmpty: Boolean = defs.isEmpty

  def register(d: MvDef): Unit = { defs.put(d.name, d); () }

  def unregister(name: String): Unit = { defs.remove(name); () }

  def clear(): Unit = defs.clear()

  private[plans] def forBase(roots: Set[String]): Option[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.find(_.baseRoots == roots)
  }

  /** Register a parquet-backed summary of a parquet-backed base. The
    * supplier re-instances the view's analyzed plan per use.
    */
  def registerParquet(spark: org.apache.spark.sql.SparkSession,
                      name: String, basePath: String, mvPath: String,
                      groupCols: Set[String], cntCol: String,
                      sumCols: Map[String, String],
                      minCols: Map[String, String] = Map.empty,
                      maxCols: Map[String, String] = Map.empty): Unit = {
    def roots(p: String): Set[String] =
      spark.read.parquet(p).queryExecution.analyzed.collect {
        case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
          h.location.rootPaths.map(_.toString)
      }.flatten.toSet
    val mvPlan = spark.read.parquet(mvPath).queryExecution.analyzed
    // fail at REGISTER time, not plan time: a view column name that does
    // not exist would otherwise surface as every matching query standing
    // down silently (the rule's lookup guard), hiding the misregistration
    val viewCols = mvPlan.output.map(_.name).toSet
    val missing = (Iterator(cntCol) ++ groupCols.iterator ++
      sumCols.valuesIterator ++ minCols.valuesIterator ++
      maxCols.valuesIterator).filterNot(viewCols).toSeq.distinct
    require(missing.isEmpty,
      s"MV '$name': columns ${missing.mkString(", ")} not in view schema " +
        s"[${mvPlan.output.map(_.name).mkString(", ")}] at $mvPath")
    register(MvDef(name, roots(basePath), groupCols, cntCol, sumCols,
      minCols, maxCols,
      () => mvPlan.transformUp {
        case lr: LogicalRelation => lr.newInstance()
      }))
  }
}
