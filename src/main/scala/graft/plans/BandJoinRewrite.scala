package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared eligibility helpers for the join-rewrite rules. */
private[plans] object JoinRewriteSupport {
  /** `e` reads only from `side` (and reads SOMETHING — literals don't
    * anchor a join key) and is safe to duplicate across bins.
    */
  def oneSided(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  /** True when some conjunct is already a usable equi-join key — what
    * ExtractEquiJoinKeys would pull out. Joins that have one already get
    * a hash plan from Spark; the rewrites target the keyless ones.
    */
  def hasEquiKey(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) => splitsAcross(a, b, left, right)
      case EqualNullSafe(a, b) => splitsAcross(a, b, left, right)
      case _ => false
    }

  def splitsAcross(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (oneSided(a, left) && oneSided(b, right)) ||
      (oneSided(a, right) && oneSided(b, left))
}

/** Optimizer rule: rewrite a constant-band (interval/proximity) join
  * into a binned equi-join.
  *
  * The declarative spelling of "pair rows whose numeric keys are within
  * a window of each other" —
  *
  * {{{
  *   SELECT ... FROM a JOIN b ON b.ts > a.ts AND b.ts <= a.ts + 3600
  *   SELECT ... FROM a JOIN b ON abs(b.ts - a.ts) <= 30
  * }}}
  *
  * has no equi key, so Spark plans a BroadcastNestedLoopJoin — |A|·|B|
  * comparisons, the same 100 TB scale-killer shape
  * [[HammingJoinRewrite]] targets in hamming space.
  * [[graft.operators.RangeJoin]] hand-builds the scalable bin-bucketed
  * plan; this rule derives it for anyone who writes the naive predicate.
  *
  * Detection: split the condition into conjuncts; peel constant offsets
  * (`y`, `y + 3`, `y - 7`) off both comparison operands; keep conjuncts
  * that compare ONE left-side base expression `x` against ONE right-side
  * base expression `y` (all conjuncts must agree on the same pair, up to
  * `semanticEquals`). Each becomes a bound on `d = y − x`; strict
  * inequalities tighten by 1 (integral types). A finite band needs at
  * least one lower AND one upper bound: `lo <= d <= hi`.
  *
  * Rewrite, for band width `w = hi − lo`:
  *  - `w == 0`: the band IS an equality — add the conjunct
  *    `x + lo = y` and let Spark plan a plain hash join (no explode).
  *  - `w > 0`: qualifying `y` lie in `[x+lo, x+lo+w]`, which touches
  *    exactly two width-`w` bins: `b0 = floorDiv(x+lo, w)` and `b0+1`.
  *    Explode the left row into those two bins (a constant 2× — never a
  *    data-dependent blowup), compute the right side's single bin
  *    `floorDiv(y, w)` in a projection, and equi-join on the bin. The
  *    right row's bin is unique and the left row's two bins are
  *    distinct, so each qualifying pair matches in EXACTLY one bin —
  *    multiplicity is preserved with no dedup. Every original conjunct
  *    rides along as the exact verification.
  *
  * floorDiv is built from integral ops only (`(a − pmod(a, w)) div w`) —
  * no floating point, so bins are exact at any magnitude; the bin math
  * runs in 64-bit (operands are cast to long). Offset peeling keeps the
  * original conjuncts for verification, so the peel only has to be
  * sound for BIN PLACEMENT, never for the final predicate.
  *
  * Scope guards: inner joins only, both bases one-sided + deterministic,
  * integral types (byte/short/int/long — timestamps arrive here as
  * `unix_micros`/`unix_seconds` longs), constant integer offsets, no
  * pre-existing equi key (Spark already hash-joins those; the band
  * becomes the residual). Ordered AFTER [[HammingJoinRewrite]] in the
  * extension list: a condition carrying both a hamming bound and an id
  * window (the near-dup window demos) gets the hamming buckets, and the
  * second rule then sees an equi key and stands down.
  *
  * Disable with `spark.graft.bandJoinRewrite.enabled=false`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  import JoinRewriteSupport._

  private val EnabledKey = "spark.graft.bandJoinRewrite.enabled"

  /** lo <= y − x <= hi with x from the left child, y from the right. */
  private case class Band(x: Expression, y: Expression, lo: Long, hi: Long)

  /** Opt-in bin width for the POINT-IN-INTERVAL case (variable-width
    * intervals — `p BETWEEN r.lo AND r.hi`). Unset (default) leaves
    * those joins alone: unlike the constant band, the right bin fan-out
    * is `span/width + 1` per row, so the width is a statement about the
    * data only the user can make (the same contract as the Databricks
    * RANGE_JOIN bin hint). A too-small width is still CORRECT — every
    * original conjunct verifies — just explodes more bins.
    */
  private val IntervalWidthKey = "spark.graft.bandJoinRewrite.intervalBinWidth"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(EnabledKey, "true") != "true") plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else findBand(conjuncts, j.left, j.right) match {
          case Some(b) => rewrite(j, conjuncts, b)
          case None =>
            val width = scala.util.Try(
              conf.getConfString(IntervalWidthKey, "").toLong).toOption
            width.filter(_ > 0)
              .flatMap(w => findInterval(conjuncts, j.left, j.right)
                .map(iv => rewriteInterval(j, conjuncts, iv, w)))
              .getOrElse(j)
        }
    }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Peel constant integer offsets: returns (base, offset) with
    * `e = base + offset`.
    */
  private def decompose(e: Expression): (Expression, Long) = e match {
    case Add(a, IntegralLiteral(c), _) => val (b, o) = decompose(a); (b, o + c)
    case Add(IntegralLiteral(c), a, _) => val (b, o) = decompose(a); (b, o + c)
    case Subtract(a, IntegralLiteral(c), _) => val (b, o) = decompose(a); (b, o - c)
    case _ => (e, 0L)
  }

  private object IntegralLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  private def findBand(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Band] = {
    // each comparison contributes a bound on (y − x); abs contributes both
    sealed trait Bound
    case class Lower(x: Expression, y: Expression, v: Long) extends Bound
    case class Upper(x: Expression, y: Expression, v: Long) extends Bound

    def sideOk(x: Expression, y: Expression) =
      integral(x) && integral(y) && oneSided(x, left) && oneSided(y, right)

    // a <= b, as bounds on y − x, trying both orientations of (a, b)
    def le(a: Expression, b: Expression, tighten: Long): Seq[Bound] = {
      val (ba, oa) = decompose(a)
      val (bb, ob) = decompose(b)
      // x + oa <= y + ob  →  y − x >= oa − ob (+1 if strict)
      val asLower =
        if (sideOk(ba, bb)) Seq(Lower(ba, bb, oa - ob + tighten)) else Nil
      // y + oa <= x + ob  →  y − x <= ob − oa (−1 if strict)
      val asUpper =
        if (sideOk(bb, ba)) Seq(Upper(bb, ba, ob - oa - tighten)) else Nil
      asLower ++ asUpper
    }

    // |p − q + od| <= t: both bounds at once (matched before the generic
    // comparison cases, which would otherwise swallow the Abs shape and
    // reject it as two-sided)
    def absBand(d: Expression, t: Long): Seq[Bound] = {
      val (bd, od) = decompose(d)
      bd match {
        case Subtract(p, q, _) =>
          if (sideOk(q, p)) Seq(Lower(q, p, -t - od), Upper(q, p, t - od))
          else if (sideOk(p, q)) Seq(Lower(p, q, od - t), Upper(p, q, od + t))
          else Nil
        case _ => Nil
      }
    }

    val bounds: Seq[Bound] = conjuncts.flatMap {
      case LessThanOrEqual(Abs(d, _), IntegralLiteral(t)) if t >= 0 => absBand(d, t)
      case LessThan(Abs(d, _), IntegralLiteral(t)) if t >= 1 => absBand(d, t - 1)
      case GreaterThanOrEqual(IntegralLiteral(t), Abs(d, _)) if t >= 0 => absBand(d, t)
      case GreaterThan(IntegralLiteral(t), Abs(d, _)) if t >= 1 => absBand(d, t - 1)
      case LessThanOrEqual(a, b) => le(a, b, 0L)
      case LessThan(a, b) => le(a, b, 1L)
      case GreaterThanOrEqual(a, b) => le(b, a, 0L)
      case GreaterThan(a, b) => le(b, a, 1L)
      case _ => Nil
    }

    // bounds anchor to (x, y) base pairs; take the first pair that has
    // BOTH a lower and an upper bound (a finite band)
    def anchor(b: Bound): (Expression, Expression) = b match {
      case Lower(x, y, _) => (x, y)
      case Upper(x, y, _) => (x, y)
    }
    bounds.iterator.map(anchor).flatMap { case (x0, y0) =>
      val mine = bounds.filter { b =>
        val (x, y) = anchor(b)
        x.semanticEquals(x0) && y.semanticEquals(y0)
      }
      val los = mine.collect { case Lower(_, _, v) => v }
      val his = mine.collect { case Upper(_, _, v) => v }
      // subtractExact: a band so wide that (hi − lo) overflows a long
      // would floor-div by a NEGATIVE width and silently drop qualifying
      // pairs — stand down instead (such a band prunes nothing anyway)
      if (los.nonEmpty && his.nonEmpty && los.max <= his.min &&
          scala.util.Try(Math.subtractExact(his.min, los.max)).isSuccess)
        Some(Band(x0, y0, los.max, his.min))
      else None
    }.nextOption()
  }

  /** Point-in-interval: `pt` (one child) bounded below by `lo + loOff`
    * and above by `hi + hiOff` (both bounds from the other child).
    */
  private case class Interval(pt: Expression, ptOnLeft: Boolean,
      lo: Expression, loOff: Long, hi: Expression, hiOff: Long)

  private def findInterval(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Interval] = {
    // pt >= bound + off / pt <= bound + off, with pt and bound on
    // opposite children
    sealed trait C { def pt: Expression; def ptLeft: Boolean }
    case class LowerC(pt: Expression, ptLeft: Boolean,
        bound: Expression, off: Long) extends C
    case class UpperC(pt: Expression, ptLeft: Boolean,
        bound: Expression, off: Long) extends C

    def ok(e: Expression, side: LogicalPlan) =
      integral(e) && oneSided(e, side)

    // a + t <= b, decomposed: baseA + (oa + t) <= baseB + ob
    def le(a: Expression, b: Expression, t: Long): Seq[C] = {
      val (ba, oa) = decompose(a)
      val (bb, ob) = decompose(b)
      if (ok(ba, left) && ok(bb, right))
        Seq(UpperC(ba, ptLeft = true, bb, ob - oa - t),
          LowerC(bb, ptLeft = false, ba, oa + t - ob))
      else if (ok(ba, right) && ok(bb, left))
        Seq(UpperC(ba, ptLeft = false, bb, ob - oa - t),
          LowerC(bb, ptLeft = true, ba, oa + t - ob))
      else Nil
    }

    val cs: Seq[C] = conjuncts.flatMap {
      case LessThanOrEqual(a, b) => le(a, b, 0L)
      case LessThan(a, b) => le(a, b, 1L)
      case GreaterThanOrEqual(a, b) => le(b, a, 0L)
      case GreaterThan(a, b) => le(b, a, 1L)
      case _ => Nil
    }
    cs.iterator.flatMap { c =>
      val mine = cs.filter(o => o.ptLeft == c.ptLeft &&
        o.pt.semanticEquals(c.pt))
      val lower = mine.collectFirst { case l: LowerC => l }
      val upper = mine.collectFirst { case u: UpperC => u }
      (lower, upper) match {
        // same-base bounds are the CONSTANT band (pt between y+a and
        // y+b) — findBand's domain. If findBand declined (unsatisfiable,
        // or a width too wide to bin without overflow), the interval
        // path must decline too: binning it would explode a
        // constant-offset span per row (observed: a leaked width conf +
        // a ±2^62 band drove sequence() to the array-size wall)
        case (Some(l), Some(u)) if !l.bound.semanticEquals(u.bound) =>
          Some(Interval(c.pt, c.ptLeft, l.bound, l.off, u.bound, u.off))
        case _ => None
      }
    }.nextOption()
  }

  /** floor(a / w) from integral ops only: (a − pmod(a, w)) div w. */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val la = Cast(a, LongType)
    IntegralDivide(Subtract(la, Pmod(la, Literal(w))), Literal(w))
  }

  private def rewrite(j: Join, conjuncts: Seq[Expression], b: Band): LogicalPlan = {
    val w = b.hi - b.lo
    if (w == 0) {
      // degenerate band: y = x + lo — a plain equi key
      val key = EqualTo(Add(Cast(b.x, LongType), Literal(b.lo)), Cast(b.y, LongType))
      return Project(j.output,
        j.copy(condition = Some((key +: conjuncts).reduce(And))))
    }
    // Project each side's key expression once per row (original type) and
    // reference the attribute in bin math AND the retained verification —
    // never re-evaluate a possibly-expensive key per candidate pair (the
    // HammingJoinRewrite lesson).
    val xAlias = Alias(b.x, "__graft_band_l_key")()
    val xAttr = xAlias.toAttribute
    val yAlias = Alias(b.y, "__graft_band_r_key")()
    val yAttr = yAlias.toAttribute
    // left: explode into the two bins [x+lo, x+lo+w] can touch
    val b0 = floorDiv(Add(Cast(xAttr, LongType), Literal(b.lo)), w)
    val gen = Explode(CreateArray(Seq(b0, Add(b0, Literal(1L)))))
    val lBin = gen.elementSchema.map(f =>
      AttributeReference(s"__graft_band_l_${f.name}", f.dataType, f.nullable)())
    val lGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = lBin,
      child = Project(j.left.output :+ xAlias, j.left))
    // right: its single bin, as a projected column (stacked projections —
    // a projection cannot reference a sibling alias)
    val rKeyed = Project(j.right.output :+ yAlias, j.right)
    val rBin = Alias(floorDiv(yAttr, w), "__graft_band_r_bin")()
    val rProj = Project(rKeyed.output :+ rBin, rKeyed)
    val verification = conjuncts.map(_.transform {
      case e if e.semanticEquals(b.x) => xAttr
      case e if e.semanticEquals(b.y) => yAttr
    })
    val newCond = (Seq[Expression](EqualTo(lBin.head, rBin.toAttribute)) ++
      verification).reduce(And)
    Project(j.output, Join(lGen, rProj, Inner, Some(newCond), j.hint))
  }

  /** Point-in-interval rewrite at user-declared bin width `w`: the point
    * side is keyed by its single floor-div bin (a projection); the
    * interval side explodes into the `span/w + 1` bins its window
    * covers. The point's bin is unique and the interval's bins are
    * distinct, so each qualifying pair matches in exactly one bin —
    * multiplicity preserved, originals verify. Malformed rows (hi < lo,
    * or a null bound) explode into nothing — they could never match.
    * A row whose span/w exceeds Spark's array cap fails loudly at
    * runtime; the width conf is the user's statement that spans are
    * bounded (a too-small width is correct but explodes more bins).
    */
  private def rewriteInterval(j: Join, conjuncts: Seq[Expression],
      iv: Interval, w: Long): LogicalPlan = {
    // hoist pt/lo/hi into per-row projections at their original types
    // and verify against the attributes (the HammingJoinRewrite lesson:
    // never re-evaluate a key expression per candidate pair)
    val ptAlias = Alias(iv.pt, "__graft_ivl_p_key")()
    val ptAttr = ptAlias.toAttribute
    val loAlias = Alias(iv.lo, "__graft_ivl_i_lo")()
    val hiAlias = Alias(iv.hi, "__graft_ivl_i_hi")()

    val b0 = floorDiv(Add(Cast(loAlias.toAttribute, LongType),
      Literal(iv.loOff)), w)
    val b1 = floorDiv(Add(Cast(hiAlias.toAttribute, LongType),
      Literal(iv.hiOff)), w)
    // Sequence is TimeZoneAwareExpression: resolution requires a zone id
    // even for integral sequences
    val bins = If(LessThanOrEqual(b0, b1),
      new Sequence(b0, b1, Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone)),
      Literal.create(Seq.empty[Long], org.apache.spark.sql.types
        .ArrayType(LongType, containsNull = false)))
    val gen = Explode(bins)
    val genOut = gen.elementSchema.map(f =>
      AttributeReference(s"__graft_ivl_i_${f.name}", f.dataType, f.nullable)())

    val (ptChild, ivChild) = if (iv.ptOnLeft) (j.left, j.right) else (j.right, j.left)
    val ptKeyed = Project(ptChild.output :+ ptAlias, ptChild)
    val ptBin = Alias(floorDiv(ptAttr, w), "__graft_ivl_p_bin")()
    val ptProj = Project(ptKeyed.output :+ ptBin, ptKeyed)
    val ivGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = genOut,
      child = Project(ivChild.output ++ Seq(loAlias, hiAlias), ivChild))
    val verification = conjuncts.map(_.transform {
      case e if e.semanticEquals(iv.pt) => ptAttr
      case e if e.semanticEquals(iv.lo) => loAlias.toAttribute
      case e if e.semanticEquals(iv.hi) => hiAlias.toAttribute
    })
    val (newLeft, newRight) = if (iv.ptOnLeft) (ptProj, ivGen) else (ivGen, ptProj)
    val newCond = (Seq[Expression](EqualTo(ptBin.toAttribute, genOut.head)) ++
      verification).reduce(And)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
