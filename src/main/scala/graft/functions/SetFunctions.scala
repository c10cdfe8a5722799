package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-only set intersection kernels (r19 optimization round).
  *
  * Every exact-similarity verify stage spent its CPU in
  * `size(array_intersect(a, b))`: Spark's `ArrayIntersect` builds a
  * hash set of boxed elements, MATERIALIZES the intersection array
  * (`GenericArrayData` + per-element copies) and then `size` throws it
  * away — per candidate pair, on the hottest path of q154/q158/q11/q119
  * (guide §4: prefer expressions that do only the work the query needs).
  * These kernels compute the same count with zero per-element boxing and
  * zero result materialization: the SMALLER side builds a linear-probe
  * hash table (primitive-long open addressing for fingerprints, a
  * UTF8String hash set for shingles), the larger side probes, and a
  * per-slot matched flag counts each distinct common value once.
  *
  * Equivalence contract (`IntersectCountSpec`): for any two arrays,
  * `set_intersect_count(a, b) === size(array_intersect(a, b))` —
  * distinct-value semantics (duplicates count once), a null element
  * counts iff BOTH sides contain one (ArrayIntersect's null handling),
  * and a null ARRAY yields null (size-of-null is null since Spark 3.0).
  */
object SetKernels {

  /** 64-bit finalizer (splitmix64) — spreads fingerprint keys whose low
    * bits collide into the open-addressing table below.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct-common-element count via one open-addressing pass: the
    * SMALLER side builds a primitive-long linear-probe table (no
    * boxing), the larger side probes; a `matched` flag per slot counts
    * each distinct common value once regardless of duplicates on either
    * side. One extra `hasZero` flag stands in for the 0L sentinel.
    */
  def intersectCountLong(a: ArrayData, b: ArrayData,
                         aHasNulls: Boolean, bHasNulls: Boolean): Int = {
    val (s, l, sNulls, lNulls) =
      if (a.numElements() <= b.numElements()) (a, b, aHasNulls, bHasNulls)
      else (b, a, bHasNulls, aHasNulls)
    val ns = s.numElements()
    // long arithmetic + clamp (ADVICE r19): `ns * 2` overflowed Int at
    // ns ≥ 2^30 (an 8-slot table whose insert loop spins forever), and
    // Int doubling itself wraps at 2^31; 2^30 slots is the largest
    // power-of-two table a JVM array can hold anyway (a row with ≥ 2^29
    // set elements OOMs long before probing quality matters)
    var capL = 8L
    while (capL < ns.toLong * 2 && capL < (1L << 30)) capL <<= 1
    val cap = capL.toInt
    val mask = cap - 1
    val table = new Array[Long](cap) // 0 = empty (0L tracked separately)
    val matched = new Array[Boolean](cap)
    var hasZero = false
    var zeroMatched = false
    var sNull = false
    var i = 0
    while (i < ns) {
      if (sNulls && s.isNullAt(i)) sNull = true
      else {
        val x = s.getLong(i)
        if (x == 0L) hasZero = true
        else {
          var h = (mix(x) & mask).toInt
          while (table(h) != 0L && table(h) != x) h = (h + 1) & mask
          table(h) = x
        }
      }
      i += 1
    }
    var count = 0
    var lNull = false
    val nl = l.numElements()
    var j = 0
    while (j < nl) {
      if (lNulls && l.isNullAt(j)) lNull = true
      else {
        val x = l.getLong(j)
        if (x == 0L) {
          if (hasZero && !zeroMatched) { zeroMatched = true; count += 1 }
        } else {
          var h = (mix(x) & mask).toInt
          while (table(h) != 0L && table(h) != x) h = (h + 1) & mask
          if (table(h) == x && !matched(h)) { matched(h) = true; count += 1 }
        }
      }
      j += 1
    }
    if (sNull && lNull) count += 1
    count
  }

  /** String twin: hash set of the smaller side's UTF8Strings,
    * remove-on-hit from the probe side (distinct semantics under
    * duplicates on either side), count only — no intersection array.
    */
  def intersectCountString(a: ArrayData, b: ArrayData): Int = {
    val (s, l) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = s.numElements()
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var sNull = false
    var i = 0
    while (i < ns) {
      if (s.isNullAt(i)) sNull = true
      else { set.add(s.getUTF8String(i)); () }
      i += 1
    }
    var count = 0
    var lNull = false
    val nl = l.numElements()
    var j = 0
    while (j < nl) {
      if (l.isNullAt(j)) lNull = true
      else if (set.remove(l.getUTF8String(j))) count += 1
      j += 1
    }
    if (sNull && lNull) count += 1
    count
  }
}

/** `set_intersect_count(a, b)`: the number of distinct common elements of
  * two arrays — `size(array_intersect(a, b))` without building the
  * intersection (see [[SetKernels]]). Long and string element types (the
  * fingerprint and shingle verify paths); both inputs must share the
  * element type.
  */
case class SetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "set_intersect_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<long> or two array<string> " +
            s"inputs, got ${l.simpleString} / ${r.simpleString}")
    }
  }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType
  private def aHasNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private def bHasNulls: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SetKernels.intersectCountLong(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], aHasNulls, bHasNulls)
    else
      SetKernels.intersectCountString(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (isLong)
        s"""${ev.value} = graft.functions.SetKernels.intersectCountLong(
           |  $a, $b, $aHasNulls, $bHasNulls);""".stripMargin
      else
        s"""${ev.value} = graft.functions.SetKernels.intersectCountString(
           |  $a, $b);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  /** Column builder for [[SetIntersectCount]]. */
  def set_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SetIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
