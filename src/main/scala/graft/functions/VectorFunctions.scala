package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays (float or double elements), widened to
  * double and accumulated sequentially — the exact fold the DuckDB oracle
  * computes with `list_sum(list_transform(...))`.
  *
  * This is a custom Catalyst expression rather than
  * `aggregate(zip_with(...))` because Spark's higher-order array functions
  * are interpreted (CodegenFallback) — per-element lambda dispatch made
  * cosine scoring the bottleneck of every similarity query. `doGenCode`
  * emits a tight primitive loop that whole-stage codegen fuses into the
  * surrounding operator, turning a 64-dim dot product into 64 fused
  * multiply-adds with no allocation.
  *
  * Array elements are assumed non-null (enforced by the embeddings schema);
  * mismatched lengths use the shorter prefix, matching `zip_with` nulls
  * never arising in practice.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val yf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.${getter(left)}($i) * (double)$b.${getter(right)}($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared input check for the vector-vs-constant-matrix expressions. */
private[functions] trait VectorMatrixExpression { self: Expression =>
  def child: Expression

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<float|double> input, got ${other.simpleString}")
    }

  protected def getter: String = child.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** All SRP band values of a vector against the constant hyperplane matrix
  * in ONE pass: bit b = (Σ_d planes(b)(d)·x_d) ≥ 0 (the same index-order
  * double fold as [[VectorDot]] against a literal plane), band bd =
  * Σ_{i<bandBits} bit(bd·bandBits+i) << i.
  *
  * This expression exists for JIT survival, not elegance. The obvious
  * Spark-first form — `bits` stacked `vec_dot(emb, typedlit(plane))`
  * columns — is arithmetically identical but generates `bits` separate
  * loop bodies in the stage's consume method; at 64 bits the method blows
  * past HotSpot's ~8 KB bytecode JIT ceiling and the whole corpus-side
  * stage runs at interpreter speed (~3.6 µs/row/dot vs 0.08 µs — measured
  * by ProbeVecDot at 1M×64, a ~45× stage slowdown the sf0.1 bench never
  * shows). One expression = one small nested loop over a primitive
  * `double[][]` reference object = one JIT-compiled method, regardless of
  * signature width.
  */
case class SrpBandValues(child: Expression, planes: Seq[Seq[Double]], bands: Int)
    extends UnaryExpression with VectorMatrixExpression {
  require(bands > 0 && planes.nonEmpty && planes.length % bands == 0,
    s"${planes.length} planes not divisible into $bands bands")
  require(planes.length / bands <= 30,
    s"band width ${planes.length / bands} overflows the int band value")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val bandBits = planes.length / bands
    val out = new Array[Int](bands)
    val isF = elemIsFloat
    var b = 0
    while (b < mat.length) {
      val row = mat(b)
      val n = math.min(dim, row.length)
      var s = 0.0
      var d = 0
      while (d < n) {
        s += row(d) * (if (isF) x.getFloat(d).toDouble else x.getDouble(d))
        d += 1
      }
      if (s >= 0) out(b / bandBits) |= 1 << (b % bandBits)
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("srpPlanes", mat, "double[][]")
      val bandBits = planes.length / bands
      val (dim, out, b, row, n, s, d) = (ctx.freshName("dim"), ctx.freshName("out"),
        ctx.freshName("b"), ctx.freshName("row"), ctx.freshName("n"),
        ctx.freshName("s"), ctx.freshName("d"))
      s"""
         |int $dim = $x.numElements();
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < ${mat.length}; $b++) {
         |  double[] $row = $m[$b];
         |  int $n = java.lang.Math.min($dim, $row.length);
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += $row[$d] * (double)$x.$getter($d);
         |  }
         |  if ($s >= 0) $out[$b / $bandBits] |= 1 << ($b % $bandBits);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` nearest centroid ids for a vector, by the IVF assignment
  * distance `|c_j|² − 2·(x·c_j)` with (dist, j) lexicographic tie-break —
  * element 1 is the argmin cell, so `nProbe = 1` IS the k-means
  * assignment. Same JIT rationale as [[SrpBandValues]]: the stacked
  * `array_min(array(struct(dist_j, j)))` form is identical arithmetic but
  * generates k separate dot loops plus per-row struct-array allocation,
  * and falls off the JIT cliff as k grows (k = 64 measured ~45× slower at
  * 1M rows). Norms are pre-folded driver-side exactly as the literal form
  * folded them (`c.map(x*x).sum`, left-to-right); double comparisons use
  * `Double.compare`, matching Spark's total order for DoubleType sorts.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with VectorMatrixExpression {
  require(nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe $nProbe out of range for ${centroids.length} centroids")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    centroids.map(_.map(x => x * x).sum).toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val isF = elemIsFloat
    val k = mat.length
    val dists = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = mat(j)
      val n = math.min(dim, c.length)
      var s = 0.0
      var d = 0
      while (d < n) {
        s += (if (isF) x.getFloat(d).toDouble else x.getDouble(d)) * c(d)
        d += 1
      }
      dists(j) = norms(j) - 2.0 * s
      j += 1
    }
    val out = new Array[Int](nProbe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var jj = 0
      while (jj < k) {
        if (!used(jj) &&
            (best < 0 || java.lang.Double.compare(dists(jj), dists(best)) < 0)) {
          best = jj
        }
        jj += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("centroids", mat, "double[][]")
      val nm = ctx.addReferenceObj("norms", norms, "double[]")
      val k = mat.length
      val (dim, dists, j, c, n, s, d) = (ctx.freshName("dim"), ctx.freshName("dists"),
        ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("n"),
        ctx.freshName("s"), ctx.freshName("d"))
      val (out, used, p, best, jj) = (ctx.freshName("out"), ctx.freshName("used"),
        ctx.freshName("p"), ctx.freshName("best"), ctx.freshName("jj"))
      s"""
         |int $dim = $x.numElements();
         |double[] $dists = new double[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  double[] $c = $m[$j];
         |  int $n = java.lang.Math.min($dim, $c.length);
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += (double)$x.$getter($d) * $c[$d];
         |  }
         |  $dists[$j] = $nm[$j] - 2.0 * $s;
         |}
         |int[] $out = new int[$nProbe];
         |boolean[] $used = new boolean[$k];
         |for (int $p = 0; $p < $nProbe; $p++) {
         |  int $best = -1;
         |  for (int $jj = 0; $jj < $k; $jj++) {
         |    if (!$used[$jj] && ($best < 0 ||
         |        java.lang.Double.compare($dists[$jj], $dists[$best]) < 0)) {
         |      $best = $jj;
         |    }
         |  }
         |  $used[$best] = true;
         |  $out[$p] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API front door for the vector expressions. */
object VectorFunctions {

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine similarity in double precision; expression-identical to the
    * oracle's `dot/(sqrt(dot)*sqrt(dot))`.
    */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))

  /** The `bands` SRP band values of `vec` against `planes` — one fused,
    * JIT-sized pass (see [[SrpBandValues]]).
    */
  def srp_bands(vec: Column, planes: Seq[Seq[Double]], bands: Int): Column =
    Bridge.column(SrpBandValues(Bridge.expression(vec), planes, bands))

  /** The `nProbe` nearest IVF cells of `vec`, nearest first — element 1 is
    * the k-means assignment (see [[NearestCells]]).
    */
  def nearest_cells(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(vec), centroids, nProbe))
}
