package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fixed-width integer histogram aggregate: bucket `min(x / width,
  * nBuckets-1)` (negatives clamp to bucket 0), result = array of bucket
  * counts — the custom-AGGREGATE extension class next to the scalar
  * kernels ([[SimHash64]] etc.): a `TypedImperativeAggregate` with a
  * mutable primitive buffer and an element-wise-add merge, so partial
  * aggregation runs map-side and the shuffle carries one fixed
  * `8·nBuckets`-byte buffer per group instead of the rows. Every count is
  * an integer, so the result is EXACT under any partial-aggregation order
  * — the property that makes it gate-able where a double-summing custom
  * aggregate would need sorted-fold gymnastics (see kmeans notes).
  *
  * The length distribution of a training corpus (token-count histogram
  * per language/source) is the canonical use.
  */
case class HistogramAgg(
    child: Expression,
    nBuckets: Int,
    width: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(nBuckets > 0 && width > 0)

  override def prettyName: String = "histogram_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val b = if (x < 0) 0 else math.min(x / width, (nBuckets - 1).toLong).toInt
      buf(b) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
    copy(child = newChild)
}

object AggFunctions {
  /** Histogram of a long-valued column: `nBuckets` buckets of `width`,
    * last bucket open-ended, negatives clamped into bucket 0.
    */
  def histogram_agg(c: Column, nBuckets: Int, width: Long): Column =
    Bridge.column(
      HistogramAgg(Bridge.expression(c.cast("long")), nBuckets, width)
        .toAggregateExpression())
}
