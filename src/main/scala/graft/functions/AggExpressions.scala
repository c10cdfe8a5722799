package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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

/** Exact Σ round_half_away(x·10⁶) as decimal(38,0) — [[AggFunctions.meanQ]]'s
  * micros sum as ONE imperative aggregate over a two-long signed int128
  * accumulator. The declarative spelling (`sum(round(x·1e6).cast(
  * decimal(38,0)))`) pays per-row Decimal128 construction and decimal
  * addition, which `ProbeRound21` priced at **14×** a plain double avg on
  * a scan-bound 100 M-row aggregate; here the per-row work is one double
  * multiply, one `Math.round`, and a three-instruction 128-bit add, with
  * the Decimal materialized once per GROUP at eval.
  *
  * Semantics match the declarative spelling on its documented domain
  * (finite inputs, |x| < 9.2e12 so x·10⁶ fits a long): the quantization
  * is half away from zero on the binary double (`Math.round` for
  * positives, mirrored for negatives) — for ≤6-decimal inputs x·10⁶ is
  * within an ulp of an integer, where this, Spark's `round`, and
  * DuckDB's `round` all agree. NaN and ±Infinity inputs are SKIPPED
  * exactly like the declarative form (round(NaN) → null, cast(±∞ as
  * decimal) → null → sum skips); all-null/all-non-finite groups yield
  * null like `sum`. The domain is ENFORCED, not just documented: a
  * finite |x·10⁶| ≥ 2⁶³ — where `Math.round` would silently saturate at
  * ±Long.MaxValue while the replaced decimal spelling stayed exact and
  * the DuckDB twin (`CAST(round(x*1e6) AS BIGINT)`) errors loudly —
  * raises ArithmeticException instead of accumulating a wrong sum.
  * Overflow headroom of the accumulator itself is int128 (±1.7e38),
  * the same class as the decimal(38,0) it replaces. Buffer: (hi, lo,
  * seen) — 24 bytes per group on the shuffle, partial-merge-safe in
  * batch and streaming state.
  */
case class MicrosSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "micros_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  // signed-int128 add of a long addend: lo is the unsigned low word,
  // v sign-extends into the high word; carry via the standard
  // unsigned-overflow predicate
  private def add128(buf: Array[Long], v: Long): Unit = {
    val lo = buf(1)
    val newLo = lo + v
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    buf(0) += (v >> 63) + carry
    buf(1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      // non-finite skips like the declarative form; finite out-of-domain
      // raises rather than letting Math.round saturate at ±Long.MaxValue
      if (!x.isNaN && !x.isInfinite) {
        val d = x * 1000000.0
        if (d >= MicrosSumAgg.DomainEdge || d <= -MicrosSumAgg.DomainEdge)
          throw new ArithmeticException(
            s"micros_sum domain overflow: |x * 1e6| >= 2^63 for x = $x " +
              "(domain is |x| < 9.2e12); use the declarative " +
              "sum(round(x*1e6).cast(decimal(38,0))) spelling instead")
        add128(buf, if (d >= 0) Math.round(d) else -Math.round(-d))
        buf(2) = 1L
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val lo1 = b1(1); val lo2 = b2(1)
    val newLo = lo1 + lo2
    val carry = ((lo1 & lo2) | ((lo1 | lo2) & ~newLo)) >>> 63
    b1(0) += b2(0) + carry
    b1(1) = newLo
    b1(2) |= b2(2)
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(2) == 0L) null
    else {
      val bi = java.math.BigInteger.valueOf(buf(0)).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(buf(1))))
      Decimal(new java.math.BigDecimal(bi), 38, 0)
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(24)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array(bb.getLong, bb.getLong, bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MicrosSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MicrosSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MicrosSumAgg =
    copy(child = newChild)
}

object MicrosSumAgg {
  /** 2⁶³ as a double — the first magnitude where `Math.round` saturates
    * instead of rounding exactly (the largest representable double BELOW
    * it, 2⁶³−1024, still fits a long).
    */
  val DomainEdge: Double = 9.223372036854776e18
}

/** FNV-1a 64-bit over UTF-8 bytes with a per-row seed — the row hashes of
  * [[CountMinAgg]]/[[CmsQuery]]. Cheap (no allocation), and parity is a
  * non-issue: the oracle never replays the sketch, it checks the sketch's
  * guarantees via exact counts.
  */
private[functions] object Fnv {
  def hash(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Count-Min sketch aggregate over a string column: `depth × width` long
  * counters, row d bumps counter `fnv(key, d) mod width`. Merge is
  * element-wise add, so like [[HistogramAgg]] the sketch is EXACTLY
  * deterministic under any partial-aggregation order (integer buffers) —
  * the custom-SKETCH aggregate class next to Spark's built-in HLL/GK.
  * The estimate (min over rows, [[CmsQuery]]) never underestimates and
  * overestimates by at most εN with probability 1−δ (ε = e/width,
  * δ = e^−depth; Cormode & Muthukrishnan 2005) — the property the q66
  * gate asserts in-band against exact counts. At 100 TB the shuffle
  * carries one fixed 8·depth·width-byte buffer per group instead of the
  * key stream: the heavy-hitters primitive for token/domain/url counts.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(depth > 0 && width > 0)

  override def prettyName: String = "count_min_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      var d = 0
      while (d < depth) {
        val idx = ((Fnv.hash(bytes, d.toLong) % width) + width) % width
        buf(d * width + idx.toInt) += 1
        d += 1
      }
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

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Point query against a [[CountMinAgg]] sketch: min over the depth rows
  * of the counter each hash selects. Scalar expression so the sketch can
  * broadcast (one small array literal/column) and be probed per candidate
  * key without re-aggregating.
  */
case class CmsQuery(sketch: Expression, key: Expression, depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = key
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any, k: Any): Any = {
    val arr = sk.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bytes = k.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = ((Fnv.hash(bytes, d.toLong) % width) + width) % width
      val c = arr.getLong(d * width + idx.toInt)
      if (c < best) best = c
      d += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, key = newRight)
}

/** Bloom filter aggregate over a string-castable column: `numBits` bits
  * (stored as longs), each row sets `numHashes` bit positions derived
  * from [[Fnv]] with seeds 0..k-1. Merge is bitwise OR — idempotent,
  * commutative, associative — so like the other integer-buffer sketches
  * the result is EXACTLY deterministic under any partial-aggregation
  * order or duplication. Membership probes ([[BloomMightContain]]) have
  * NO false negatives ever; false positives at rate ~(1-e^(-kn/m))^k.
  *
  * The 100 TB use is join pre-filtering: build the filter over the
  * small/selective side's keys (one fixed m/8-byte buffer, map-side
  * combined), broadcast it, and drop non-matching rows of the big side AT
  * THE SCAN — before the shuffle the actual join would pay. Spark's own
  * runtime row-level filtering does this under AQE; this expression makes
  * the primitive available explicitly (cross-query, cross-engine, or
  * persisted to reuse).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numBits > 0 && numBits % 64 == 0 && numHashes > 0)

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      var k = 0
      while (k < numHashes) {
        val bit = (((Fnv.hash(bytes, k.toLong) % numBits) + numBits) % numBits).toInt
        buf(bit >> 6) |= (1L << (bit & 63))
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Membership probe against a [[BloomAgg]] filter: true iff ALL
  * `numHashes` bit positions for the key are set. Scalar expression so
  * the (small, fixed-size) filter broadcasts and probes run per row at
  * the scan.
  */
case class BloomMightContain(bloom: Expression, key: Expression,
                             numBits: Int, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def left: Expression = bloom
  override def right: Expression = key
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bf: Any, k: Any): Any = {
    val arr = bf.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bytes = k.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 0
    while (h < numHashes) {
      val bit = (((Fnv.hash(bytes, h.toLong) % numBits) + numBits) % numBits).toInt
      if ((arr.getLong(bit >> 6) & (1L << (bit & 63))) == 0L) return false
      h += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, key = newRight)
}

/** Bounded per-group top-k by (score desc, id asc): the k best
  * (id, payload) entries, best first. The ranking primitive for
  * candidate-scored search (ANN top-k): the row_number-over-window form is
  * semantically identical but its physical plan SORTS the whole candidate
  * stream per map partition before WindowGroupLimit can prune — at probe
  * scale (~10⁸ scored candidates) that sort buffers gigabytes and spills,
  * and wall-clock goes to sorter insertion, not scoring (measured: IVF
  * multi-probe at 1M vectors = 1,433 s, ~95% in sort_addToSorter). This
  * aggregate keeps O(k) state per group, rejects a losing candidate with
  * ONE compare, combines map-side, and ships k-row buffers through the
  * shuffle — candidate volume never hits a sort or the wire.
  *
  * Determinism: (score, id) is a strict total order (ids are unique per
  * group; `Double.compare` totalizes NaN/-0.0 exactly like Spark's
  * DoubleType sort order), so the kept set and its order are independent
  * of partial-aggregation order — the property that lets the queries it
  * serves stay hash-gated. Callers pass the score PRE-ROUNDED (e.g.
  * `round(cos, 6)`) so the tie-domain matches the oracle's ranking
  * exactly; `payload` carries whatever output columns the ranking needs
  * (raw cosine, integer dot, ...) untouched.
  */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "top_k_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", ArrayType(DoubleType, containsNull = false),
      nullable = false))), containsNull = false)

  override def children: Seq[Expression] = Seq(score, id, payload)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (p != null)
        buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], p.toDoubleArray())
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = { b1.absorb(b2); b1 }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](buf.ids(i), new GenericArrayData(
          buf.payloads(i).map(v => v: Any))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val p = if (buf.n == 0) 0 else buf.payloads(0).length
    val bb = ByteBuffer.allocate(8 + buf.n * (16 + 8 * p))
    bb.putInt(buf.n); bb.putInt(p)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i))
      buf.payloads(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt(); val p = bb.getInt()
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      buf.insert(s, id, Array.fill(p)(bb.getDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
}

/** [[TopKByScoreAgg]]'s buffer: ≤ k entries sorted best-first by
  * (score desc, id asc). A losing candidate (the ~100% case once the
  * buffer fills) costs one compare; a winner shifts into place (k is
  * small). Kept as plain parallel arrays for compact serialization.
  *
  * Payload contract: every payload array in a group must share ONE
  * length — serialize writes a single fixed width for the whole buffer.
  * The width is recorded on first insert and `require`d on every later
  * one (including merges), so a ragged caller fails fast with a clear
  * message instead of corrupting shuffle state or overflowing the
  * serialize buffer.
  */
final class TopKBuf(val k: Int) {
  var n = 0
  var width = -1
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val payloads = new Array[Array[Double]](k)

  /** True iff (s1, i1) ranks strictly before (s2, i2). */
  private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(s: Double, id: Long, p: Array[Double]): Unit = {
    if (width < 0) width = p.length
    else require(p.length == width,
      s"top_k_by_score requires a fixed payload width per group: " +
        s"saw ${p.length} after $width")
    if (n == k && !before(s, id, scores(n - 1), ids(n - 1))) return
    var pos = if (n == k) n - 1 else { n += 1; n - 1 }
    while (pos > 0 && before(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
      payloads(pos) = payloads(pos - 1)
      pos -= 1
    }
    scores(pos) = s; ids(pos) = id; payloads(pos) = p
  }

  def absorb(other: TopKBuf): Unit = {
    var i = 0
    while (i < other.n) {
      insert(other.scores(i), other.ids(i), other.payloads(i))
      i += 1
    }
  }
}

object AggFunctions {

  /** Order-insensitive, EXACTLY-rounded 4-decimal mean. `round(avg(x),
    * 4)` is NOT aggregation-order-insensitive: the double sum differs
    * by ulps between Spark's parallel partial-sum order and a
    * sequential oracle fold, and a mean within an ulp of a .00005
    * boundary flips the 4th decimal — found LIVE by the differential
    * fuzzer (seed 3153: avg(c_acctbal) = 6446.38835 → 6446.3884 vs
    * 6446.3883). Here the input is quantized to integer micros per row
    * (identical doubles in both engines → identical micros; exact — no
    * quantization at all — when the input carries ≤ 6 fractional
    * decimals, which covers the 2-dp testdata measures and the
    * pre-rounded quality/probability columns), the micros SUM is an
    * exact integer under ANY order, and the final rounding is EXACT
    * INTEGER arithmetic. Nulls drop from both sum and count, exactly
    * like `avg`.
    *
    * The micros sum runs through decimal(38,0), not long (ADVICE r16):
    * DuckDB promotes a BIGINT sum to HUGEINT, so a long-typed Spark sum
    * would silently WRAP where the oracle keeps going — reachable at
    * real scale (|x|≈1e5 → 1e11 micros/row wraps past ~9e7 rows in one
    * group). decimal(38,0) is exact to 1e38 (headroom halves to ~5e37
    * for the 2·|S| below — still ~15 orders past any physical corpus).
    *
    * Oracle replay (see [[meanQ]] for why round-of-double is banned):
    * {{{
    * CASE WHEN S < 0 THEN -1 ELSE 1 END
    *   * ((2*abs(S) + P*n) // (2*P*n)) / 10000.0
    * -- S = sum(CAST(round(x * 1000000.0) AS BIGINT)), n = count(x),
    * -- P = 100 (= 10^(6-4))
    * }}}
    */
  def mean4(c: Column): Column = meanQ(c, 4)

  /** [[mean4]] generalized to `decimals` ∈ [0, 6] final decimals (same
    * micros quantization, same decimal(38,0) exact sum). `meanQ(_, 1)`
    * replaces the reference topology's order-sensitive
    * `round(avg(power), 1)` sites.
    *
    * The final HALF_UP rounding is computed in EXACT integer
    * arithmetic — `q = sgn(S) · ((2|S| + P·n) intdiv (2·P·n))` with
    * `P = 10^(6-decimals)`, result `q / 10^decimals` — never as
    * `round(double, d)`. Fuzz seed 7249 (round 18) proved the
    * round-of-double spelling has a cross-engine-UNDEFINED edge even
    * over an identical division result: when the true rational mean
    * sits exactly ON a half boundary (S = 40054270000, n = 8 →
    * 5006.78375 exactly), the nearest double is BELOW it, Spark's
    * `round` rounds the double's shortest decimal representation
    * (`BigDecimal.valueOf` → "5006.78375" → HALF_UP → .7838) while
    * DuckDB rounds the binary value (→ .7837). The integer spelling
    * rounds the true rational on both engines — .7838, bit-equal by
    * construction, with `q/10^d` a single exact-integer-by-power-of-ten
    * division both engines perform identically in IEEE double.
    */
  def meanQ(c: Column, decimals: Int): Column = {
    import org.apache.spark.sql.functions.{abs, count, lit, sum, when}
    require(decimals >= 0 && decimals <= 6, s"decimals=$decimals")
    val p = math.pow(10, 6 - decimals).toLong
    // the micros sum runs through [[MicrosSumAgg]] (int128 accumulator)
    // rather than sum(round(c·1e6).cast(decimal(38,0))): identical value
    // on the documented domain, ~5× cheaper per row (ProbeRound21)
    val s = Bridge.column(
      MicrosSumAgg(Bridge.expression(c.cast("double")))
        .toAggregateExpression())
    // count = 0 ⇒ the sum is already null and the result null-propagates;
    // the denominator clamps to 1 so ANSI integral division never sees a
    // zero divisor on the empty/all-null group
    val n = count(c)
    val den = lit(p).cast("decimal(38,0)") *
      when(n > 0, n).otherwise(lit(1L))
    val qAbs = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(abs(s) * 2 + den),
        Bridge.expression(den * 2)))
    (when(s < 0, lit(-1L)).otherwise(lit(1L)) * qAbs).cast("double") /
      lit(math.pow(10, decimals))
  }

  /** The DuckDB replay of [[meanQ]] — kept NEXT TO the Spark expression
    * because the two are a serialization pair (an edit to one without
    * the other is a silent gate divergence). Same exact-integer HALF_UP
    * arithmetic: DuckDB's `sum(BIGINT)` is HUGEINT (no wrap), `//` is
    * floor division over the non-negative operands, and the one final
    * `/ 10^d.0` is the identical exact-integer-by-power-of-ten IEEE
    * division Spark performs.
    */
  def meanQSql(x: String, decimals: Int): String = {
    require(decimals >= 0 && decimals <= 6, s"decimals=$decimals")
    val p = math.pow(10, 6 - decimals).toLong
    val tenD = math.pow(10, decimals).toLong
    val s = s"sum(CAST(round(($x) * 1000000.0) AS BIGINT))"
    s"(CASE WHEN $s < 0 THEN -1 ELSE 1 END * " +
      s"((2 * abs($s) + $p * count($x)) // (2 * $p * count($x))) " +
      s"/ $tenD.0)"
  }

  /** [[meanQSql]] at 4 decimals — the [[mean4]] twin. */
  def mean4Sql(x: String): String = meanQSql(x, 4)

  /** Exactly-rounded ratio of two INTEGER-VALUED expressions —
    * `round(a/b, d)` without the round-of-double step. The fuzz-seed-
    * 7249 mechanism (see [[meanQ]]) applies to every count ratio too:
    * a/b lands exactly ON a d-decimal half boundary whenever the
    * lowest-terms denominator divides 2·10^d into an odd cofactor
    * (b = 160, 800, 4000, 20000 at d = 4 — cohort/funnel-sized numbers,
    * not exotica), and there Spark's shortest-repr round and DuckDB's
    * binary-value round part ways. Here the HALF_UP (away-from-zero)
    * rounding is exact integer arithmetic:
    * `q = sgn(a)·sgn(b) · ((2·10^d·|a| + |b|) intdiv (2·|b|))`, result
    * `q / 10^d`; null when `b = 0` (the `NULLIF` discipline) or either
    * input is null. Operands run through decimal(38,0) for sums-of-
    * counts headroom; the divisor clamps to 1 under the b = 0 branch so
    * ANSI integral division never sees a zero.
    */
  def ratioQ(a: Column, b: Column, decimals: Int): Column = {
    import org.apache.spark.sql.functions.{abs, lit, when}
    require(decimals >= 0 && decimals <= 6, s"decimals=$decimals")
    val tenD = math.pow(10, decimals).toLong
    val aD = a.cast("decimal(38,0)")
    val bD = b.cast("decimal(38,0)")
    val sign = when((aD < 0) =!= (bD < 0), lit(-1L)).otherwise(lit(1L))
    val q = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(abs(aD) * lit(2L * tenD) + abs(bD)),
        Bridge.expression(
          when(bD === 0, lit(1L).cast("decimal(38,0)"))
            .otherwise(abs(bD)) * 2)))
    when(bD === 0, lit(null).cast("double"))
      .otherwise((sign * q).cast("double") / lit(tenD.toDouble))
  }

  /** [[ratioQ]] restricted to NON-NEGATIVE operands (count/size
    * ratios): references `a` exactly ONCE — the sign/abs machinery that
    * makes the general form reference it three times would re-evaluate
    * an expensive operand (an array_intersect, a kernel composite)
    * per reference, which benched q113 at 2.4× and q104 at 2.2×. Use
    * this whenever `a` is an unmaterialized expression and both
    * operands are provably ≥ 0; same null/zero-denominator rules.
    */
  def ratioQNN(a: Column, b: Column, decimals: Int): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    require(decimals >= 0 && decimals <= 6, s"decimals=$decimals")
    val tenD = math.pow(10, decimals).toLong
    val aD = a.cast("decimal(38,0)")
    val bD = b.cast("decimal(38,0)")
    val q = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(aD * lit(2L * tenD) + bD),
        Bridge.expression(
          when(bD === 0, lit(1L).cast("decimal(38,0)"))
            .otherwise(bD) * 2)))
    when(bD === 0, lit(null).cast("double"))
      .otherwise(q.cast("double") / lit(tenD.toDouble))
  }

  /** Raw integral division as a Column — for call sites that hand-tune
    * operand reference counts around expensive child expressions (see
    * `Dedup.jaccardQ`) instead of going through [[ratioQ]]'s generic
    * spelling.
    */
  def intDiv(a: Column, b: Column): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))

  /** The DuckDB replay of [[ratioQ]] — serialization pair, kept
    * adjacent. DuckDB's `// 0` is NULL (verified v1.0), so the b = 0
    * case needs no guard; `sum(BIGINT)` operands arrive as HUGEINT.
    */
  def ratioQSql(a: String, b: String, decimals: Int): String = {
    require(decimals >= 0 && decimals <= 6, s"decimals=$decimals")
    val tenD = math.pow(10, decimals).toLong
    s"(CASE WHEN (($a) < 0) != (($b) < 0) THEN -1 ELSE 1 END * " +
      s"((2 * $tenD * abs($a) + abs($b)) // (2 * abs($b))) / $tenD.0)"
  }

  /** Histogram of a long-valued column: `nBuckets` buckets of `width`,
    * last bucket open-ended, negatives clamped into bucket 0.
    */
  def histogram_agg(c: Column, nBuckets: Int, width: Long): Column =
    Bridge.column(
      HistogramAgg(Bridge.expression(c.cast("long")), nBuckets, width)
        .toAggregateExpression())

  /** Count-Min sketch of a string column (depth × width counters). */
  def count_min_agg(c: Column, depth: Int, width: Int): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(c.cast("string")), depth, width)
        .toAggregateExpression())

  /** Point estimate from a [[count_min_agg]] sketch. */
  def cms_query(sketch: Column, key: Column, depth: Int, width: Int): Column =
    Bridge.column(CmsQuery(Bridge.expression(sketch),
      Bridge.expression(key.cast("string")), depth, width))

  /** Bloom filter of a string-castable key column (`numBits` bits,
    * `numHashes` probes per key).
    */
  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(c.cast("string")), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a [[bloom_agg]] filter (no false
    * negatives; false positives at the sized rate).
    */
  def bloom_might_contain(bloom: Column, key: Column,
                          numBits: Int, numHashes: Int): Column =
    Bridge.column(BloomMightContain(Bridge.expression(bloom),
      Bridge.expression(key.cast("string")), numBits, numHashes))

  /** The k best (id, payload) entries per group by (score desc, id asc),
    * best first — bounded-state ranking for candidate-scored search (see
    * [[TopKByScoreAgg]]). Pass the score pre-rounded to the oracle's
    * tie domain. The payload must be a FIXED-WIDTH array<double> within
    * each group (the serialized buffer carries one width for all
    * entries); ragged payloads fail fast with IllegalArgumentException.
    * Rows whose score, id, or payload is null are ignored, matching the
    * built-in aggregates' null semantics.
    */
  def top_k_by_score(score: Column, id: Column, payload: Column, k: Int): Column =
    Bridge.column(TopKByScoreAgg(Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), Bridge.expression(payload), k)
      .toAggregateExpression())
}
