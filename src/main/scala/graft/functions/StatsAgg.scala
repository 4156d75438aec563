package graft.functions

import java.nio.ByteBuffer
import java.nio.ByteOrder

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Statistical aggregate tail of the CH dialect (r19b) — each one a
  * native `TypedImperativeAggregate` (ObjectHashAggregate, map-side
  * partials, mergeable states; never a UDF). The function namespace is
  * delegated CH surface in the reference
  * (`workflow_query_executor.go:313`). */
object StatsAgg {
  private[functions] def numD(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case l: java.lang.Long => l.toDouble
    case i: java.lang.Integer => i.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"numeric input expected, got ${other.getClass.getSimpleName}")
  }
}

/** `sumKahan(x)` — Neumaier-compensated Float64 sum: the compensation
  * term rides the partial state, so merges stay compensated too. */
case class KahanSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = new Array[Double](2)

  private def add(buf: Array[Double], v: Double): Unit = {
    val t = buf(0) + v
    buf(1) +=
      (if (math.abs(buf(0)) >= math.abs(v)) (buf(0) - t) + v
       else (v - t) + buf(0))
    buf(0) = t
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) add(buf, StatsAgg.numD(v))
    buf
  }
  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    add(buf, other(0))
    buf(1) += other(1)
    buf
  }
  override def eval(buf: Array[Double]): Any = buf(0) + buf(1)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(buf(0)).putDouble(buf(1))
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Array(bb.getDouble(), bb.getDouble())
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "sumKahan"
  override def withNewMutableAggBufferOffset(n: Int): KahanSumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KahanSumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KahanSumAgg =
    copy(child = c)
}

/** `histogram(bins)(x)` — the streaming adaptive histogram (Ben-Haim &
  * Tom-Tov's streaming decision-tree summary, the algorithm family CH
  * uses): at most `2×bins` weighted centroids during accumulation and
  * merge, compressed to `bins` at finalization by repeatedly merging
  * the closest adjacent pair. Output is CH's shape — an array of
  * `(lower, upper, height)` rows where interior bounds are midpoints
  * between adjacent centroid means and the extremes are the true
  * min/max. Approximate and (like CH's) dependent on arrival order by
  * design. */
case class HistogramAgg(
    child: Expression,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HistogramAgg.St]
    with UnaryLike[Expression] {
  import HistogramAgg.St

  require(bins >= 1, s"histogram needs at least one bin, got $bins")
  private def cap = bins * 2

  override def createAggregationBuffer(): St = new St()

  private def insert(st: St, mean: Double, weight: Double): Unit = {
    // binary search by mean, insert, compress past the cap
    var lo = 0
    var hi = st.means.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (st.means(mid) < mean) lo = mid + 1 else hi = mid
    }
    if (lo < st.means.length && st.means(lo) == mean) {
      st.weights(lo) += weight
    } else {
      st.means.insert(lo, mean)
      st.weights.insert(lo, weight)
      if (st.means.length > cap) compress(st, cap)
    }
  }

  private def compress(st: St, to: Int): Unit = {
    while (st.means.length > to) {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < st.means.length - 1) {
        val gap = st.means(i + 1) - st.means(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val w = st.weights(best) + st.weights(best + 1)
      st.means(best) =
        (st.means(best) * st.weights(best) +
          st.means(best + 1) * st.weights(best + 1)) / w
      st.weights(best) = w
      st.means.remove(best + 1)
      st.weights.remove(best + 1)
    }
  }

  override def update(st: St, input: InternalRow): St = {
    val v = child.eval(input)
    if (v != null) {
      val d = StatsAgg.numD(v)
      if (d < st.min) st.min = d
      if (d > st.max) st.max = d
      insert(st, d, 1.0)
    }
    st
  }

  override def merge(st: St, other: St): St = {
    var i = 0
    while (i < other.means.length) {
      insert(st, other.means(i), other.weights(i))
      i += 1
    }
    if (other.min < st.min) st.min = other.min
    if (other.max > st.max) st.max = other.max
    st
  }

  override def eval(st: St): Any = {
    if (st.means.isEmpty) return new GenericArrayData(Array.empty[Any])
    compress(st, bins)
    val n = st.means.length
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val lower =
        if (i == 0) st.min else (st.means(i - 1) + st.means(i)) / 2.0
      val upper =
        if (i == n - 1) st.max else (st.means(i) + st.means(i + 1)) / 2.0
      rows(i) = InternalRow(lower, upper, st.weights(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(st: St): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 + st.means.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(st.means.length).putDouble(st.min).putDouble(st.max)
    var i = 0
    while (i < st.means.length) {
      bb.putDouble(st.means(i)).putDouble(st.weights(i))
      i += 1
    }
    bb.array()
  }
  override def deserialize(b: Array[Byte]): St = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val st = new St()
    val n = bb.getInt()
    st.min = bb.getDouble()
    st.max = bb.getDouble()
    var i = 0
    while (i < n) {
      st.means += bb.getDouble()
      st.weights += bb.getDouble()
      i += 1
    }
    st
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false),
    StructField("height", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "histogram"
  override def withNewMutableAggBufferOffset(n: Int): HistogramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HistogramAgg =
    copy(child = c)
}

object HistogramAgg {
  /** Sorted centroid state: parallel mean/weight buffers + true
    * extremes for the outer bin bounds. */
  final class St {
    val means = ArrayBuffer.empty[Double]
    val weights = ArrayBuffer.empty[Double]
    var min: Double = Double.MaxValue
    var max: Double = Double.MinValue
  }
}

/** `maxIntersections(start, end)` / `maxIntersectionsPosition`: the
  * maximum number of simultaneously-open `[start, end)` intervals in
  * the group, or the leftmost position where that maximum is reached.
  * The state is the raw event list (+1 at start, −1 at end) — the
  * sweep happens once at finalization. Half-open by choice: an
  * interval ending where another starts does NOT intersect it, which
  * also makes the answer deterministic where CH's unstable sort is
  * not. */
case class MaxIntersectionsAgg(
    left: Expression,
    right: Expression,
    position: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]]
    with BinaryLike[Expression] {

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  private def numL(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"maxIntersections takes integer bounds, got ${other.getClass.getSimpleName}")
  }

  override def update(buf: ArrayBuffer[(Long, Int)], input: InternalRow)
      : ArrayBuffer[(Long, Int)] = {
    val s = left.eval(input)
    val e = right.eval(input)
    if (s != null && e != null) {
      buf += ((numL(s), 1))
      buf += ((numL(e), -1))
    }
    buf
  }
  override def merge(buf: ArrayBuffer[(Long, Int)],
      other: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    // ends (−1) before starts at the same coordinate — half-open
    val events = buf.sortBy { case (pos, delta) => (pos, delta) }
    var cur = 0L
    var best = 0L
    var bestPos = 0L
    events.foreach { case (pos, delta) =>
      cur += delta
      if (cur > best) { best = cur; bestPos = pos }
    }
    if (position) bestPos else best
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 9)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.length)
    buf.foreach { case (pos, delta) => bb.putLong(pos).put(delta.toByte) }
    bb.array()
  }
  override def deserialize(b: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val out = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) {
      out += ((bb.getLong(), bb.get().toInt))
      i += 1
    }
    out
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (position) "maxIntersectionsPosition" else "maxIntersections"
  override def withNewMutableAggBufferOffset(n: Int): MaxIntersectionsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MaxIntersectionsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MaxIntersectionsAgg =
    copy(left = l, right = r)
}

/** `exponentialMovingAverage(halflife)(value, time)` — the EMA of an
  * irregular series evaluated at its LATEST time point:
  * Σ vᵢ·2^((tᵢ−T)/h) / Σ 2^((tᵢ−T)/h) with T = max(tᵢ). The state
  * (T, num, den) is mergeable exactly — the smaller-T side rescales
  * by 2^((T_small−T)/h) — so partials compose without ordering
  * assumptions, unlike CH's block-order formulation (same math on
  * sorted input). */
case class ExpMovingAvgAgg(
    left: Expression,
    right: Expression,
    halflife: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with BinaryLike[Expression] {

  require(halflife > 0, s"exponentialMovingAverage needs halflife > 0, got $halflife")

  // buffer: (latestTime, decayedNum, decayedDen, seen)
  override def createAggregationBuffer(): Array[Double] =
    Array(Double.NegativeInfinity, 0.0, 0.0, 0.0)

  private def fold(buf: Array[Double], t: Double, num: Double, den: Double): Unit = {
    if (buf(3) == 0.0) {
      buf(0) = t; buf(1) = num; buf(2) = den; buf(3) = 1.0
    } else if (t <= buf(0)) {
      val w = math.pow(2.0, (t - buf(0)) / halflife)
      buf(1) += num * w
      buf(2) += den * w
    } else {
      val w = math.pow(2.0, (buf(0) - t) / halflife)
      buf(1) = buf(1) * w + num
      buf(2) = buf(2) * w + den
      buf(0) = t
    }
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = left.eval(input)
    val t = right.eval(input)
    if (v != null && t != null)
      fold(buf, StatsAgg.numD(t), StatsAgg.numD(v), 1.0)
    buf
  }
  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other(3) != 0.0) fold(buf, other(0), other(1), other(2))
    buf
  }
  override def eval(buf: Array[Double]): Any =
    if (buf(3) == 0.0 || buf(2) == 0.0) null else buf(1) / buf(2)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Array(bb.getDouble(), bb.getDouble(), bb.getDouble(), bb.getDouble())
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "exponentialMovingAverage"
  override def withNewMutableAggBufferOffset(n: Int): ExpMovingAvgAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ExpMovingAvgAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ExpMovingAvgAgg =
    copy(left = l, right = r)
}

/** `largestTriangleThreeBuckets(n)(x, y)` — LTTB series downsampling
  * (Steinarsson 2013): first and last points kept, the interior
  * bucketed into n−2 ranges, each contributing the point that
  * maximizes the triangle area against the previously kept point and
  * the next bucket's centroid. The state collects the group's (x, y)
  * points and sorts by x at finalization — series-sized groups by
  * contract (a visualization reducer, not a corpus scan). */
case class LttbAgg(
    first: Expression,
    second: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]]
    with BinaryLike[Expression] {

  require(n >= 2, s"largestTriangleThreeBuckets needs n >= 2, got $n")

  override def left: Expression = first
  override def right: Expression = second

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Double)], input: InternalRow)
      : ArrayBuffer[(Double, Double)] = {
    val x = first.eval(input)
    val y = second.eval(input)
    if (x != null && y != null)
      buf += ((StatsAgg.numD(x), StatsAgg.numD(y)))
    buf
  }
  override def merge(buf: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    val pts = buf.sortBy(_._1)
    if (pts.length <= n) {
      return new GenericArrayData(
        pts.map(p => InternalRow(p._1, p._2)).toArray[Any])
    }
    val out = new Array[Any](n)
    out(0) = InternalRow(pts.head._1, pts.head._2)
    val every = (pts.length - 2).toDouble / (n - 2)
    var a = 0 // index of the previously selected point
    var i = 0
    while (i < n - 2) {
      val rangeStart = (i * every).toInt + 1
      val rangeEnd = math.min(((i + 1) * every).toInt + 1, pts.length - 1)
      // next bucket's centroid (the last "bucket" is the final point)
      val nextStart = rangeEnd
      val nextEnd = math.min(((i + 2) * every).toInt + 1, pts.length)
      var cx = 0.0
      var cy = 0.0
      var j = nextStart
      while (j < nextEnd) { cx += pts(j)._1; cy += pts(j)._2; j += 1 }
      val cnt = math.max(1, nextEnd - nextStart)
      cx /= cnt
      cy /= cnt
      val (ax, ay) = pts(a)
      var bestArea = -1.0
      var bestIdx = rangeStart
      j = rangeStart
      while (j < rangeEnd) {
        val area = math.abs(
          (ax - cx) * (pts(j)._2 - ay) - (ax - pts(j)._1) * (cy - ay))
        if (area > bestArea) { bestArea = area; bestIdx = j }
        j += 1
      }
      out(i + 1) = InternalRow(pts(bestIdx)._1, pts(bestIdx)._2)
      a = bestIdx
      i += 1
    }
    out(n - 1) = InternalRow(pts.last._1, pts.last._2)
    new GenericArrayData(out)
  }

  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.length)
    buf.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    bb.array()
  }
  override def deserialize(b: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val m = bb.getInt()
    val out = new ArrayBuffer[(Double, Double)](m)
    var i = 0
    while (i < m) {
      out += ((bb.getDouble(), bb.getDouble()))
      i += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "largestTriangleThreeBuckets"
  override def withNewMutableAggBufferOffset(m: Int): LttbAgg =
    copy(mutableAggBufferOffset = m)
  override def withNewInputAggBufferOffset(m: Int): LttbAgg =
    copy(inputAggBufferOffset = m)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LttbAgg =
    copy(first = l, second = r)
}

/** `studentTTest(value, index)` / `welchTTest(value, index)` — the
  * two-sample location tests over an index-0/1 labeled column, CH's
  * spelling. The state is six moments (n, Σv, Σv² per sample) — tiny
  * and exactly mergeable; the (t, p) tuple finalizes through the
  * incomplete beta ([[graft.functions.BetaKernels]]). `welch` picks
  * the unequal-variance statistic with Welch–Satterthwaite degrees. */
case class TTestAgg(
    left: Expression,
    right: Expression,
    welch: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with BinaryLike[Expression] {

  // buffer: n0, s0, q0, n1, s1, q1
  override def createAggregationBuffer(): Array[Double] = new Array[Double](6)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = left.eval(input)
    val ix = right.eval(input)
    if (v != null && ix != null) {
      val x = StatsAgg.numD(v)
      val g = StatsAgg.numD(ix).toInt
      require(g == 0 || g == 1, s"tTest sample index must be 0 or 1, got $g")
      val o = g * 3
      buf(o) += 1.0
      buf(o + 1) += x
      buf(o + 2) += x * x
    }
    buf
  }
  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 6) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val n0 = buf(0); val n1 = buf(3)
    if (n0 < 2 || n1 < 2) return null
    val m0 = buf(1) / n0
    val m1 = buf(4) / n1
    val v0 = (buf(2) - buf(1) * buf(1) / n0) / (n0 - 1)
    val v1 = (buf(5) - buf(4) * buf(4) / n1) / (n1 - 1)
    val (t, df) =
      if (welch) {
        val se0 = v0 / n0
        val se1 = v1 / n1
        val tt = (m0 - m1) / math.sqrt(se0 + se1)
        val dd = (se0 + se1) * (se0 + se1) /
          (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1))
        (tt, dd)
      } else {
        val sp2 = ((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)
        ((m0 - m1) / math.sqrt(sp2 * (1.0 / n0 + 1.0 / n1)), n0 + n1 - 2)
      }
    InternalRow(t, graft.functions.BetaKernels.studentP(t, df))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(6)(bb.getDouble())
  }

  override def dataType: DataType = StructType(Seq(
    StructField("t_statistic", DoubleType, nullable = false),
    StructField("p_value", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = if (welch) "welchTTest" else "studentTTest"
  override def withNewMutableAggBufferOffset(n: Int): TTestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TTestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TTestAgg =
    copy(left = l, right = r)
}

/** `mannWhitneyUTest(value, index)` — the rank-sum test with the
  * tie-corrected normal approximation (the standard large-sample
  * form; CH's default is the same approximation). The state collects
  * both samples — ranks need the full multiset — so group sizes are
  * series-scale by contract, like the quantileExact family. Returns
  * (u_statistic, p_value). */
case class MannWhitneyAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[(ArrayBuffer[Double], ArrayBuffer[Double])]
    with BinaryLike[Expression] {

  override def createAggregationBuffer(): (ArrayBuffer[Double], ArrayBuffer[Double]) =
    (ArrayBuffer.empty, ArrayBuffer.empty)

  override def update(buf: (ArrayBuffer[Double], ArrayBuffer[Double]),
      input: InternalRow): (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    val v = left.eval(input)
    val ix = right.eval(input)
    if (v != null && ix != null) {
      val g = StatsAgg.numD(ix).toInt
      require(g == 0 || g == 1,
        s"mannWhitneyUTest sample index must be 0 or 1, got $g")
      (if (g == 0) buf._1 else buf._2) += StatsAgg.numD(v)
    }
    buf
  }
  override def merge(buf: (ArrayBuffer[Double], ArrayBuffer[Double]),
      other: (ArrayBuffer[Double], ArrayBuffer[Double]))
      : (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    buf._1 ++= other._1
    buf._2 ++= other._2
    buf
  }

  override def eval(buf: (ArrayBuffer[Double], ArrayBuffer[Double])): Any = {
    val n0 = buf._1.length
    val n1 = buf._2.length
    if (n0 == 0 || n1 == 0) return null
    val all = (buf._1.map((_, 0)) ++ buf._2.map((_, 1))).sortBy(_._1)
    val n = all.length
    // mid-ranks with tie groups; accumulate rank sum of sample 0 and
    // the tie-correction Σ(t³−t)
    var r0 = 0.0
    var tieCorr = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && all(j)._1 == all(i)._1) j += 1
      val ties = j - i
      val midRank = (i + 1 + j).toDouble / 2.0
      var k = i
      while (k < j) {
        if (all(k)._2 == 0) r0 += midRank
        k += 1
      }
      if (ties > 1) tieCorr += ties.toDouble * ties * ties - ties
      i = j
    }
    val u0 = r0 - n0.toDouble * (n0 + 1) / 2.0
    val u = math.min(u0, n0.toDouble * n1 - u0)
    val mu = n0.toDouble * n1 / 2.0
    val sigma = math.sqrt(
      n0.toDouble * n1 / 12.0 *
        ((n + 1).toDouble - tieCorr / (n.toDouble * (n - 1))))
    if (sigma == 0) return InternalRow(u0, 1.0)
    val z = (u - mu) / sigma
    val p = graft.functions.MathKernels.erfc(math.abs(z) / math.sqrt(2.0))
    InternalRow(u0, p)
  }

  override def serialize(buf: (ArrayBuffer[Double], ArrayBuffer[Double])): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + (buf._1.length + buf._2.length) * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf._1.length).putInt(buf._2.length)
    buf._1.foreach(bb.putDouble)
    buf._2.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val c0 = bb.getInt()
    val c1 = bb.getInt()
    (ArrayBuffer.fill(c0)(bb.getDouble()), ArrayBuffer.fill(c1)(bb.getDouble()))
  }

  override def dataType: DataType = StructType(Seq(
    StructField("u_statistic", DoubleType, nullable = false),
    StructField("p_value", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "mannWhitneyUTest"
  override def withNewMutableAggBufferOffset(n: Int): MannWhitneyAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MannWhitneyAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MannWhitneyAgg =
    copy(left = l, right = r)
}

/** `kolmogorovSmirnovTest(value, index)` — the two-sample KS test:
  * D = sup |F0 − F1| over the merged sample, asymptotic p-value via
  * the Kolmogorov distribution Q(λ) = 2 Σ (−1)^{k−1} e^{−2k²λ²}.
  * Collects both samples (the ECDF needs the full multisets), the
  * quantileExact-family contract. Returns (d_statistic, p_value). */
case class KsTestAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[(ArrayBuffer[Double], ArrayBuffer[Double])]
    with BinaryLike[Expression] {

  override def createAggregationBuffer(): (ArrayBuffer[Double], ArrayBuffer[Double]) =
    (ArrayBuffer.empty, ArrayBuffer.empty)

  override def update(buf: (ArrayBuffer[Double], ArrayBuffer[Double]),
      input: InternalRow): (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    val v = left.eval(input)
    val ix = right.eval(input)
    if (v != null && ix != null) {
      val g = StatsAgg.numD(ix).toInt
      require(g == 0 || g == 1,
        s"kolmogorovSmirnovTest sample index must be 0 or 1, got $g")
      (if (g == 0) buf._1 else buf._2) += StatsAgg.numD(v)
    }
    buf
  }
  override def merge(buf: (ArrayBuffer[Double], ArrayBuffer[Double]),
      other: (ArrayBuffer[Double], ArrayBuffer[Double]))
      : (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    buf._1 ++= other._1
    buf._2 ++= other._2
    buf
  }

  override def eval(buf: (ArrayBuffer[Double], ArrayBuffer[Double])): Any = {
    val a = buf._1.sorted
    val b = buf._2.sorted
    val n0 = a.length
    val n1 = b.length
    if (n0 == 0 || n1 == 0) return null
    var i = 0
    var j = 0
    var d = 0.0
    while (i < n0 && j < n1) {
      val x = math.min(a(i), b(j))
      while (i < n0 && a(i) <= x) i += 1
      while (j < n1 && b(j) <= x) j += 1
      d = math.max(d, math.abs(i.toDouble / n0 - j.toDouble / n1))
    }
    val ne = n0.toDouble * n1 / (n0.toDouble + n1)
    val lambda = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    // Q(0) = 1 by definition; the alternating series does not damp at
    // λ ≈ 0 (every term is ±2), so the degenerate case short-circuits
    val p =
      if (lambda < 1e-8) 1.0
      else {
        var acc = 0.0
        var k = 1
        var term = Double.MaxValue
        while (k <= 100 && math.abs(term) > 1e-16) {
          term = 2.0 * (if (k % 2 == 1) 1.0 else -1.0) *
            math.exp(-2.0 * k * k * lambda * lambda)
          acc += term
          k += 1
        }
        acc
      }
    InternalRow(d, math.max(0.0, math.min(1.0, p)))
  }

  override def serialize(buf: (ArrayBuffer[Double], ArrayBuffer[Double])): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + (buf._1.length + buf._2.length) * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf._1.length).putInt(buf._2.length)
    buf._1.foreach(bb.putDouble)
    buf._2.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): (ArrayBuffer[Double], ArrayBuffer[Double]) = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val c0 = bb.getInt()
    val c1 = bb.getInt()
    (ArrayBuffer.fill(c0)(bb.getDouble()), ArrayBuffer.fill(c1)(bb.getDouble()))
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d_statistic", DoubleType, nullable = false),
    StructField("p_value", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "kolmogorovSmirnovTest"
  override def withNewMutableAggBufferOffset(n: Int): KsTestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KsTestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KsTestAgg =
    copy(left = l, right = r)
}

/** Categorical-association family over one contingency-table state:
  * `cramersV`, `cramersVBiasCorrected` (Bergsma 2013), `theilsU`
  * (U(x|y) — how much knowing y reduces x's entropy, asymmetric like
  * CH's), `contingency` (Pearson's contingency coefficient). The
  * state maps canonicalized (x, y) value pairs to counts — mergeable,
  * bounded by the categorical cardinality product. `kind`:
  * 0 = cramersV, 1 = biasCorrected, 2 = theilsU, 3 = contingency. */
case class AssociationAgg(
    left: Expression,
    right: Expression,
    kind: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[(String, String), Long]]
    with BinaryLike[Expression] {
  type Tab = scala.collection.mutable.HashMap[(String, String), Long]

  override def createAggregationBuffer(): Tab =
    scala.collection.mutable.HashMap.empty

  private def s(v: Any): String = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other => String.valueOf(other)
  }

  override def update(buf: Tab, input: InternalRow): Tab = {
    val x = left.eval(input)
    val y = right.eval(input)
    if (x != null && y != null) {
      val k = (s(x), s(y))
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }
  override def merge(buf: Tab, other: Tab): Tab = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def eval(buf: Tab): Any = {
    if (buf.isEmpty) return null
    val n = buf.values.sum.toDouble
    val rows = buf.groupMapReduce(_._1._1)(_._2)(_ + _)
    val cols = buf.groupMapReduce(_._1._2)(_._2)(_ + _)
    val r = rows.size
    val c = cols.size
    kind match {
      case 2 =>
        // Theil's U(x|y): (H(x) − H(x|y)) / H(x)
        def h(counts: Iterable[Long], tot: Double): Double =
          counts.foldLeft(0.0) { (acc, cnt) =>
            if (cnt == 0) acc
            else { val p = cnt / tot; acc - p * math.log(p) }
          }
        val hx = h(rows.values, n)
        if (hx == 0.0) return 1.0
        // H(x|y) = Σ_y p(y) H(x | Y=y)
        val hxy = cols.keys.foldLeft(0.0) { (acc, y) =>
          val ny = cols(y).toDouble
          val inner = rows.keys.foldLeft(0.0) { (a2, x) =>
            val nxy = buf.getOrElse((x, y), 0L)
            if (nxy == 0) a2
            else { val p = nxy / ny; a2 - p * math.log(p) }
          }
          acc + (ny / n) * inner
        }
        (hx - hxy) / hx
      case _ =>
        var chi2 = 0.0
        rows.foreach { case (x, nx) =>
          cols.foreach { case (y, ny) =>
            val expect = nx.toDouble * ny / n
            val got = buf.getOrElse((x, y), 0L).toDouble
            if (expect > 0) chi2 += (got - expect) * (got - expect) / expect
          }
        }
        kind match {
          case 0 =>
            val denom = n * math.max(1, math.min(r, c) - 1)
            math.sqrt(chi2 / denom)
          case 1 =>
            // Bergsma's bias correction
            val phi2 = chi2 / n
            val phi2c = math.max(0.0,
              phi2 - (r - 1.0) * (c - 1.0) / (n - 1.0))
            val rc = r - (r - 1.0) * (r - 1.0) / (n - 1.0)
            val cc = c - (c - 1.0) * (c - 1.0) / (n - 1.0)
            val denom = math.max(1e-300, math.min(rc, cc) - 1.0)
            math.sqrt(phi2c / denom)
          case _ =>
            math.sqrt(chi2 / (n + chi2))
        }
    }
  }

  override def serialize(buf: Tab): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case ((x, y), cnt) =>
      out.writeUTF(x); out.writeUTF(y); out.writeLong(cnt)
    }
    bos.toByteArray
  }
  override def deserialize(b: Array[Byte]): Tab = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val m: Tab = scala.collection.mutable.HashMap.empty
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val x = in.readUTF(); val y = in.readUTF(); val cnt = in.readLong()
      m.update((x, y), cnt)
      i += 1
    }
    m
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = kind match {
    case 0 => "cramersV"
    case 1 => "cramersVBiasCorrected"
    case 2 => "theilsU"
    case _ => "contingency"
  }
  override def withNewMutableAggBufferOffset(n: Int): AssociationAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): AssociationAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AssociationAgg =
    copy(left = l, right = r)
}

/** `deltaSumTimestamp(value, timestamp)` — the sum of positive deltas
  * taken in TIMESTAMP order; the state collects the series (exact
  * regardless of arrival/merge order, where CH's boundary-state merge
  * is approximate — a documented refinement). Series-scale groups by
  * contract. */
case class DeltaSumTimestampAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]]
    with BinaryLike[Expression] {

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Double)], input: InternalRow)
      : ArrayBuffer[(Double, Double)] = {
    val v = left.eval(input)
    val t = right.eval(input)
    if (v != null && t != null)
      buf += ((StatsAgg.numD(t), StatsAgg.numD(v)))
    buf
  }
  override def merge(buf: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    buf ++= other
    buf
  }
  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) return null
    val sorted = buf.sortBy(_._1)
    var acc = 0.0
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i)._2 - sorted(i - 1)._2
      if (d > 0) acc += d
      i += 1
    }
    acc
  }
  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.length)
    buf.foreach { case (t, v) => bb.putDouble(t).putDouble(v) }
    bb.array()
  }
  override def deserialize(b: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val out = new ArrayBuffer[(Double, Double)](n)
    var i = 0
    while (i < n) { out += ((bb.getDouble(), bb.getDouble())); i += 1 }
    out
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deltaSumTimestamp"
  override def withNewMutableAggBufferOffset(n: Int): DeltaSumTimestampAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DeltaSumTimestampAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DeltaSumTimestampAgg =
    copy(left = l, right = r)
}
