package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Single-pass vector math kernels behind [[CosineSimExpr]] and
  * [[HyperplaneSigExpr]] — plain static methods callable from generated
  * Java, no boxing, no per-element lambda dispatch.
  *
  * Precision contract: these are BIT-EXACT replacements for the
  * higher-order-function formulations they replace
  * ([[graft.operators.Similarity.cosine]] /
  * [[graft.operators.Similarity.lshSignature]]), which oracle queries
  * (q45/q46/q54/q113) already hash against DuckDB:
  *   - `zip_with(a, b, (x, y) => x * y)` multiplies float×float IN
  *     FLOAT (Spark resolves `Multiply(FloatType, FloatType)` without
  *     widening), then `aggregate(_, 0.0, +)` accumulates in double,
  *     left-to-right — so the float/float path squares in float and
  *     sums in double, in ascending element order, exactly as here;
  *   - a float×double pair widens the float per element;
  *   - mismatched lengths zip-pad with null and any null element
  *     poisons the fold → the kernel returns null (cosine) / the
  *     all-bits-clear signature 0 (LSH, where `when(null >= 0)` falls
  *     to the `otherwise(0)` branch per plane).
  */
object VectorKernels {

  /** Cosine similarity of two numeric arrays; null on length mismatch
    * or any null element (the zip_with/aggregate null semantics).
    * `aFloat`/`bFloat` select the element accessor AND the product
    * precision: float×float products and squares stay in float before
    * the double accumulation, matching the HOF plan bit-for-bit. */
  def cosine(
      a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean,
      ansi: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (aFloat && bFloat) {
        val af = a.getFloat(i)
        val bf = b.getFloat(i)
        dot += (af * bf).toDouble
        na += (af * af).toDouble
        nb += (bf * bf).toDouble
      } else {
        val av = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val bv = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += av * bv
        if (aFloat) { val af = a.getFloat(i); na += (af * af).toDouble } else na += av * av
        if (bFloat) { val bf = b.getFloat(i); nb += (bf * bf).toDouble } else nb += bv * bv
      }
      i += 1
    }
    // Spark's Divide semantics on a zero divisor — not IEEE Inf/NaN:
    // ANSI (the Spark 4 default) throws DIVIDE_BY_ZERO, non-ANSI
    // returns NULL. A zero-norm side (incl. empty arrays) must behave
    // exactly like the HOF plan did under the session's mode.
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) {
      if (ansi) throw org.apache.spark.sql.graft.FunctionShim.divideByZeroError()
      null
    } else java.lang.Double.valueOf(dot / denom)
  }

  // ---- CH vector-distance family (dotProduct/L1/L2/Linf/cosineDistance) ----
  //
  // All reductions run in double regardless of element type (CH's
  // Distance family returns Float64; we extend that to dotProduct — a
  // documented deviation from CH's input-typed dotProduct return).
  // Element type tags: 0=float 1=double 2=int 3=long 4=short 5=byte.

  private def elem(a: ArrayData, i: Int, t: Int): Double = (t: @annotation.switch) match {
    case 0 => a.getFloat(i).toDouble
    case 1 => a.getDouble(i)
    case 2 => a.getInt(i).toDouble
    case 3 => a.getLong(i).toDouble
    case 4 => a.getShort(i).toDouble
    case 5 => a.getByte(i).toDouble
  }

  /** Op codes for [[pairReduce]]/[[normReduce]]: 0 = sum of products
    * (dot), 1 = sum of |a-b| (L1), 2 = sum of (a-b)² (L2 squared),
    * 3 = max |a-b| (Linf). For norms b is implicitly 0. */
  final val OpDot = 0
  final val OpL1 = 1
  final val OpL2Sq = 2
  final val OpLinf = 3

  /** Pairwise reduction over two equal-length numeric arrays; null on
    * any null element (CH arrays are non-nullable — a null here is
    * corrupt input, surfaced as SQL NULL not a wrong number); THROWS on
    * a length mismatch, mirroring CH's ARRAY_SIZES_DONT_MATCH (a
    * silent null would hide a schema bug). */
  def pairReduce(a: ArrayData, b: ArrayData, ta: Int, tb: Int, op: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vector function: array sizes don't match: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, ta)
      val y = elem(b, i, tb)
      (op: @annotation.switch) match {
        case 0 => acc += x * y
        case 1 => acc += Math.abs(x - y)
        case 2 => val d = x - y; acc += d * d
        case 3 => val d = Math.abs(x - y); if (d > acc) acc = d
      }
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Single-array reduction (norms): op 1 = Σ|x| (L1), 2 = Σx² (L2
    * squared), 3 = max|x| (Linf). Null on any null element. */
  def normReduce(a: ArrayData, t: Int, op: Int): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elem(a, i, t)
      (op: @annotation.switch) match {
        case 1 => acc += Math.abs(x)
        case 2 => acc += x * x
        case 3 => val d = Math.abs(x); if (d > acc) acc = d
      }
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** CH `cosineDistance` = 1 − cos(a, b), computed fully in double
    * (unlike [[cosine]], which preserves the HOF float-product parity
    * the oracle corpus pinned). Zero-norm input → null — there is no
    * Divide in the plan to inherit ANSI semantics from, and a NULL
    * surfaces the degenerate vector where NaN would propagate
    * silently. Throws on length mismatch like [[pairReduce]]. */
  def cosineDistance(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosineDistance: array sizes don't match: $n vs ${b.numElements()}")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, ta)
      val y = elem(b, i, tb)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(1.0 - dot / denom)
  }

  /** Index of the nearest centroid by squared-L2 — all `k` distance
    * accumulators advance in ONE pass over the vector; argmin uses
    * Spark's nan-safe `<` (NaN sorts above every double) with ties
    * keeping the LOWEST index, exactly like the
    * `when(b.d < a.d, b).otherwise(a)` reduce chain it replaces. A
    * null vector, a length mismatch, or a null element made every
    * distance null in that chain, which collapsed to the first
    * centroid — so the kernel returns 0 for those. */
  def nearestCentroid(vec: ArrayData, m: Array[Array[Double]], isFloat: Boolean): Int = {
    val k = m.length
    val dim = if (k == 0) 0 else m(0).length
    if (vec == null || vec.numElements() != dim) return 0
    val dists = new Array[Double](k)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return 0
      val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      var j = 0
      while (j < k) {
        val d = v - m(j)(i)
        dists(j) += d * d
        j += 1
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < k) {
      val db = dists(j)
      val da = dists(best)
      // nan-safe strict less-than: NaN is larger than everything
      if (!java.lang.Double.isNaN(db) && (java.lang.Double.isNaN(da) || db < da))
        best = j
      j += 1
    }
    best
  }

  /** Deterministic random-hyperplane components, seeded per
    * `(plane, dim)` — the single source of truth shared by the driver
    * (probe-bucket construction) and the codegen'd signature kernel.
    * Mirrors the original `Similarity.hyperplane`. */
  def hyperplane(pIdx: Int, dim: Int): Array[Double] = {
    val rng = new java.util.Random(0x5eed0000L + pIdx)
    Array.fill(dim)(rng.nextGaussian())
  }

  /** `planes` sign bits of hyperplane dot products packed into a long.
    * One pass over the vector, all plane accumulators advanced per
    * element (ascending order — the fold order of the HOF original).
    * A null vector, a length mismatch with `dim`, or any null element
    * yields 0L, the value the `when(d >= 0, bit).otherwise(0)` chain
    * produces when every dot is null. A NaN dot sets its bit: Spark's
    * `>=` orders NaN above every double, unlike Java's. */
  def hyperplaneSig(vec: ArrayData, m: Array[Array[Double]], dim: Int, isFloat: Boolean): Long = {
    if (vec == null || vec.numElements() != dim) return 0L
    val p = m.length
    val dots = new Array[Double](p)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return 0L
      val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      var j = 0
      while (j < p) {
        dots(j) += v * m(j)(i)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < p) {
      val d = dots(j)
      if (java.lang.Double.isNaN(d) || d >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
