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
