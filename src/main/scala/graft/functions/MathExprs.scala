package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Special-function kernels the JDK lacks (r19b): Lanczos log-gamma,
  * gamma, and erf/erfc via the regularized incomplete gamma (series
  * for small arguments, continued fraction for large — the standard
  * public formulations, ~1e-14 relative accuracy, pinned against
  * known values in the spec). */
object MathKernels {

  // Lanczos g=7, n=9 coefficients (public domain)
  private val LanczosG = 7.0
  private val LanczosC = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def lgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
    } else {
      val xx = x - 1.0
      var a = LanczosC(0)
      val t = xx + LanczosG + 0.5
      var i = 1
      while (i < LanczosC.length) {
        a += LanczosC(i) / (xx + i)
        i += 1
      }
      0.5 * math.log(2.0 * math.Pi) + (xx + 0.5) * math.log(t) - t +
        math.log(a)
    }
  }

  def tgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x < 0.5)
      math.Pi / (math.sin(math.Pi * x) * math.exp(lgamma(1.0 - x)))
    else math.exp(lgamma(x))
  }

  /** Regularized lower incomplete gamma P(a, x). */
  private def gammp(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammp domain: a=$a x=$x")
    if (x == 0) 0.0
    else if (x < a + 1.0) {
      // series representation
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var n = 0
      while (n < 200 && math.abs(del) >= math.abs(sum) * 1e-16) {
        ap += 1.0
        del *= x / ap
        sum += del
        n += 1
      }
      sum * math.exp(-x + a * math.log(x) - lgamma(a))
    } else {
      // continued fraction for Q, then P = 1 − Q (Lentz's method)
      val fpmin = 1e-300
      var b = x + 1.0 - a
      var c = 1.0 / fpmin
      var d = 1.0 / b
      var h = d
      var i = 1
      var done = false
      while (i <= 200 && !done) {
        val an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if (math.abs(d) < fpmin) d = fpmin
        c = b + an / c
        if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < 1e-16) done = true
        i += 1
      }
      1.0 - math.exp(-x + a * math.log(x) - lgamma(a)) * h
    }
  }

  def erf(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x >= 0) gammp(0.5, x * x)
    else -gammp(0.5, x * x)

  def erfc(x: Double): Double = 1.0 - erf(x)

  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a)
    var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0
    val g = gcd(a, b)
    math.abs(a / g * b)
  }
}

/** Dialect dispatcher. `kind`: 0 = erf, 1 = erfc, 2 = lgamma,
  * 3 = tgamma (unary double); 4 = gcd, 5 = lcm (binary long);
  * 6 = byteSwap (width follows the input's integer type, CH's rule). */
case class MathFnExpr(children: Seq[Expression], kind: Int)
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = kind match {
    case 4 | 5 | 6 => LongType
    case _ => DoubleType
  }
  override def prettyName: String = kind match {
    case 0 => "erf"
    case 1 => "erfc"
    case 2 => "lgamma"
    case 3 => "tgamma"
    case 4 => "gcd"
    case 5 => "lcm"
    case _ => "byteSwap"
  }
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    // Spark's Decimal is not a java.lang.Number — go through numD
    def d(i: Int): Double = StatsAgg.numD(vs(i))
    def l(i: Int): Long = StatsAgg.numD(vs(i)).toLong
    kind match {
      case 0 => MathKernels.erf(d(0))
      case 1 => MathKernels.erfc(d(0))
      case 2 => MathKernels.lgamma(d(0))
      case 3 => MathKernels.tgamma(d(0))
      case 4 => MathKernels.gcd(l(0), l(1))
      case 5 => MathKernels.lcm(l(0), l(1))
      case _ =>
        // byteSwap swaps within the INPUT's width (CH semantics)
        children.head.dataType match {
          case ByteType => l(0)
          case ShortType =>
            java.lang.Short.reverseBytes(l(0).toShort).toLong & 0xffffL
          case IntegerType =>
            java.lang.Integer.reverseBytes(l(0).toInt).toLong & 0xffffffffL
          case _ => java.lang.Long.reverseBytes(l(0))
        }
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MathFnExpr = copy(children = cs)
}

/** Incomplete-beta tail for the t-test p-values (r19b) — the standard
  * continued-fraction formulation (Lentz), ~1e-14. Public math, pinned
  * against known CDF values in the spec. */
object BetaKernels {
  import MathKernels.lgamma

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val fpmin = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= 300 && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) done = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betai(a: Double, b: Double, x: Double): Double = {
    require(x >= 0 && x <= 1, s"betai domain: x=$x")
    if (x == 0) 0.0
    else if (x == 1) 1.0
    else {
      val bt = math.exp(
        lgamma(a + b) - lgamma(a) - lgamma(b) +
          a * math.log(x) + b * math.log(1.0 - x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1.0 - x) / b
    }
  }

  /** Two-sided Student p-value for statistic `t` at `df` degrees. */
  def studentP(t: Double, df: Double): Double =
    if (df <= 0 || t.isNaN) Double.NaN
    else betai(df / 2.0, 0.5, df / (df + t * t))
}

/** `arrayAUC(scores, labels)` — ROC AUC over a row-local series: the
  * rank-sum (Mann–Whitney) formulation with mid-ranks on tied scores,
  * labels truthy = positive. NULL on empty or one-class input. */
case class ArrayAucExpr(left: Expression, right: Expression)
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arrayAUC"
  private def d(a: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case BooleanType => if (a.getBoolean(i)) 1.0 else 0.0
    case dt: DecimalType => a.getDecimal(i, dt.precision, dt.scale).toDouble
    case other => throw new IllegalArgumentException(
      s"arrayAUC takes numeric arrays, got $other")
  }
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val l = right.eval(input)
    if (s == null || l == null) return null
    val sa = s.asInstanceOf[ArrayData]
    val la = l.asInstanceOf[ArrayData]
    val set = left.dataType.asInstanceOf[ArrayType].elementType
    val let = right.dataType.asInstanceOf[ArrayType].elementType
    val n = sa.numElements()
    require(la.numElements() == n,
      s"arrayAUC arrays must align: $n vs ${la.numElements()}")
    if (n == 0) return null
    val pairs = Array.tabulate(n)(i => (d(sa, set, i), d(la, let, i) != 0.0))
      .sortBy(_._1)
    var rankSumPos = 0.0
    var nPos = 0L
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && pairs(j)._1 == pairs(i)._1) j += 1
      val midRank = (i + 1 + j).toDouble / 2.0
      var k = i
      while (k < j) {
        if (pairs(k)._2) { rankSumPos += midRank; nPos += 1 }
        k += 1
      }
      i = j
    }
    val nNeg = n - nPos
    if (nPos == 0 || nNeg == 0) return null
    (rankSumPos - nPos.toDouble * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ArrayAucExpr =
    copy(left = cs(0), right = cs(1))
}

/** Wichura's AS241 (PPND16) inverse normal CDF — the standard public
  * rational approximation, ~1e-16 relative. Powers the A/B sample-size
  * calculators. */
object NormInv {
  def apply(p: Double): Double = {
    require(p > 0 && p < 1, s"normInv domain: p=$p")
    val q = p - 0.5
    if (math.abs(q) <= 0.425) {
      val r = 0.180625 - q * q
      q * (((((((2.5090809287301226727e3 * r + 3.3430575583588128105e4) * r +
        6.7265770927008700853e4) * r + 4.5921953931549871457e4) * r +
        1.3731693765509461125e4) * r + 1.9715909503065514427e3) * r +
        1.3314166789178437745e2) * r + 3.3871328727963666080e0) /
        (((((((5.2264952788528545610e3 * r + 2.8729085735721942674e4) * r +
          3.9307895800092710610e4) * r + 2.1213794301586595867e4) * r +
          5.3941960214247511077e3) * r + 6.8718700749205790830e2) * r +
          4.2313330701600911252e1) * r + 1.0)
    } else {
      var r = if (q < 0) p else 1.0 - p
      r = math.sqrt(-math.log(r))
      val v =
        if (r <= 5.0) {
          val s = r - 1.6
          (((((((7.74545014278341407640e-4 * s + 2.27238449892691845833e-2) * s +
            2.41780725177450611770e-1) * s + 1.27045825245236838258e0) * s +
            3.64784832476320460504e0) * s + 5.76949722146069140550e0) * s +
            4.63033784615654529590e0) * s + 1.42343711074968357734e0) /
            (((((((1.05075007164441684324e-9 * s + 5.47593808499534494600e-4) * s +
              1.51986665636164571966e-2) * s + 1.48103976427480074590e-1) * s +
              6.89767334985100004550e-1) * s + 1.67638483018380384940e0) * s +
              2.05319162663775882187e0) * s + 1.0)
        } else {
          val s = r - 5.0
          (((((((2.01033439929228813265e-7 * s + 2.71155556874348757815e-5) * s +
            1.24266094738807843860e-3) * s + 2.65321895265761230930e-2) * s +
            2.96560571828504891230e-1) * s + 1.78482653991729133580e0) * s +
            5.46378491116411436990e0) * s + 6.65790464350110377720e0) /
            (((((((2.04426310338993978564e-15 * s + 1.42151175831644588870e-7) * s +
              1.84631831751005468180e-5) * s + 7.86869131145613259100e-4) * s +
              1.48753612908506148525e-2) * s + 1.36929880922735805310e-1) * s +
              5.99832206555887937690e-1) * s + 1.0)
        }
      if (q < 0) -v else v
    }
  }
}

/** `seriesOutliersDetectTukey(series[, q1, q3, k])` — per-position
  * outlier scores: 0 inside the [Q1 − k·IQR, Q3 + k·IQR] fence,
  * else the distance past the fence (CH's shape). Quartiles are the
  * linear-interpolation kind; default percentiles 25/75 with k = 1.5. */
case class TukeyOutliersExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  require(children.length == 1 || children.length == 4,
    "seriesOutliersDetectTukey takes (series) or (series, q1, q3, k)")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "seriesOutliersDetectTukey"
  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val et = children.head.dataType.asInstanceOf[ArrayType].elementType
    val n = arr.numElements()
    if (n < 4) return new GenericArrayData(Array.fill[Any](n)(0.0))
    val xs = Array.tabulate(n) { i =>
      et match {
        case DoubleType => arr.getDouble(i)
        case FloatType => arr.getFloat(i).toDouble
        case LongType => arr.getLong(i).toDouble
        case IntegerType => arr.getInt(i).toDouble
        case dt: DecimalType => arr.getDecimal(i, dt.precision, dt.scale).toDouble
        case other => throw new IllegalArgumentException(
          s"seriesOutliersDetectTukey takes numeric series, got $other")
      }
    }
    val (p1, p3, k) =
      if (children.length == 1) (25.0, 75.0, 1.5)
      else {
        def d(e: Expression): Double =
          StatsAgg.numD(e.eval(input))
        (d(children(1)), d(children(2)), d(children(3)))
      }
    val sorted = xs.sorted
    def percentile(p: Double): Double = {
      val pos = p / 100.0 * (n - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, n - 1)
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    val q1 = percentile(p1)
    val q3 = percentile(p3)
    val iqr = q3 - q1
    val loF = q1 - k * iqr
    val hiF = q3 + k * iqr
    new GenericArrayData(xs.map { x =>
      (if (x < loF) loF - x else if (x > hiF) x - hiF else 0.0): Any
    })
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TukeyOutliersExpr = copy(children = cs)
}
