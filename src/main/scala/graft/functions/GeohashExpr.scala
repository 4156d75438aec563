package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Standard geohash (public base32 interleaved bisection encoding —
  * the format CH's `geohashEncode`/`geohashDecode` implement). */
object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** CH argument order: (longitude, latitude, precision); precision
    * clamps to [1, 12] (12 is the format's exact-double limit and CH's
    * default). */
  def encode(lon: Double, lat: Double, precision: Int): UTF8String = {
    val p = math.max(1, math.min(12, precision))
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    val sb = new java.lang.StringBuilder(p)
    var bit = 0
    var ch = 0
    var even = true
    while (sb.length < p) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Cell-center decode: (longitude, latitude). Unknown characters
    * refuse loudly. */
  /** Struct-shaped decode for [[GeohashDecodeExpr]] (interpreted and
    * generated paths share it). */
  def decodeRow(hash: UTF8String): InternalRow = {
    val a = decode(hash)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](a(0), a(1)))
  }

  def decode(hash: UTF8String): Array[Double] = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var even = true
    val s = hash.toString.toLowerCase
    var i = 0
    while (i < s.length) {
      val cd = Base32.indexOf(s.charAt(i))
      if (cd < 0) throw new IllegalArgumentException(
        s"invalid geohash character '${s.charAt(i)}' in '$s'")
      var mask = 16
      while (mask > 0) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if ((cd & mask) != 0) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if ((cd & mask) != 0) latLo = mid else latHi = mid
        }
        even = !even
        mask >>= 1
      }
      i += 1
    }
    Array((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** `geohashEncode(longitude, latitude[, precision])` — codegen'd. */
/** `geohashDecode(s)` → struct(longitude, latitude) — the cell-center
  * coordinates (CH returns the same tuple). */
case class GeohashDecodeExpr(hash: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false)))
  override def prettyName: String = "geohashDecode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${hash.dataType.sql}")

  override def eval(input: InternalRow): Any = {
    val h = hash.eval(input)
    if (h == null) return null
    Geohash.decodeRow(h.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val GH = Geohash.getClass.getName.stripSuffix("$")
    val gh = hash.genCode(ctx)
    val IR = classOf[InternalRow].getName
    ev.copy(code = code"""
      |${gh.code}
      |boolean ${ev.isNull} = ${gh.isNull};
      |$IR ${ev.value} = null;
      |if (!${ev.isNull}) ${ev.value} = $GH.decodeRow(${gh.value});
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}

case class GeohashEncodeExpr(lon: Expression, lat: Expression, prec: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(lon, lat, prec)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "geohashEncode"

  override def checkInputDataTypes(): TypeCheckResult =
    // the dialect builder casts for us; exact types keep the generated
    // primitive arithmetic honest
    if (lon.dataType == DoubleType && lat.dataType == DoubleType &&
      prec.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double, int), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val lo = lon.eval(input)
    if (lo == null) return null
    val la = lat.eval(input)
    if (la == null) return null
    val p = prec.eval(input)
    if (p == null) return null
    Geohash.encode(lo.asInstanceOf[Double], la.asInstanceOf[Double], p.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val GH = Geohash.getClass.getName.stripSuffix("$")
    val gl = lon.genCode(ctx)
    val ga = lat.genCode(ctx)
    val gp = prec.genCode(ctx)
    ev.copy(code = code"""
      |${gl.code}
      |${ga.code}
      |${gp.code}
      |boolean ${ev.isNull} = ${gl.isNull} || ${ga.isNull} || ${gp.isNull};
      |UTF8String ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $GH.encode((double)(${gl.value}), (double)(${ga.value}), (int)(${gp.value}));
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lon = newChildren(0), lat = newChildren(1), prec = newChildren(2))
}
