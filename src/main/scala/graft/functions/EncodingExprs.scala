package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** base58 (Bitcoin alphabet) and base32 (RFC 4648) codecs for the CH
  * dialect (r19b) — pure kernels, NULL on invalid input for the
  * `try`/decode paths like CH's tryBase58Decode. */
object BaseCodecs {

  private val B58 =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    B58.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  def base58Encode(in: Array[Byte]): String = {
    if (in.isEmpty) return ""
    val zeros = in.takeWhile(_ == 0).length
    // big-number base conversion over a mutable copy
    val digits = scala.collection.mutable.ArrayBuffer.empty[Char]
    var start = zeros
    val work = in.clone()
    while (start < work.length) {
      var rem = 0
      var i = start
      while (i < work.length) {
        val cur = (rem << 8) | (work(i) & 0xff)
        work(i) = (cur / 58).toByte
        rem = cur % 58
        i += 1
      }
      digits += B58.charAt(rem)
      // skip ALL newly-zero leading positions — advancing one per
      // iteration would divide a zero prefix and emit spurious digits
      while (start < work.length && work(start) == 0) start += 1
    }
    ("1" * zeros) + digits.reverse.mkString
  }

  def base58Decode(s: String): Array[Byte] = {
    if (s == null) return null
    if (s.isEmpty) return Array.empty
    val ones = s.takeWhile(_ == '1').length
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val work = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = ones
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 128 || B58Inv(c.toInt) < 0) return null
      work += B58Inv(c.toInt)
      i += 1
    }
    var start = 0
    while (start < work.length) {
      var rem = 0
      var j = start
      while (j < work.length) {
        val cur = rem * 58 + work(j)
        work(j) = cur >> 8
        rem = cur & 0xff
        j += 1
      }
      out += rem.toByte
      // same multi-zero advance as the encoder
      while (start < work.length && work(start) == 0) start += 1
    }
    (Array.fill[Byte](ones)(0) ++ out.reverse).toArray
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val B32Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    B32.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    // lowercase accepted on decode
    B32.map(Character.toLowerCase).zipWithIndex.foreach {
      case (c, i) => inv(c.toInt) = i
    }
    inv
  }

  def base32Encode(in: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    var i = 0
    while (i < in.length) {
      buffer = (buffer << 8) | (in(i) & 0xff)
      bits += 8
      while (bits >= 5) {
        sb.append(B32.charAt(((buffer >> (bits - 5)) & 0x1f).toInt))
        bits -= 5
      }
      i += 1
    }
    if (bits > 0)
      sb.append(B32.charAt(((buffer << (5 - bits)) & 0x1f).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    if (s == null) return null
    val trimmed = s.reverse.dropWhile(_ == '=').reverse
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var buffer = 0L
    var bits = 0
    var i = 0
    while (i < trimmed.length) {
      val c = trimmed.charAt(i)
      if (c >= 128 || B32Inv(c.toInt) < 0) return null
      buffer = (buffer << 5) | B32Inv(c.toInt)
      bits += 5
      if (bits >= 8) {
        out += ((buffer >> (bits - 8)) & 0xff).toByte
        bits -= 8
      }
      i += 1
    }
    out.toArray
  }

  /** 2-way Morton (Z-order) interleave: UInt32 × UInt32 → UInt64. */
  def mortonEncode2(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xffffffffL
      x = (x | (x << 16)) & 0x0000ffff0000ffffL
      x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
      x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    spread(a) | (spread(b) << 1)
  }

  def mortonDecode2(z: Long): (Long, Long) = {
    def compact(v: Long): Long = {
      var x = v & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
      x = (x | (x >> 8)) & 0x0000ffff0000ffffL
      x = (x | (x >> 16)) & 0x00000000ffffffffL
      x
    }
    (compact(z), compact(z >> 1))
  }
}

/** Dialect dispatcher for the codecs. `kind`: 0 = base58Encode
  * (string→string, CH's convention), 1 = base58Decode (throws on bad
  * input), 2 = tryBase58Decode (NULL on bad input), 3 = base32Encode,
  * 4 = base32Decode, 5 = tryBase32Decode, 6 = idnaEncode (JDK IDN,
  * lenient → NULL on failure), 7 = idnaDecode. */
case class BaseCodecExpr(child: Expression, kind: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = kind match {
    case 0 => "base58Encode"
    case 1 => "base58Decode"
    case 2 => "tryBase58Decode"
    case 3 => "base32Encode"
    case 4 => "base32Decode"
    case 5 => "tryBase32Decode"
    case 6 => "idnaEncode"
    case _ => "idnaDecode"
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String]
    kind match {
      case 0 => UTF8String.fromString(BaseCodecs.base58Encode(s.getBytes))
      case 1 | 2 =>
        val d = BaseCodecs.base58Decode(s.toString)
        if (d == null) {
          if (kind == 2) null
          else throw new IllegalArgumentException(
            s"base58Decode: invalid input '${s.toString.take(64)}'")
        } else UTF8String.fromBytes(d)
      case 3 => UTF8String.fromString(BaseCodecs.base32Encode(s.getBytes))
      case 4 | 5 =>
        val d = BaseCodecs.base32Decode(s.toString)
        if (d == null) {
          if (kind == 5) null
          else throw new IllegalArgumentException(
            s"base32Decode: invalid input '${s.toString.take(64)}'")
        } else UTF8String.fromBytes(d)
      case 6 =>
        try UTF8String.fromString(java.net.IDN.toASCII(s.toString))
        catch { case _: IllegalArgumentException => null }
      case _ =>
        try UTF8String.fromString(java.net.IDN.toUnicode(s.toString))
        catch { case _: IllegalArgumentException => null }
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BaseCodecExpr = copy(child = cs(0))
}

/** `mortonEncode(a, b)` / `mortonDecode(2, z)` — 2-way Z-order codes
  * (CH ≥ 23.10; the 2-argument form is the common spatial case).
  * Decode returns the (a, b) tuple. */
case class MortonExpr(left: Expression, right: Expression, encode: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (encode) LongType
    else StructType(Seq(
      StructField("_1", LongType, nullable = false),
      StructField("_2", LongType, nullable = false)))
  override def prettyName: String =
    if (encode) "mortonEncode" else "mortonDecode"
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    if (encode)
      BaseCodecs.mortonEncode2(
        l.asInstanceOf[Number].longValue(), r.asInstanceOf[Number].longValue())
    else {
      // mortonDecode(dims, z): only dims = 2 here
      require(l.asInstanceOf[Number].intValue() == 2,
        "mortonDecode supports 2 dimensions")
      val (a, b) = BaseCodecs.mortonDecode2(r.asInstanceOf[Number].longValue())
      InternalRow(a, b)
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MortonExpr =
    copy(left = cs(0), right = cs(1))
}

/** UUID value kernels (r19b). `UuidBytesExpr` converts between the
  * canonical 36-char text and the 16-byte FixedString (CH's
  * UUIDStringToNum/UUIDNumToString default big-endian variant);
  * `toUUID` canonicalizes (lowercase) and NULLs (OrNull) or throws on
  * invalid text. */
case class UuidBytesExpr(child: Expression, kind: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = kind match {
    case 0 => BinaryType // UUIDStringToNum
    case _ => StringType // 1 = UUIDNumToString, 2 = toUUID, 3 = toUUIDOrNull
  }
  override def prettyName: String = kind match {
    case 0 => "UUIDStringToNum"
    case 1 => "UUIDNumToString"
    case 2 => "toUUID"
    case _ => "toUUIDOrNull"
  }
  private def parse(s: String): Array[Byte] = {
    val t = s.trim
    if (t.length != 36) return null
    val out = new Array[Byte](16)
    var bi = 0
    var i = 0
    while (i < 36) {
      val c = t.charAt(i)
      if (i == 8 || i == 13 || i == 18 || i == 23) {
        if (c != '-') return null
        i += 1
      } else {
        val hi = Character.digit(c, 16)
        val lo = Character.digit(t.charAt(i + 1), 16)
        if (hi < 0 || lo < 0) return null
        out(bi) = ((hi << 4) | lo).toByte
        bi += 1
        i += 2
      }
    }
    out
  }
  private def format(b: Array[Byte]): String = {
    val sb = new StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(Character.forDigit((b(i) & 0xf0) >> 4, 16))
      sb.append(Character.forDigit(b(i) & 0x0f, 16))
      i += 1
    }
    sb.toString
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    kind match {
      case 0 =>
        parse(v.asInstanceOf[UTF8String].toString)
      case 1 =>
        val b = v.asInstanceOf[Array[Byte]]
        if (b.length != 16) null else UTF8String.fromString(format(b))
      case 2 | 3 =>
        val p = parse(v.asInstanceOf[UTF8String].toString)
        if (p == null) {
          if (kind == 3) null
          else throw new IllegalArgumentException(
            s"toUUID: invalid UUID text '${v.toString.take(64)}'")
        } else UTF8String.fromString(format(p))
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): UuidBytesExpr = copy(child = cs(0))
}

object UuidBytesExpr {
  /** Stable per-JVM identity for `serverUUID()` — fixed at class load,
    * CH's per-server-start contract. */
  val serverUuid: String = java.util.UUID.randomUUID().toString
}

/** Nondeterministic generators (r19b): `generateUUIDv7()` (RFC 9562 —
  * 48-bit unix-ms timestamp, version 7, random tail; time-ordered),
  * `randomString(n)` (arbitrary bytes as a string) and
  * `randomPrintableASCII(n)`. Per-partition ThreadLocalRandom draw —
  * the same nondeterminism contract as Spark's own uuid()/rand(). */
case class RandomGenExpr(child: Expression, kind: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Nondeterministic
    with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = kind != 0
  override def dataType: DataType = StringType
  override def prettyName: String = kind match {
    case 0 => "generateUUIDv7"
    case 1 => "randomString"
    case 3 => "generateULID"
    case _ => "randomPrintableASCII"
  }
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(
      java.util.concurrent.ThreadLocalRandom.current().nextLong() ^
        partitionIndex)
  override protected def evalInternal(input: InternalRow): Any = kind match {
    case 0 =>
      val ms = System.currentTimeMillis()
      var hi = (ms << 16) | 0x7000L | (rng.nextLong() & 0x0fffL)
      var lo = (rng.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
      val b = new Array[Byte](16)
      var i = 7
      while (i >= 0) { b(i) = (hi & 0xff).toByte; hi >>>= 8; i -= 1 }
      i = 15
      while (i >= 8) { b(i) = (lo & 0xff).toByte; lo >>>= 8; i -= 1 }
      val sb = new StringBuilder(36)
      i = 0
      while (i < 16) {
        if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
        sb.append(Character.forDigit((b(i) & 0xf0) >> 4, 16))
        sb.append(Character.forDigit(b(i) & 0x0f, 16))
        i += 1
      }
      UTF8String.fromString(sb.toString)
    case 3 =>
      // ULID: 10 Crockford chars of unix-ms (48 bits) + 16 random
      val ms = System.currentTimeMillis()
      val sb = new StringBuilder(26)
      var i = 9
      val ts = new Array[Char](10)
      var t = ms
      while (i >= 0) { ts(i) = UlidTimeExpr.Crockford.charAt((t & 0x1f).toInt); t >>>= 5; i -= 1 }
      sb.appendAll(ts)
      i = 0
      while (i < 16) {
        sb.append(UlidTimeExpr.Crockford.charAt(rng.nextInt(32)))
        i += 1
      }
      UTF8String.fromString(sb.toString)
    case k =>
      val n = child.eval(input)
      if (n == null) return null
      val len = math.max(0, n.asInstanceOf[Number].intValue())
      if (k == 1) {
        val bytes = new Array[Byte](len)
        rng.nextBytes(bytes)
        UTF8String.fromBytes(bytes)
      } else {
        val chars = new Array[Byte](len)
        var i = 0
        while (i < len) {
          chars(i) = (32 + rng.nextInt(95)).toByte // ' '..'~'
          i += 1
        }
        UTF8String.fromBytes(chars)
      }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): RandomGenExpr = copy(child = cs(0))
}

/** JSON introspection tail (r19b): `JSONType` (CH's type-name enum as
  * text), `isValidJSON`. Jackson parse, lenient NULL/false on
  * malformed input. */
case class JsonTypeExpr(child: Expression, isValid: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = !isValid
  override def dataType: DataType = if (isValid) BooleanType else StringType
  override def prettyName: String = if (isValid) "isValidJSON" else "JSONType"
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return if (isValid) false else null
    val parsed =
      try mapper.readTree(v.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => null }
    if (isValid) parsed != null
    else if (parsed == null) null
    else UTF8String.fromString {
      import com.fasterxml.jackson.databind.node.JsonNodeType._
      parsed.getNodeType match {
        case OBJECT => "Object"
        case ARRAY => "Array"
        case STRING => "String"
        case BOOLEAN => "Bool"
        case NULL => "Null"
        case NUMBER => if (parsed.isIntegralNumber) "Int64" else "Double"
        case _ => "String"
      }
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): JsonTypeExpr = copy(child = cs(0))
}

/** `pointInPolygon(array(x, y), array(array(x1, y1), …))` — ray
  * casting (even-odd rule) over a simple polygon; the last vertex
  * implicitly closes to the first. Array spelling because Spark SQL
  * has no CH tuple literals. */
case class PointInPolygonExpr(left: Expression, right: Expression)
    extends Expression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "pointInPolygon"
  private def coord(a: ArrayData, et: DataType, i: Int): Double = et match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case d: DecimalType =>
      a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(
      s"pointInPolygon takes numeric coordinates, got $other")
  }
  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    val g = right.eval(input)
    if (p == null || g == null) return null
    val pet = left.dataType.asInstanceOf[ArrayType].elementType
    val pa = p.asInstanceOf[ArrayData]
    require(pa.numElements() == 2, "pointInPolygon point must be (x, y)")
    val px = coord(pa, pet, 0)
    val py = coord(pa, pet, 1)
    val polyArr = g.asInstanceOf[ArrayData]
    val vet = right.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType
    val n = polyArr.numElements()
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val vi = polyArr.getArray(i)
      val vj = polyArr.getArray(j)
      val xi = coord(vi, vet, 0); val yi = coord(vi, vet, 1)
      val xj = coord(vj, vet, 0); val yj = coord(vj, vet, 1)
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): PointInPolygonExpr =
    copy(left = cs(0), right = cs(1))
}

/** `ULIDStringToDateTime(s)` — the 48-bit unix-ms prefix of a ULID
  * (first 10 Crockford base32 chars) as a timestamp; invalid text →
  * NULL. */
case class UlidTimeExpr(child: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = TimestampType
  override def prettyName: String = "ULIDStringToDateTime"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String].toString
    if (s.length != 26) return null
    var ms = 0L
    var i = 0
    while (i < 10) {
      val idx = UlidTimeExpr.CrockfordInv(s.charAt(i).toUpper.toInt & 0x7f)
      if (idx < 0) return null
      ms = (ms << 5) | idx
      i += 1
    }
    ms * 1000L // micros
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): UlidTimeExpr = copy(child = cs(0))
}

object UlidTimeExpr {
  val Crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  val CrockfordInv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    Crockford.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }
}

/** `reinterpretAsUInt64(s)` / `reinterpretAsString(n)` — CH's
  * little-endian byte reinterpretation between strings and ints
  * (strings shorter than 8 bytes zero-extend; rendering trims
  * trailing zero bytes). */
case class ReinterpretExpr(child: Expression, toInt: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = if (toInt) LongType else StringType
  override def prettyName: String =
    if (toInt) "reinterpretAsUInt64" else "reinterpretAsString"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    if (toInt) {
      val b = v.asInstanceOf[UTF8String].getBytes
      var n = 0L
      var i = math.min(7, b.length - 1)
      while (i >= 0) { n = (n << 8) | (b(i) & 0xffL); i -= 1 }
      n
    } else {
      var n = v.asInstanceOf[Number].longValue()
      val b = new Array[Byte](8)
      var len = 0
      var i = 0
      while (i < 8) {
        b(i) = (n & 0xff).toByte
        if (b(i) != 0) len = i + 1
        n >>>= 8
        i += 1
      }
      UTF8String.fromBytes(java.util.Arrays.copyOf(b, len))
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ReinterpretExpr = copy(child = cs(0))
}

/** `sleep(seconds)` — CH's per-block testing helper, capped at 3 s
  * like ClickHouse's default max_sleep; evaluates once per ROW here
  * (documented deviation — this engine has no block granularity at
  * the expression level), so keep it on tiny row counts. */
case class SleepExpr(child: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Nondeterministic
    with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ByteType
  override def prettyName: String = "sleep"
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v != null) {
      val secs = v match {
        case d: java.lang.Double => d.doubleValue()
        case n: Number => n.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
      }
      require(secs >= 0 && secs <= 3.0,
        s"sleep() accepts 0..3 seconds, got $secs")
      Thread.sleep((secs * 1000).toLong)
    }
    0.toByte
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SleepExpr = copy(child = cs(0))
}
