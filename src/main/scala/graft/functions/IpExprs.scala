package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IPv6/MAC value kernels for the CH dialect (r19b) — pure-JDK text
  * parse/format, no `InetAddress` (its hostname path can resolve DNS;
  * these must stay pure functions of their input). IPv6 addresses
  * travel as 16-byte `binary` values, CH's FixedString(16) storage;
  * rendering follows RFC 5952 (longest zero run compressed,
  * lowercase, IPv4-mapped tail rendered dotted-quad). MACs ride
  * UInt64-in-Long like CH. */
object IpKernels {

  /** "1:2::3", "::", "::ffff:1.2.3.4" → 16 bytes; null when invalid. */
  def parseIpv6(text: String): Array[Byte] = {
    if (text == null || text.isEmpty) return null
    val s = text.trim
    if (s.isEmpty || s.count(_ == ':') < 2) return null
    // split on "::" (at most one allowed)
    val dcIdx = s.indexOf("::")
    if (dcIdx >= 0 && s.indexOf("::", dcIdx + 1) >= 0) return null
    val (headPart, tailPart) =
      if (dcIdx < 0) (s, null)
      else (s.substring(0, dcIdx), s.substring(dcIdx + 2))
    def groupsOf(part: String): Array[String] =
      if (part == null || part.isEmpty) Array.empty
      else part.split(":", -1)
    val head = groupsOf(headPart)
    val tail = if (dcIdx < 0) Array.empty[String] else groupsOf(tailPart)
    if (head.exists(_.isEmpty) || tail.exists(_.isEmpty)) return null
    // an embedded IPv4 dotted-quad may close the address
    val all = head ++ tail
    val lastIsV4 = all.nonEmpty && all.last.contains('.')
    val v4Bytes: Array[Int] =
      if (!lastIsV4) null
      else {
        val quads = all.last.split("\\.", -1)
        if (quads.length != 4) return null
        val vals = new Array[Int](4)
        var i = 0
        while (i < 4) {
          val q = quads(i)
          if (q.isEmpty || q.length > 3 || !q.forall(_.isDigit)) return null
          val v = q.toInt
          if (v > 255) return null
          vals(i) = v
          i += 1
        }
        vals
      }
    val groupCount = all.length - (if (lastIsV4) 1 else 0)
    val totalGroups = groupCount + (if (lastIsV4) 2 else 0)
    if (dcIdx < 0 && totalGroups != 8) return null
    if (dcIdx >= 0 && totalGroups > 7) return null // "::" covers >= 1 group
    val out = new Array[Byte](16)
    var bi = 0
    def putGroup(g: String): Boolean = {
      if (g.isEmpty || g.length > 4) return false
      var v = 0
      var i = 0
      while (i < g.length) {
        val d = Character.digit(g.charAt(i), 16)
        if (d < 0) return false
        v = (v << 4) | d
        i += 1
      }
      out(bi) = (v >>> 8).toByte
      out(bi + 1) = (v & 0xff).toByte
      bi += 2
      true
    }
    val headGroups =
      if (dcIdx < 0) all.take(groupCount)
      else head.take(math.min(head.length, groupCount))
    for (g <- headGroups if !g.contains('.')) if (!putGroup(g)) return null
    if (dcIdx >= 0) {
      val tailG = tail.filterNot(_.contains('.'))
      bi = 16 - (if (lastIsV4) 4 else 0) - tailG.length * 2
      if (bi < headGroups.count(!_.contains('.')) * 2) return null
      for (g <- tailG) if (!putGroup(g)) return null
    }
    if (lastIsV4) {
      var i = 0
      while (i < 4) { out(12 + i) = v4Bytes(i).toByte; i += 1 }
    }
    out
  }

  private def isV4Mapped(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 10) { if (b(i) != 0) return false; i += 1 }
    b(10) == -1 && b(11) == -1
  }

  /** RFC 5952 canonical text of a 16-byte address. */
  def formatIpv6(b: Array[Byte]): String = {
    if (b == null || b.length != 16) return null
    if (isV4Mapped(b))
      return s"::ffff:${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) { g(i) = ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff); i += 1 }
    // longest zero run of length >= 2
    var bestStart = -1
    var bestLen = 0
    var curStart = -1
    var curLen = 0
    i = 0
    while (i < 8) {
      if (g(i) == 0) {
        if (curStart < 0) { curStart = i; curLen = 0 }
        curLen += 1
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      } else { curStart = -1; curLen = 0 }
      i += 1
    }
    val sb = new StringBuilder
    if (bestLen >= 2) {
      i = 0
      while (i < bestStart) {
        if (i > 0) sb.append(':')
        sb.append(Integer.toHexString(g(i)))
        i += 1
      }
      sb.append("::")
      i = bestStart + bestLen
      var firstTail = true
      while (i < 8) {
        if (!firstTail) sb.append(':')
        sb.append(Integer.toHexString(g(i)))
        firstTail = false
        i += 1
      }
    } else {
      i = 0
      while (i < 8) {
        if (i > 0) sb.append(':')
        sb.append(Integer.toHexString(g(i)))
        i += 1
      }
    }
    sb.toString
  }

  /** CH `cutIPv6(x, bytesToCutForIPv6, bytesToCutForIPv4)`: zero the
    * trailing bytes (the IPv4 count applies to IPv4-mapped values),
    * then render. */
  def cutIpv6(b: Array[Byte], cut6: Int, cut4: Int): String = {
    if (b == null || b.length != 16) return null
    val cut = math.max(0, math.min(16, if (isV4Mapped(b)) cut4 else cut6))
    val c = b.clone()
    var i = 16 - cut
    while (i < 16) { c(i) = 0; i += 1 }
    // a fully-cut IPv4-mapped tail stops being v4-mapped text only if
    // the ::ffff prefix itself was cut — formatIpv6 re-derives it
    formatIpv6(c)
  }

  def macNumToString(n: Long): String = {
    val sb = new StringBuilder(17)
    var shift = 40
    while (shift >= 0) {
      val b = ((n >>> shift) & 0xff).toInt
      sb.append(Character.toUpperCase(Character.forDigit(b >> 4, 16)))
      sb.append(Character.toUpperCase(Character.forDigit(b & 0xf, 16)))
      if (shift > 0) sb.append(':')
      shift -= 8
    }
    sb.toString
  }

  /** "AA:BB:CC:DD:EE:FF" (or '-' separated) → UInt64; null invalid. */
  def macStringToNum(s: String): java.lang.Long = {
    if (s == null) return null
    val parts = s.trim.split("[:-]", -1)
    if (parts.length != 6) return null
    var n = 0L
    var i = 0
    while (i < 6) {
      val p = parts(i)
      if (p.length != 2) return null
      val hi = Character.digit(p.charAt(0), 16)
      val lo = Character.digit(p.charAt(1), 16)
      if (hi < 0 || lo < 0) return null
      n = (n << 8) | ((hi << 4) | lo).toLong
      i += 1
    }
    java.lang.Long.valueOf(n)
  }
}

/** Dialect dispatcher for the IPv6/MAC kernels. `kind`:
  * 0 = IPv6StringToNum (string → 16-byte binary; invalid → null like
  * CH's OrNull twin, never a throw),
  * 1 = IPv6NumToString (binary → RFC 5952 text),
  * 2 = isIPv6String, 3 = MACNumToString, 4 = MACStringToNum,
  * 5 = IPv4ToIPv6 (UInt32-in-Long → 16-byte mapped ::ffff:x). */
case class IpExpr(child: Expression, kind: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = kind match {
    case 0 | 5 => BinaryType
    case 2 => BooleanType
    case 4 => LongType
    case _ => StringType
  }
  override def prettyName: String = kind match {
    case 0 => "IPv6StringToNum"
    case 1 => "IPv6NumToString"
    case 2 => "isIPv6String"
    case 3 => "MACNumToString"
    case 4 => "MACStringToNum"
    case _ => "IPv4ToIPv6"
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    kind match {
      case 0 => IpKernels.parseIpv6(v.asInstanceOf[UTF8String].toString)
      case 1 =>
        val s = IpKernels.formatIpv6(v.asInstanceOf[Array[Byte]])
        if (s == null) null else UTF8String.fromString(s)
      case 2 =>
        IpKernels.parseIpv6(v.asInstanceOf[UTF8String].toString) != null
      case 3 =>
        UTF8String.fromString(
          IpKernels.macNumToString(v.asInstanceOf[java.lang.Long].longValue()))
      case 4 => IpKernels.macStringToNum(v.asInstanceOf[UTF8String].toString)
      case _ =>
        val n = v.asInstanceOf[java.lang.Long].longValue()
        val out = new Array[Byte](16)
        out(10) = -1
        out(11) = -1
        out(12) = ((n >>> 24) & 0xff).toByte
        out(13) = ((n >>> 16) & 0xff).toByte
        out(14) = ((n >>> 8) & 0xff).toByte
        out(15) = (n & 0xff).toByte
        out
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): IpExpr = copy(child = cs(0))
}

/** `cutIPv6(bin, bytesForIPv6, bytesForIPv4)`. */
case class CutIpv6Expr(first: Expression, second: Expression,
    third: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "cutIPv6"
  override def eval(input: InternalRow): Any = {
    val b = first.eval(input)
    val c6 = second.eval(input)
    val c4 = third.eval(input)
    if (b == null || c6 == null || c4 == null) return null
    val s = IpKernels.cutIpv6(b.asInstanceOf[Array[Byte]],
      c6.asInstanceOf[Number].intValue(), c4.asInstanceOf[Number].intValue())
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CutIpv6Expr =
    copy(first = cs(0), second = cs(1), third = cs(2))
}

/** `URLHierarchy(url)` / `URLPathHierarchy(url)` — the URL truncated
  * at each successive `/`, `?`, `#` boundary, shortest first (CH's
  * drill-down helper). Path form keeps only the part after the
  * authority. Empty array when there is nothing below the authority
  * (resp. path). */
case class UrlHierarchyExpr(child: Expression, pathOnly: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (pathOnly) "URLPathHierarchy" else "URLHierarchy"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val url = v.asInstanceOf[UTF8String].toString
    // authority ends at the first /?# after the scheme
    val schemeEnd = {
      val i = url.indexOf("//")
      if (i >= 0 && (i == 0 || url.charAt(i - 1) == ':')) i + 2 else 0
    }
    var authEnd = schemeEnd
    while (authEnd < url.length && "/?#".indexOf(url.charAt(authEnd)) < 0)
      authEnd += 1
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = authEnd
    while (i < url.length) {
      val c = url.charAt(i)
      if (c == '/') {
        // cut AFTER the slash
        val cut = url.substring(if (pathOnly) authEnd else 0, i + 1)
        if (i + 1 > authEnd + 1 || !pathOnly)
          out += UTF8String.fromString(cut)
      } else if (c == '?' || c == '#') {
        val cut = url.substring(if (pathOnly) authEnd else 0, i)
        if (out.isEmpty || out.last.toString != cut)
          out += UTF8String.fromString(cut)
      }
      i += 1
    }
    val whole = url.substring(if (pathOnly) authEnd else 0)
    if (whole.nonEmpty && (out.isEmpty || out.last.toString != whole))
      out += UTF8String.fromString(whole)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): UrlHierarchyExpr = copy(child = cs(0))
}
