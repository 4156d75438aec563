package graft.service.native

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import NativeWire.{ByteSource, WireOut}

/** Native-protocol Data block codec — CH's `Block` layout (public
  * protocol; clickhouse-go `lib/proto/block.go` reads exactly this):
  *
  * ```
  * BlockInfo: (varint 1, UInt8 is_overflows, varint 2, Int32
  *             bucket_num = -1, varint 0)
  * varint num_columns, varint num_rows
  * per column: name string, type string,
  *             [UInt8 has_custom_serialization = 0  (rev ≥ 54454)],
  *             column data
  * ```
  *
  * Column data is columnar fixed-width little-endian / varint-length
  * strings; `Nullable(T)` is a UInt8 null map then T with placeholder
  * defaults; `Array(T)` is cumulative UInt64 offsets then the
  * flattened inner column.
  *
  * Type surface: the github_events families the reference serves —
  * Int8..64, UInt8..64, Float32/64, String, Date, DateTime,
  * DateTime64, Bool, and Array/Nullable over them. Results map from
  * Spark types; Enum columns are rendered as String on the way out
  * (the engine's documented posture — type defaults are never faked),
  * Decimal/Binary/struct-likes as String.
  */
object NativeBlock {

  // ---- CH wire type model ----

  sealed trait ChT
  case object TInt8 extends ChT
  case object TInt16 extends ChT
  case object TInt32 extends ChT
  case object TInt64 extends ChT
  case object TUInt8 extends ChT
  case object TUInt16 extends ChT
  case object TUInt32 extends ChT
  case object TUInt64 extends ChT
  case object TFloat32 extends ChT
  case object TFloat64 extends ChT
  case object TString extends ChT
  case object TDate extends ChT
  case object TBool extends ChT
  /** Wire UInt32 seconds. */
  case object TDateTime extends ChT
  /** Wire Int64 scaled by 10^precision. */
  final case class TDateTime64(precision: Int) extends ChT
  final case class TNullable(inner: ChT) extends ChT
  final case class TArray(inner: ChT) extends ChT
  /** Dictionary-encoded transport (CH `SerializationLowCardinality`,
    * clickhouse-go `lib/column/lowcardinality.go`): per block, a
    * UInt64 keys-serialization version (1 = shared dictionaries with
    * additional keys), a UInt64 index type (low byte = key width,
    * bit 9 = keys inline, bit 10 = update dictionary), the inline
    * dictionary in the NESTED plain format, then the row indices.
    * Decoded/encoded for CLIENT blocks (external data, INSERT payloads
    * — github_events declares LC columns); server RESULTS still emit
    * plain types, which CH clients accept. */
  final case class TLowCardinality(inner: ChT) extends ChT

  /** CH Decimal(P, S): fixed-width scaled integer on the wire —
    * 4 bytes for P ≤ 9 (Decimal32), 8 for P ≤ 18 (Decimal64), 16 for
    * P ≤ 38 (Decimal128), little-endian two's complement (r18). */
  final case class TDecimal(precision: Int, scale: Int) extends ChT {
    require(precision >= 1 && precision <= 38 && scale >= 0 && scale <= precision,
      s"Decimal($precision, $scale) out of the supported range")
    def byteWidth: Int =
      if (precision <= 9) 4 else if (precision <= 18) 8 else 16
  }

  def parseType(s0: String): ChT = {
    val s = s0.trim
    def inner(prefix: String): String =
      s.substring(prefix.length + 1, s.length - 1)
    if (s.startsWith("Nullable(")) TNullable(parseType(inner("Nullable")))
    else if (s.startsWith("Array(")) TArray(parseType(inner("Array")))
    else if (s.startsWith("LowCardinality("))
      TLowCardinality(parseType(inner("LowCardinality")))
    else if (s.startsWith("DateTime64(")) {
      val args = inner("DateTime64").split(",")
      TDateTime64(args(0).trim.toInt)
    }
    else if (s.startsWith("DateTime")) TDateTime // optional ('tz')
    else if (s.startsWith("Decimal32(")) TDecimal(9, inner("Decimal32").trim.toInt)
    else if (s.startsWith("Decimal64(")) TDecimal(18, inner("Decimal64").trim.toInt)
    else if (s.startsWith("Decimal128(")) TDecimal(38, inner("Decimal128").trim.toInt)
    else if (s.startsWith("Decimal(")) {
      val args = inner("Decimal").split(",")
      TDecimal(args(0).trim.toInt, args(1).trim.toInt)
    }
    else s match {
      case "Int8" => TInt8
      case "Int16" => TInt16
      case "Int32" => TInt32
      case "Int64" => TInt64
      case "UInt8" => TUInt8
      case "UInt16" => TUInt16
      case "UInt32" => TUInt32
      case "UInt64" => TUInt64
      case "Float32" => TFloat32
      case "Float64" => TFloat64
      case "String" => TString
      case "Date" => TDate
      case "Bool" | "Boolean" => TBool
      case other => throw new IllegalArgumentException(
        s"native protocol: unsupported column type '$other'")
    }
  }

  def renderType(t: ChT): String = t match {
    case TInt8 => "Int8"
    case TInt16 => "Int16"
    case TInt32 => "Int32"
    case TInt64 => "Int64"
    case TUInt8 => "UInt8"
    case TUInt16 => "UInt16"
    case TUInt32 => "UInt32"
    case TUInt64 => "UInt64"
    case TFloat32 => "Float32"
    case TFloat64 => "Float64"
    case TString => "String"
    case TDate => "Date"
    case TBool => "Bool"
    case TDateTime => "DateTime('UTC')"
    case TDateTime64(p) => s"DateTime64($p, 'UTC')"
    case TDecimal(p, sc) => s"Decimal($p, $sc)"
    case TNullable(i) => s"Nullable(${renderType(i)})"
    case TArray(i) => s"Array(${renderType(i)})"
    case TLowCardinality(i) => s"LowCardinality(${renderType(i)})"
  }

  /** Spark result field → CH wire type (session results are UTC). */
  def chTypeFor(dt: DataType, nullable: Boolean): ChT = {
    def wrap(t: ChT): ChT = if (nullable) TNullable(t) else t
    dt match {
      case ByteType => wrap(TInt8)
      case ShortType => wrap(TInt16)
      case IntegerType => wrap(TInt32)
      case LongType => wrap(TInt64)
      case FloatType => wrap(TFloat32)
      case DoubleType => wrap(TFloat64)
      case BooleanType => wrap(TBool)
      case StringType => wrap(TString)
      case DateType => wrap(TDate)
      case _: TimestampType => wrap(TDateTime64(6))
      case d: DecimalType => wrap(TDecimal(d.precision, d.scale))
      // Binary is a CH byte string already; anything else (struct/map)
      // renders as text
      case BinaryType => wrap(TString)
      case ArrayType(et, containsNull) =>
        // CH has no Nullable(Array) — the array itself is never null
        // on the wire (a null Spark array renders empty)
        TArray(chTypeFor(et, containsNull))
      case _ => wrap(TString)
    }
  }

  // ---- encode ----

  /** A column ready for the wire: `values` use the JVM shapes produced
    * by Spark's `Row` (java.lang boxes, String, java.sql.Date/
    * Timestamp, Seq for arrays, null). */
  final case class Col(name: String, t: ChT, values: IndexedSeq[Any])

  /** One block in CH's `FORMAT Native` FILE layout (what the HTTP door
    * serves and `clickhouse-client --format Native` writes): columns
    * count, rows count, then per column name/type/data — NO BlockInfo
    * and NO custom-serialization flag, i.e. the revision-0 framing
    * CH's NativeOutputFormat uses outside the TCP protocol. */
  def writeFormatBlock(o: WireOut, cols: Seq[Col], rows: Int): Unit = {
    o.writeVarUInt(cols.size.toLong)
    o.writeVarUInt(rows.toLong)
    cols.foreach { c =>
      o.writeString(c.name)
      o.writeString(renderType(c.t))
      writeColumnData(o, c.t, c.values)
    }
  }

  /** Decode one `FORMAT Native` file-layout block ([[writeFormatBlock]]
    * inverse). */
  def readFormatBlock(src: ByteSource): DecodedBlock = {
    val nCols = src.readVarUInt().toInt
    val nRows = src.readVarUInt().toInt
    val cols = (0 until nCols).map { _ =>
      val name = src.readString()
      val t = parseType(src.readString())
      Col(name, t, readColumnData(src, t, nRows))
    }
    DecodedBlock(cols, nRows)
  }

  def writeBlock(o: WireOut, cols: Seq[Col], rows: Int, revision: Long): Unit = {
    // BlockInfo (field-id/value pairs, 0-terminated)
    o.writeVarUInt(1); o.writeByte(0)        // is_overflows = false
    o.writeVarUInt(2); o.writeIntLE(-1)      // bucket_num = -1
    o.writeVarUInt(0)
    o.writeVarUInt(cols.size.toLong)
    o.writeVarUInt(rows.toLong)
    cols.foreach { c =>
      o.writeString(c.name)
      o.writeString(renderType(c.t))
      if (revision >= NativeProtocol.MinRevisionWithCustomSerialization)
        o.writeByte(0) // no custom (sparse/const) serialization
      writeColumnData(o, c.t, c.values)
    }
  }

  private def toLongNum(v: Any): Long = v match {
    case b: java.lang.Byte => b.longValue
    case s: java.lang.Short => s.longValue
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
    case b: java.lang.Boolean => if (b) 1L else 0L
    case d: java.math.BigDecimal => d.longValueExact
    case d: scala.math.BigDecimal => d.toLongExact
    case other => throw new IllegalArgumentException(
      s"native protocol: cannot encode ${other.getClass.getName} as integer")
  }

  private def toStringBytes(v: Any): Array[Byte] = v match {
    case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case b: Array[Byte] => b
    case d: java.math.BigDecimal => d.toPlainString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case other => String.valueOf(other)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  private def epochDay(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case other => toLongNum(other)
  }

  private def epochMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => toLongNum(other)
  }

  /** Write a scaled-integer decimal body: `width` bytes, little-endian
    * two's complement, sign-extended (CH's Decimal32/64/128 layout). */
  private def writeScaledInt(o: WireOut, unscaled: java.math.BigInteger,
      width: Int): Unit = {
    if (width == 4) o.writeIntLE(unscaled.intValueExact())
    else if (width == 8) o.writeLongLE(unscaled.longValueExact())
    else {
      // fits 128-bit signed two's complement iff bitLength <= 127
      // (bitLength excludes the sign bit; 10^38-1 has bitLength 127)
      require(unscaled.bitLength() <= 127,
        s"Decimal128 overflow: $unscaled needs ${unscaled.bitLength() + 1} bits")
      val be = unscaled.toByteArray // big-endian, minimal length
      val pad = if (unscaled.signum() < 0) 0xFF else 0x00
      var i = 0
      while (i < 16) {
        val beIdx = be.length - 1 - i // LE byte i = BE byte from the end
        o.writeByte(if (beIdx >= 0) be(beIdx) & 0xFF else pad)
        i += 1
      }
    }
  }

  private[native] def writeColumnData(o: WireOut, t: ChT, vs: IndexedSeq[Any]): Unit =
    t match {
      case TNullable(inner) =>
        vs.foreach(v => o.writeByte(if (v == null) 1 else 0))
        val zero: Any = inner match {
          case TString => ""
          case TFloat32 => java.lang.Float.valueOf(0f)
          case TFloat64 => java.lang.Double.valueOf(0d)
          case TBool => java.lang.Boolean.FALSE
          case TDate => java.time.LocalDate.ofEpochDay(0)
          case TDateTime | TDateTime64(_) => java.time.Instant.EPOCH
          case TDecimal(_, sc) => java.math.BigDecimal.valueOf(0L, sc)
          case _ => java.lang.Long.valueOf(0L)
        }
        writeColumnData(o, inner, vs.map(v => if (v == null) zero else v))
      case TArray(inner) =>
        val seqs = vs.map {
          case null => IndexedSeq.empty[Any]
          case s: scala.collection.Seq[_] => s.toIndexedSeq
          case a: Array[_] => a.toIndexedSeq
          case other => throw new IllegalArgumentException(
            s"native protocol: cannot encode ${other.getClass.getName} as Array")
        }
        var off = 0L
        seqs.foreach { s => off += s.size; o.writeLongLE(off) }
        writeColumnData(o, inner, seqs.flatten)
      case TInt8 => vs.foreach(v => o.writeByte((toLongNum(v) & 0xFF).toInt))
      case TUInt8 => vs.foreach(v => o.writeByte((toLongNum(v) & 0xFF).toInt))
      case TBool => vs.foreach(v => o.writeByte(if (toLongNum(v) != 0) 1 else 0))
      case TInt16 => vs.foreach(v => o.writeShortLE(toLongNum(v).toShort))
      case TUInt16 => vs.foreach(v => o.writeShortLE(toLongNum(v).toShort))
      case TInt32 => vs.foreach(v => o.writeIntLE(toLongNum(v).toInt))
      case TUInt32 => vs.foreach(v => o.writeIntLE(toLongNum(v).toInt))
      case TInt64 => vs.foreach(v => o.writeLongLE(toLongNum(v)))
      case TUInt64 => vs.foreach(v => o.writeLongLE(toLongNum(v)))
      case TFloat32 => vs.foreach {
        case f: java.lang.Float => o.writeFloatLE(f.floatValue)
        case v => o.writeFloatLE(toLongNum(v).toFloat)
      }
      case TFloat64 => vs.foreach {
        case d: java.lang.Double => o.writeDoubleLE(d.doubleValue)
        case f: java.lang.Float => o.writeDoubleLE(f.doubleValue)
        case v => o.writeDoubleLE(toLongNum(v).toDouble)
      }
      case TString => vs.foreach { v =>
        val b = toStringBytes(v)
        o.writeVarUInt(b.length.toLong)
        o.writeBytes(b)
      }
      case d @ TDecimal(_, sc) => vs.foreach { v =>
        val bd = v match {
          case b: java.math.BigDecimal => b
          case b: scala.math.BigDecimal => b.bigDecimal
          case other => new java.math.BigDecimal(String.valueOf(other))
        }
        // exact rescale: a value that cannot carry the column's scale
        // is a caller error, never a silent rounding
        writeScaledInt(o, bd.setScale(sc).unscaledValue(), d.byteWidth)
      }
      case TDate => vs.foreach { v =>
        // CH Date is UInt16 days since epoch — clamp like CH does
        val d = math.min(math.max(epochDay(v), 0L), 65535L)
        o.writeShortLE(d.toShort)
      }
      case TDateTime => vs.foreach { v =>
        // floor-divide (truncation shifted pre-1970 sub-second values
        // one second late) and clamp to DateTime's UInt32 range, the
        // same posture as the Date branch (advisor r14)
        val s = Math.floorDiv(epochMicros(v), 1000000L)
        o.writeIntLE(math.min(math.max(s, 0L), 0xFFFFFFFFL).toInt)
      }
      case TDateTime64(p) => vs.foreach { v =>
        val micros = epochMicros(v)
        val scaled =
          if (p == 6) micros
          else if (p < 6) micros / math.pow(10, (6 - p).toDouble).toLong
          else micros * math.pow(10, (p - 6).toDouble).toLong
        o.writeLongLE(scaled)
      }
      case TLowCardinality(inner0) => {
        // CH SerializationLowCardinality / clickhouse-go
        // lowcardinality.go layout: UInt64 keys version, then (when
        // rows exist) UInt64 index type (low byte = key width, bit 9 =
        // keys inline, bit 10 = update dictionary), the inline dict in
        // the NESTED plain format, UInt64 row count, the indices. For
        // Nullable inner the dictionary reserves index 0 as the
        // default/null slot and the dict serializes as the nested
        // non-null type.
        o.writeLongLE(LcKeysVersion)
        if (vs.nonEmpty) {
          val nullable = inner0.isInstanceOf[TNullable]
          val nested = inner0 match {
            case TNullable(i) => i
            case i => i
          }
          // for Nullable inners slot 0 is RESERVED for null — a real
          // value equal to the nested default ("" / 0 / false) gets its
          // own slot, never index 0 (review finding: reusing slot 0
          // silently turned inserted empty strings into NULLs)
          val realDict = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
          val offset = if (nullable) 1 else 0
          val indices = vs.map {
            case null if nullable => 0
            case null => throw new IllegalArgumentException(
              "native protocol: null in non-Nullable LowCardinality column")
            case v => offset + realDict.getOrElseUpdate(v, realDict.size)
          }
          val nestedDefault: Any = nested match {
            case TString => ""
            case TFloat32 => java.lang.Float.valueOf(0f)
            case TFloat64 => java.lang.Double.valueOf(0d)
            case TBool => java.lang.Boolean.FALSE
            case TDate => java.time.LocalDate.ofEpochDay(0)
            case TDateTime | TDateTime64(_) => java.time.Instant.EPOCH
            case _ => java.lang.Long.valueOf(0L)
          }
          val dictValues: IndexedSeq[Any] =
            if (nullable) nestedDefault +: realDict.keys.toIndexedSeq
            else realDict.keys.toIndexedSeq
          val keyWidth = // 0:UInt8 1:UInt16 2:UInt32 3:UInt64
            if (dictValues.size <= 0xFF) 0
            else if (dictValues.size <= 0xFFFF) 1
            else 2
          o.writeLongLE(keyWidth.toLong | LcHasAdditionalKeys | LcNeedUpdateDict)
          o.writeLongLE(dictValues.size.toLong)
          writeColumnData(o, nested, dictValues)
          o.writeLongLE(vs.size.toLong)
          keyWidth match {
            case 0 => indices.foreach(i => o.writeByte(i))
            case 1 => indices.foreach(i => o.writeShortLE(i.toShort))
            case _ => indices.foreach(i => o.writeIntLE(i))
          }
        }
      }
    }

  /** `SharedDictionariesWithAdditionalKeys` — the one keys version
    * current CH servers and clients speak. */
  private val LcKeysVersion = 1L
  private val LcHasAdditionalKeys = 1L << 9
  private val LcNeedUpdateDict = 1L << 10
  private val LcNeedGlobalDict = 1L << 8

  // ---- decode ----

  final case class DecodedBlock(cols: Seq[Col], rows: Int)

  /** Wire type → the Spark type [[readColumnData]]'s JVM values carry
    * (the inverse of [[chTypeFor]] up to the documented unsigned
    * reinterpretations) — what a decoded client/body block needs to
    * become a DataFrame. */
  def sparkTypeOf(t: ChT): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t match {
      case TInt8 => ByteType
      case TInt16 => ShortType
      case TInt32 => IntegerType
      case TInt64 => LongType
      case TUInt8 => ShortType
      case TUInt16 => IntegerType
      case TUInt32 => LongType
      case TUInt64 => LongType // signed reinterpretation, documented
      case TFloat32 => FloatType
      case TFloat64 => DoubleType
      case TBool => BooleanType
      case TString => StringType
      case TDecimal(p, sc) => DecimalType(p, sc)
      case TDate => DateType
      case TDateTime | TDateTime64(_) => TimestampType
      case TNullable(i) => sparkTypeOf(i)
      case TArray(i) => ArrayType(sparkTypeOf(i))
      case TLowCardinality(i) => sparkTypeOf(i) // a transport, not a type
    }
  }

  def readBlock(src: ByteSource, revision: Long): DecodedBlock = {
    // BlockInfo field pairs until 0
    var field = src.readVarUInt()
    while (field != 0) {
      field match {
        case 1 => src.readByte()
        case 2 => src.readIntLE()
        case other => throw new IllegalArgumentException(
          s"native protocol: unknown BlockInfo field $other")
      }
      field = src.readVarUInt()
    }
    val nCols = src.readVarUInt().toInt
    val nRows = src.readVarUInt().toInt
    val cols = (0 until nCols).map { _ =>
      val name = src.readString()
      val t = parseType(src.readString())
      if (revision >= NativeProtocol.MinRevisionWithCustomSerialization) {
        val custom = src.readByte()
        require(custom == 0,
          "native protocol: custom column serialization is not supported")
      }
      Col(name, t, readColumnData(src, t, nRows))
    }
    DecodedBlock(cols, nRows)
  }

  private[native] def readColumnData(src: ByteSource, t: ChT,
      rows: Int): IndexedSeq[Any] = t match {
    case TNullable(inner) =>
      val nulls = (0 until rows).map(_ => src.readByte() != 0)
      val vals = readColumnData(src, inner, rows)
      (0 until rows).map(i => if (nulls(i)) null else vals(i))
    case TArray(inner) =>
      val offsets = (0 until rows).map(_ => src.readLongLE())
      val total = if (rows == 0) 0 else offsets.last.toInt
      val flat = readColumnData(src, inner, total)
      var prev = 0
      offsets.map { o =>
        val s = flat.slice(prev, o.toInt); prev = o.toInt; s
      }
    case TInt8 => (0 until rows).map(_ => src.readByte().toByte)
    case TUInt8 => (0 until rows).map(_ => (src.readByte() & 0xFF).toShort)
    case TBool => (0 until rows).map(_ => src.readByte() != 0)
    case TInt16 => (0 until rows).map(_ => src.readShortLE())
    case TUInt16 => (0 until rows).map(_ => src.readShortLE() & 0xFFFF)
    case TInt32 => (0 until rows).map(_ => src.readIntLE())
    case TUInt32 => (0 until rows).map(_ => src.readIntLE().toLong & 0xFFFFFFFFL)
    case TInt64 => (0 until rows).map(_ => src.readLongLE())
    case TUInt64 => (0 until rows).map(_ => src.readLongLE()) // signed reinterpret
    case TFloat32 => (0 until rows).map(_ => src.readFloatLE())
    case TFloat64 => (0 until rows).map(_ => src.readDoubleLE())
    case TString => (0 until rows).map(_ => src.readString())
    case d @ TDecimal(_, sc) => (0 until rows).map { _ =>
      val unscaled = d.byteWidth match {
        case 4 => java.math.BigInteger.valueOf(src.readIntLE().toLong)
        case 8 => java.math.BigInteger.valueOf(src.readLongLE())
        case _ =>
          val be = new Array[Byte](16)
          var i = 15
          while (i >= 0) { be(i) = src.readByte().toByte; i -= 1 }
          new java.math.BigInteger(be)
      }
      new java.math.BigDecimal(unscaled, sc)
    }
    case TDate => (0 until rows).map(_ =>
      java.time.LocalDate.ofEpochDay((src.readShortLE() & 0xFFFF).toLong))
    case TDateTime => (0 until rows).map(_ =>
      java.time.Instant.ofEpochSecond(src.readIntLE().toLong & 0xFFFFFFFFL))
    case TDateTime64(p) => (0 until rows).map { _ =>
      val v = src.readLongLE()
      val micros =
        if (p == 6) v
        else if (p < 6) v * math.pow(10, (6 - p).toDouble).toLong
        else v / math.pow(10, (p - 6).toDouble).toLong
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    }
    case TLowCardinality(inner0) =>
      val version = src.readLongLE()
      require(version == LcKeysVersion,
        s"native protocol: LowCardinality keys version $version " +
          s"(expected $LcKeysVersion)")
      if (rows == 0) IndexedSeq.empty
      else {
        val serType = src.readLongLE()
        val hasGlobal = (serType & LcNeedGlobalDict) != 0
        val hasAdditional = (serType & LcHasAdditionalKeys) != 0
        require(hasGlobal || hasAdditional,
          "native protocol: LowCardinality block without any keys")
        val nullable = inner0.isInstanceOf[TNullable]
        val nested = inner0 match {
          case TNullable(i) => i
          case i => i
        }
        // GLOBAL-dictionary variant (r17; previously refused): the
        // shared dictionary precedes the per-block additional keys.
        // CH's index semantics (SerializationLowCardinality.cpp,
        // mapIndexWithAdditionalKeys): an index below the global
        // dictionary's size references the global dictionary; an index
        // at or past it references additional_keys[idx - global_size]
        // — i.e. the combined [global ++ additional] table. Slot 0 of
        // whichever table comes first is the default value (NULL for a
        // Nullable inner), as ColumnUnique keeps it.
        val globalDict: IndexedSeq[Any] =
          if (hasGlobal) {
            val gs = src.readLongLE().toInt
            readColumnData(src, nested, gs)
          } else IndexedSeq.empty
        val additional: IndexedSeq[Any] =
          if (hasAdditional) {
            val as = src.readLongLE().toInt
            readColumnData(src, nested, as)
          } else IndexedSeq.empty
        val dict = if (hasGlobal && hasAdditional) globalDict ++ additional
          else if (hasGlobal) globalDict
          else additional
        val n = src.readLongLE().toInt
        require(n == rows,
          s"native protocol: LowCardinality row count $n != block rows $rows")
        val indices: IndexedSeq[Int] = (serType & 0xFF) match {
          case 0 => (0 until n).map(_ => src.readByte() & 0xFF)
          case 1 => (0 until n).map(_ => src.readShortLE() & 0xFFFF)
          case 2 => (0 until n).map(_ => src.readIntLE())
          case 3 => (0 until n).map(_ => src.readLongLE().toInt)
          case w => throw new IllegalArgumentException(
            s"native protocol: LowCardinality key width $w")
        }
        indices.map { i =>
          if (nullable && i == 0) null else dict(i)
        }
      }
  }

  // ---- Spark bridge ----

  /** Result rows → wire columns under the schema-derived types. A
    * column whose field metadata carries `ch.lowcardinality` (set by
    * [[graft.types.ChSchemaParser]] when the declared CH type was
    * `LowCardinality(…)`, preserved by Spark through plain column
    * references) goes out in the LC transport — CH's own behavior:
    * `SELECT tag FROM t` keeps the column's LC wire format, while an
    * expression over it (which drops Spark's field metadata) returns
    * plain, as CH's type algebra mostly does too. Restricted to
    * String inners — the only LC shape the reference's corpus uses
    * and the one every client accepts without suspicious-type flags. */
  def fromRows(schema: StructType, rows: Array[Row]): Seq[Col] =
    schema.fields.zipWithIndex.toSeq.map { case (f, i) =>
      val base = chTypeFor(f.dataType, f.nullable)
      val t =
        if (f.metadata.contains("ch.lowcardinality") &&
            f.metadata.getBoolean("ch.lowcardinality")) base match {
          case TString | TNullable(TString) => TLowCardinality(base)
          case _ => base
        } else base
      Col(f.name, t, rows.toIndexedSeq.map(r => r.get(i)))
    }
}
