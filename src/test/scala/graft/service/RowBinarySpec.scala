package graft.service

import org.scalatest.funsuite.AnyFunSuite

import graft.service.native.{NativeBlock, NativeWire, RowBinary}
import NativeBlock._

/** RowBinary codec goldens — byte layouts hand-pinned from the public
  * format documentation and clickhouse-go's row-binary writer (varuint
  * length-prefixed strings, LE fixed-width numerics, one flag byte per
  * Nullable value, varuint-counted arrays, no per-column dictionary). */
class RowBinarySpec extends AnyFunSuite {

  private def enc(t: ChT, v: Any): Array[Byte] = {
    val o = new NativeWire.WireOut
    RowBinary.writeValue(o, t, v)
    o.bytes
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString(" ")

  test("scalar goldens: Int32 / Int64 / Float64 / String / Bool") {
    assert(hex(enc(TInt32, 5)) == "05 00 00 00")
    assert(hex(enc(TInt64, 7L)) == "07 00 00 00 00 00 00 00")
    assert(hex(enc(TInt64, -1L)) == "ff ff ff ff ff ff ff ff")
    // 1.5 = 0x3FF8000000000000 little-endian
    assert(hex(enc(TFloat64, 1.5d)) == "00 00 00 00 00 00 f8 3f")
    // varuint length then raw bytes
    assert(hex(enc(TString, "AB")) == "02 41 42")
    assert(hex(enc(TBool, true)) == "01")
  }

  test("Nullable: one flag byte, then the value only when present") {
    assert(hex(enc(TNullable(TInt64), null)) == "01")
    assert(hex(enc(TNullable(TInt64), 7L)) == "00 07 00 00 00 00 00 00 00")
    assert(hex(enc(TNullable(TString), "A")) == "00 01 41")
  }

  test("Array: varuint count then elements — not the Native offsets layout") {
    assert(hex(enc(TArray(TInt16), Seq(1.toShort, 2.toShort))) ==
      "02 01 00 02 00")
    assert(hex(enc(TArray(TString), Seq("a", "bc"))) == "02 01 61 02 62 63")
    assert(hex(enc(TArray(TInt32), Seq.empty[Int])) == "00")
  }

  test("LowCardinality serializes as the plain inner type in row formats") {
    assert(hex(enc(TLowCardinality(TString), "xy")) ==
      hex(enc(TString, "xy")))
  }

  test("WithNamesAndTypes header golden") {
    val o = new NativeWire.WireOut
    RowBinary.writeHeader(o, Seq("a" -> TInt32, "b" -> TString), withTypes = true)
    // 02 | 01 'a' | 01 'b' | 05 "Int32" | 06 "String"
    assert(hex(o.bytes) ==
      "02 01 61 01 62 05 49 6e 74 33 32 06 53 74 72 69 6e 67")
  }

  test("readValue inverts writeValue across every supported shape") {
    val cases: Seq[(ChT, Any)] = Seq(
      (TInt8, 12.toByte), (TInt16, (-5).toShort), (TInt32, 123456),
      (TInt64, 1234567890123L), (TFloat32, 2.5f), (TFloat64, -0.125d),
      (TString, "héllo"), (TBool, false),
      (TNullable(TString), null), (TNullable(TString), ""),
      (TNullable(TFloat64), 3.25d),
      (TArray(TInt64), IndexedSeq(1L, 2L, 3L)),
      (TArray(TNullable(TString)), IndexedSeq("a", null, "c")),
      (TDate, java.time.LocalDate.of(2024, 5, 17)),
      (TDateTime, java.time.Instant.ofEpochSecond(1700000000L)))
    cases.foreach { case (t, v) =>
      val src = new NativeWire.WireIn(enc(t, v))
      val back = RowBinary.readValue(src, t)
      assert(back == v, s"$t: wrote $v, read $back")
      assert(src.atEnd, s"$t: trailing bytes after one value")
    }
  }

  test("readBody: plain RowBinary takes the declared (table) structure") {
    val o = new NativeWire.WireOut
    // two rows of (Int64, Nullable(String))
    RowBinary.writeValue(o, TInt64, 1L); RowBinary.writeValue(o, TNullable(TString), "a")
    RowBinary.writeValue(o, TInt64, 2L); RowBinary.writeValue(o, TNullable(TString), null)
    val (schema, rows) = RowBinary.readBody(o.bytes, "rowbinary",
      Seq("id" -> TInt64, "s" -> TNullable(TString)))
    assert(schema.fieldNames.toSeq == Seq("id", "s"))
    assert(rows.map(_.toSeq) == Seq(Seq(1L, "a"), Seq(2L, null)))
  }

  test("readBody: WithNamesAndTypes is self-describing") {
    val o = new NativeWire.WireOut
    RowBinary.writeHeader(o, Seq("n" -> TInt32, "t" -> TString), withTypes = true)
    RowBinary.writeValue(o, TInt32, 9); RowBinary.writeValue(o, TString, "z")
    val (schema, rows) = RowBinary.readBody(
      o.bytes, "rowbinarywithnamesandtypes", Nil)
    assert(schema.fieldNames.toSeq == Seq("n", "t"))
    assert(rows.map(_.toSeq) == Seq(Seq(9, "z")))
  }

  test("a NULL in a non-Nullable column is refused, never a garbage default") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val e = intercept[IllegalArgumentException] {
      RowBinary.streamResult(schema, Iterator(Seq(null)),
        new java.io.ByteArrayOutputStream(), withNames = false, withTypes = false)
    }
    assert(e.getMessage.contains("non-Nullable"))
  }
}
