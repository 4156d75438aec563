package graft.sources.mergetree

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Wide-part writer for the same MergeTree subset [[MergeTreeSource]]
  * reads — the fixture generator the VERDICT r9 task prescribes (no
  * ClickHouse binary exists in this sandbox to produce real parts), and
  * a usable export path for handing graft-curated data to a ClickHouse
  * estate. Emits per column: `<col>.bin` (LZ4-framed native values) +
  * `<col>.mrk2` (adaptive marks), plus substreams (`.null`, `.size0`,
  * `.dict`) where the type calls for them, and the part-level
  * `columns.txt` / `count.txt` / `default_compression_codec.txt` /
  * `primary.idx`.
  *
  * Deliberate deltas from a CH-written part, all read-side harmless:
  * `checksums.txt` is not produced, and LowCardinality blocks use the
  * per-granule additional-keys form rather than a part-shared
  * dictionary (the reader handles both). Frame checksums are real
  * CityHash128 stamps and `primary.idx` carries the per-granule key
  * values when `orderBy` is given.
  */
object MergeTreePartWriter {

  /** Write `rows` as one wide part under `tableDir/partName`. `columns`
    * are (name, CH type string) pairs; row values are plain JVM values
    * (String, Number, Boolean, java.sql.Timestamp/Date, Seq for
    * arrays, null inside Nullable columns).
    *
    * `orderBy` names the primary-key columns: rows are REQUIRED to
    * arrive sorted by that key (CH's invariant — an unsorted part would
    * make the primary index lie), and `primary.idx` is written with
    * each granule's first-row key values, which the reader's
    * granule-pruning path consumes. Empty `orderBy` writes an empty
    * index (no pruning, everything else works). */
  def writePart(
      tableDir: String,
      columns: Seq[(String, String)],
      rows: Seq[Seq[Any]],
      granularity: Int = 8192,
      partName: String = "all_1_1_0",
      blockSize: Int = 1 << 16,
      orderBy: Seq[String] = Nil,
      fs: TreeFs = NioTreeFs): Unit = {
    require(granularity > 0)
    val dir = fs.join(tableDir, partName)
    fs.mkdirs(dir)
    val granules: Seq[Seq[Seq[Any]]] = rows.grouped(granularity).toSeq

    columns.zipWithIndex.foreach { case ((name, typeStr), ci) =>
      val t = ChType.parse(typeStr)
      val colRows = rows.map(_(ci))
      writeColumn(dir, name, t, colRows, granules.map(_.size), blockSize, fs)
    }

    val colsTxt = new StringBuilder()
      .append("columns format version: 1\n")
      .append(s"${columns.size} columns:\n")
    columns.foreach { case (n, tp) => colsTxt.append(s"`$n` $tp\n") }
    fs.write(fs.join(dir, "columns.txt"), colsTxt.toString.getBytes(UTF_8))
    fs.write(fs.join(dir, "count.txt"), rows.size.toString.getBytes(UTF_8))
    fs.write(fs.join(dir, "default_compression_codec.txt"), "CODEC(LZ4)".getBytes(UTF_8))
    fs.write(fs.join(dir, "primary.idx"), primaryIdx(columns, rows, granules, orderBy))
  }

  /** Per-granule first-row key values, all key columns concatenated in
    * native binary — CH's primary.idx shape (one entry per granule; the
    * optional final mark is not written, matching the marks files). */
  private def primaryIdx(
      columns: Seq[(String, String)],
      rows: Seq[Seq[Any]],
      granules: Seq[Seq[Seq[Any]]],
      orderBy: Seq[String]): Array[Byte] = {
    if (orderBy.isEmpty || rows.isEmpty) return Array.emptyByteArray
    val keyCols = orderBy.map { k =>
      val ci = columns.indexWhere(_._1 == k)
      require(ci >= 0, s"ORDER BY column `$k` not in the column list")
      val t = ChType.parse(columns(ci)._2) match {
        case ChType.LowCardinalityT(inner) => inner // idx stores plain values
        case other => other
      }
      t match {
        case _: ChType.ArrayT | _: ChType.NullableT =>
          throw new IllegalArgumentException(
            s"ORDER BY column `$k`: array/nullable key columns are not supported")
        case _ => ()
      }
      (ci, t)
    }
    // CH's invariant: a part's rows are sorted by the primary key — an
    // unsorted part would make every index entry a lie, so refuse
    val ord = KeyOrdering(keyCols.map(_._2))
    rows.sliding(2).zipWithIndex.foreach {
      case (Seq(a, b), i) =>
        require(ord.compareRows(keyCols.map { case (ci, _) => a(ci) },
            keyCols.map { case (ci, _) => b(ci) }) <= 0,
          s"rows are not sorted by ORDER BY (${orderBy.mkString(", ")}) at row ${i + 1}")
      case _ => ()
    }
    val w = new PlainBinWriter
    granules.foreach { g =>
      val first = g.head
      keyCols.foreach { case (ci, t) => writeScalar(w, t, first(ci)) }
    }
    w.bytes
  }

  /** Write `rows` as one COMPACT part — all columns interleaved in a
    * single `data.bin` with `data.mrk3` marks (`MergeTreeDataPartCompact`;
    * CH writes small parts compact by default, so real part trees mix
    * both kinds). Layout per granule, column by column in declaration
    * order: the column's substreams concatenated with
    * position-independent encoding (Nullable `[null map][values]`,
    * Array `[per-row UInt64 sizes][elements]`), each chunk ending its
    * LZ4 frame — `data.mrk3` records `(frame offset, 0)` per
    * (granule, column) plus the granule's row count, and a final mark
    * at EOF. Supported subset: scalars, Nullable(scalar),
    * Array(scalar); LowCardinality refuses (its shared-dictionary
    * serialization is the wide writer's job). */
  def writeCompactPart(
      tableDir: String,
      columns: Seq[(String, String)],
      rows: Seq[Seq[Any]],
      granularity: Int = 8192,
      partName: String = "all_1_1_0",
      orderBy: Seq[String] = Nil,
      fs: TreeFs = NioTreeFs): Unit = {
    require(granularity > 0)
    val types = columns.map { case (n, ts) =>
      val t = ChType.parse(ts)
      require(CompactCodec.supported(t),
        s"column `$n` of type $ts is outside the compact-part subset " +
          "(scalars, Nullable(scalar), Array(scalar)) — use writePart (wide)")
      t
    }
    val dir = fs.join(tableDir, partName)
    fs.mkdirs(dir)
    val granules: Seq[Seq[Seq[Any]]] = rows.grouped(granularity).toSeq
    val w = new ChCompressedWriter()
    val marks = java.nio.ByteBuffer
      .allocate((granules.size + 1) * (columns.size * 16 + 8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    granules.foreach { g =>
      columns.indices.foreach { ci =>
        val (comp, decomp) = w.markHere
        require(decomp == 0L, "compact chunk must start a fresh frame")
        marks.putLong(comp); marks.putLong(decomp)
        types(ci) match {
          case ChType.NullableT(inner) =>
            g.foreach(r => w.writeByte(if (r(ci) == null) 1 else 0))
            g.foreach(r => writeScalar(w, inner,
              if (r(ci) == null) defaultOf(inner) else r(ci)))
          case ChType.ArrayT(elem) =>
            g.foreach(r => w.writeLongLE(asSeq(r(ci)).size.toLong))
            g.foreach(r => asSeq(r(ci)).foreach(writeScalar(w, elem, _)))
          case scalar =>
            g.foreach(r => writeScalar(w, scalar, r(ci)))
        }
        w.endFrame()
      }
      marks.putLong(g.size.toLong)
    }
    // final mark: every column points at EOF, 0 rows
    val (eof, _) = w.markHere
    columns.indices.foreach { _ => marks.putLong(eof); marks.putLong(0L) }
    marks.putLong(0L)
    fs.write(fs.join(dir, "data.bin"), w.finish())
    fs.write(fs.join(dir, "data.mrk3"), marks.array())
    val colsTxt = new StringBuilder()
      .append("columns format version: 1\n")
      .append(s"${columns.size} columns:\n")
    columns.foreach { case (n, tp) => colsTxt.append(s"`$n` $tp\n") }
    fs.write(fs.join(dir, "columns.txt"), colsTxt.toString.getBytes(UTF_8))
    fs.write(fs.join(dir, "count.txt"), rows.size.toString.getBytes(UTF_8))
    fs.write(fs.join(dir, "default_compression_codec.txt"), "CODEC(LZ4)".getBytes(UTF_8))
    fs.write(fs.join(dir, "primary.idx"), primaryIdx(columns, rows, granules, orderBy))
  }

  /** Partition sidecars of one part dir: `partition.dat` (the partition
    * VALUE in native binary — what real CH stores) and, when the
    * partition key derives from one scalar column, `minmax_<col>.idx`
    * (min then max of the SOURCE column, `primary.idx`-style
    * serialization) — the file CH's own part-level minmax pruning
    * reads. `minmax` is (column, CH type string, min, max). */
  def writePartitionMeta(
      partDir: String,
      pvalType: String,
      pval: Any,
      minmax: Option[(String, String, Any, Any)],
      fs: TreeFs = NioTreeFs): Unit = {
    val w = new PlainBinWriter
    writeScalar(w, ChType.parse(pvalType), pval)
    fs.write(fs.join(partDir, "partition.dat"), w.bytes)
    minmax.foreach { case (c, ts, mn, mx) =>
      val t = ChType.parse(ts) match {
        case ChType.LowCardinalityT(inner) => inner
        case other => other
      }
      val w2 = new PlainBinWriter
      writeScalar(w2, t, mn)
      writeScalar(w2, t, mx)
      fs.write(fs.join(partDir, s"minmax_$c.idx"), w2.bytes)
    }
  }

  /** Write the `.index` listing — one relative path per line. This is
    * the tree's COMMIT POINT, not just the http serving manifest:
    * [[TableFiles]] readers on every backend list from it when
    * present, so parts land invisibly and become readable only when
    * this one small file atomically swaps ([[TreeFs.publish]]).
    * Called last by every mutation, under the tree lock.
    *
    * When a previous manifest exists, part entries are INCREMENTAL —
    * carried forward if the part is still on disk, plus exactly this
    * mutation's `addParts` — never re-walked: a crashed writer's
    * debris (a half-copied part dir, or a copy+delete rename that
    * copied fully but died before deleting the source) is not merely
    * invisible at crash time, it stays unmanifested through every
    * LATER mutation too. Root-level metadata files refresh from the
    * walk. A tree with no manifest yet (fresh CTAS target, staged
    * FsSwap dir, hand-built fixture) manifests everything it holds —
    * all of it is this writer's own output. */
  def writeHttpIndex(tableDir: String, fs: TreeFs = NioTreeFs,
      addParts: Seq[String] = Nil): Unit = {
    val idxPath = fs.join(tableDir, ".index")
    def partOf(rel: String): Option[String] = {
      val head = rel.split('/').head
      if (head != rel && TableFiles.PartNameRe.matches(head)) Some(head)
      else None
    }
    // a MergeTree tree holds part dirs + root metadata files, nothing
    // else — dir-prefixed entries under a NON-part name are staging
    // debris (a crashed `tmp_a*` attach copy) and never manifest
    val walk = fs.walkFiles(tableDir)
      .filter(rel => rel != ".index" && !rel.startsWith(".index.pub_") &&
        (partOf(rel).isDefined || !rel.contains('/')))
    val prev: Option[Seq[String]] =
      if (fs.exists(idxPath))
        try {
          val text = new String(fs.readBytes(idxPath), UTF_8)
          if (text.contains('\t')) None // web-disk per-dir format: rebuild
          else Some(text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq)
        } catch { case scala.util.control.NonFatal(_) => None }
      else None
    val lines: Seq[String] = prev match {
      case None => walk
      case Some(old) =>
        val liveCarried = old.flatMap(partOf).distinct
          .filter(p => fs.isDir(fs.join(tableDir, p))).toSet
        val addSet = addParts.toSet
        val carried = old.filter(rel =>
          partOf(rel).exists(p => liveCarried(p) && !addSet(p)))
        val added = walk.filter(rel => partOf(rel).exists(addSet))
        val rootFiles = walk.filter(rel => partOf(rel).isEmpty)
        (carried ++ added ++ rootFiles).distinct
    }
    val out = new StringBuilder
    lines.sorted.foreach(rel => out.append(rel).append('\n'))
    fs.publish(idxPath, out.toString.getBytes(UTF_8))
  }

  /** Write per-directory `.index` files in the real web-disk listing
    * format (`clickhouse-static-files-disk-uploader`): each directory
    * lists its children, one line per entry — `<name>\t1` for a child
    * directory, `<name>\t0\t<size>` for a file. Recurses the whole
    * tree; pair with a `store/<uuid[0,3)>/<uuid>/` layout to serve the
    * verbatim ATTACH-by-UUID shape over http. */
  def writeWebDiskIndexes(tableDir: String): Unit = {
    def rec(dir: java.nio.file.Path): Unit = {
      val out = new StringBuilder
      val stream = Files.list(dir)
      val children =
        try stream.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .sortBy(_.getFileName.toString)
        finally stream.close()
      children.foreach { c =>
        val name = c.getFileName.toString
        if (Files.isDirectory(c)) {
          out.append(name).append("\t1\n")
          rec(c)
        } else if (name != ".index")
          out.append(name).append("\t0\t").append(Files.size(c)).append('\n')
      }
      Files.write(dir.resolve(".index"), out.toString.getBytes(UTF_8))
    }
    rec(Paths.get(tableDir))
  }

  // ---- per-column stream encoding ----

  private final class StreamOut(blockSize: Int) {
    val w = new ChCompressedWriter(blockSize)
    val marks = Array.newBuilder[(Long, Long, Long)]
    def mark(rows: Int): Unit = {
      val (c, d) = w.markHere
      marks += ((c, d, rows.toLong))
    }
  }

  private def writeColumn(
      partDir: String,
      name: String,
      t: ChType,
      values: Seq[Any],
      granuleSizes: Seq[Int],
      blockSize: Int,
      fs: TreeFs = NioTreeFs): Unit = {
    import ChType._
    val outs = scala.collection.mutable.LinkedHashMap.empty[String, StreamOut]
    def out(stream: String): StreamOut = outs.getOrElseUpdate(stream, new StreamOut(blockSize))

    t match {
      case NullableT(inner) =>
        val nm = out(s"$name.null"); val v = out(name)
        eachGranule(values, granuleSizes) { (g, rows) =>
          nm.mark(g.size); v.mark(g.size)
          g.foreach(x => nm.w.writeByte(if (x == null) 1 else 0))
          g.foreach(x => writeScalar(v.w, inner, if (x == null) defaultOf(inner) else x))
        }
      case LowCardinalityT(inner) =>
        writeLowCardinality(name, inner, values, granuleSizes, out)
      case ArrayT(elem) =>
        val sz = out(s"$name.size0")
        var cum = 0L
        val flatPerGranule: Seq[Seq[Any]] = {
          var idx = 0
          granuleSizes.map { n =>
            val g = values.slice(idx, idx + n); idx += n
            g.flatMap(x => asSeq(x))
          }
        }
        eachGranule(values, granuleSizes) { (g, _) =>
          sz.mark(g.size)
          g.foreach { x => cum += asSeq(x).size; sz.w.writeLongLE(cum) }
        }
        elem match {
          case LowCardinalityT(inner) =>
            writeLowCardinality(name, inner, flatPerGranule.flatten,
              flatPerGranule.map(_.size), out)
          case scalar =>
            val v = out(name)
            flatPerGranule.foreach { els =>
              v.mark(els.size)
              els.foreach(writeScalar(v.w, scalar, _))
            }
        }
      case scalar =>
        val v = out(name)
        eachGranule(values, granuleSizes) { (g, _) =>
          v.mark(g.size)
          g.foreach(writeScalar(v.w, scalar, _))
        }
    }
    outs.foreach { case (stream, s) =>
      fs.write(fs.join(partDir, s"$stream.bin"), s.w.finish())
      val marks = s.marks.result()
      val bb = java.nio.ByteBuffer.allocate(marks.length * 24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      marks.foreach { case (c, d, r) => bb.putLong(c); bb.putLong(d); bb.putLong(r) }
      fs.write(fs.join(partDir, s"$stream.mrk2"), bb.array())
    }
  }

  /** Per-granule additional-keys LowCardinality blocks; `.dict` carries
    * only the version prefix (and mark rows for granule accounting). */
  private def writeLowCardinality(
      name: String,
      inner: ChType,
      values: Seq[Any],
      granuleSizes: Seq[Int],
      out: String => StreamOut): Unit = {
    val dict = out(s"$name.dict"); val main = out(name)
    dict.w.writeLongLE(1L) // KeysSerializationVersion: SharedDictionariesWithAdditionalKeys
    eachGranule(values, granuleSizes) { (g, _) =>
      dict.mark(g.size); main.mark(g.size)
      // a zero-ELEMENT granule (every array empty) writes no block at
      // all — the reader skips rows==0 granules, so an unconditional
      // [flags][0 keys] here would desync the stream mid-split (review
      // finding); the marks above still record the correct position
      if (g.isEmpty) ()
      else writeLcBlock(main, inner, g)
    }
  }

  private def writeLcBlock(main: StreamOut, inner0: ChType, g: Seq[Any]): Unit = {
    // Nullable inner (r16): the dictionary serializes as the NESTED
    // type with slot 0 reserved for null — CH's layout; a real value
    // equal to the nested default still gets its OWN slot, so ''
    // never collapses into NULL
    val (nested, nullable) = inner0 match {
      case ChType.NullableT(n) => (n, true)
      case other => (other, false)
    }
    val realKeys =
      if (nullable) g.filter(_ != null).distinct else g.distinct
    val keys: Seq[Any] =
      if (nullable) defaultOf(nested) +: realKeys else realKeys
    val offset = if (nullable) 1 else 0
    val index = realKeys.zipWithIndex.map { case (k, i) => k -> (i + offset) }.toMap
    val widthTag = if (keys.size <= 0x100) 0 else if (keys.size <= 0x10000) 1 else 2
    main.w.writeLongLE(widthTag.toLong | (1L << 9)) // HasAdditionalKeys
    main.w.writeLongLE(keys.size.toLong)
    keys.foreach(writeScalar(main.w, nested, _))
    g.foreach { x =>
      val i = if (x == null) {
        require(nullable, "NULL in a non-Nullable LowCardinality column")
        0
      } else index(x)
      widthTag match {
        case 0 => main.w.writeByte(i)
        case 1 => main.w.writeShortLE(i.toShort)
        case _ => main.w.writeIntLE(i)
      }
    }
  }

  private def eachGranule(values: Seq[Any], granuleSizes: Seq[Int])(
      f: (Seq[Any], Int) => Unit): Unit = {
    var idx = 0
    granuleSizes.foreach { n =>
      f(values.slice(idx, idx + n), n)
      idx += n
    }
  }

  private def asSeq(x: Any): Seq[Any] = x match {
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case other => throw new IllegalArgumentException(s"array column value: $other")
  }

  private def defaultOf(t: ChType): Any = t match {
    case ChType.Str | _: ChType.FixedStr => ""
    case d: ChType.DecimalT => java.math.BigDecimal.valueOf(0L, d.scale)
    case ChType.F32 => 0f
    case ChType.F64 => 0d
    case ChType.BoolT => false
    case e: ChType.Enum => e.codeToName.minBy(_._1)._2
    case _ => 0L
  }

  private def toLong(x: Any): Long = x match {
    case n: Number => n.longValue()
    case b: Boolean => if (b) 1L else 0L
    case other => throw new IllegalArgumentException(s"numeric value expected: $other")
  }

  private def writeScalar(w: BinValueOut, t: ChType, x: Any): Unit = {
    import ChType._
    t match {
      case FixedInt(1, _) => w.writeByte((toLong(x) & 0xFF).toInt)
      case FixedInt(2, _) => w.writeShortLE((toLong(x) & 0xFFFF).toShort)
      case FixedInt(4, _) => w.writeIntLE(toLong(x).toInt)
      case FixedInt(8, _) => w.writeLongLE(toLong(x))
      case FixedInt(b, _) => throw new IllegalArgumentException(s"int width $b")
      case F32 => w.writeFloatLE(x match {
        case f: Float => f; case n: Number => n.floatValue()
        case other => throw new IllegalArgumentException(s"float expected: $other") })
      case F64 => w.writeDoubleLE(x match {
        case d: Double => d; case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(s"double expected: $other") })
      case Str => w.writeString(x.toString)
      case FixedStr(n) =>
        val b = x.toString.getBytes(UTF_8)
        require(b.length <= n, s"FixedString($n) value of ${b.length} bytes")
        w.writeBytes(b ++ new Array[Byte](n - b.length))
      case Date16 => w.writeShortLE((daysOf(x) & 0xFFFF).toShort)
      case Date32T => w.writeIntLE(daysOf(x))
      case DateTime32 => w.writeIntLE((epochMicrosOf(x) / 1000000L).toInt)
      case DateTime64T(scale) =>
        val micros = epochMicrosOf(x)
        val ticks =
          if (scale <= 6) micros / math.pow(10, (6 - scale).toDouble).toLong
          else micros * math.pow(10, (scale - 6).toDouble).toLong
        w.writeLongLE(ticks)
      case e: Enum =>
        val code = e.codeToName.collectFirst { case (c, n) if n == x.toString => c }
          .getOrElse(throw new IllegalArgumentException(s"'$x' not in enum declaration"))
        if (e.bytes == 1) w.writeByte(code & 0xFF) else w.writeShortLE(code.toShort)
      case BoolT => w.writeByte(if (x.asInstanceOf[Boolean]) 1 else 0)
      case d: DecimalT =>
        val bd = x match {
          case b: java.math.BigDecimal => b
          case b: scala.math.BigDecimal => b.bigDecimal
          case dec: org.apache.spark.sql.types.Decimal => dec.toJavaBigDecimal
          case other => throw new IllegalArgumentException(
            s"decimal value expected: $other")
        }
        // exact rescale — scale overflow is a caller error, not rounding
        val unscaled = bd.setScale(d.scale).unscaledValue()
        d.byteWidth match {
          case 4 => w.writeIntLE(unscaled.intValueExact())
          case 8 => w.writeLongLE(unscaled.longValueExact())
          case _ =>
            // fits 128-bit signed two's complement iff bitLength <= 127
            // (bitLength excludes the sign bit; 10^38-1 has bitLength 127)
            require(unscaled.bitLength() <= 127,
              s"Decimal128 overflow: $unscaled")
            val be = unscaled.toByteArray
            val pad = if (unscaled.signum() < 0) 0xFF else 0x00
            var i = 0
            while (i < 16) {
              val beIdx = be.length - 1 - i
              w.writeByte(if (beIdx >= 0) be(beIdx) & 0xFF else pad)
              i += 1
            }
        }
      case other => throw new IllegalArgumentException(s"not a scalar type: $other")
    }
  }

  private def daysOf(x: Any): Int = x match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(s"date value expected: $other")
  }

  private def epochMicrosOf(x: Any): Long = x match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    // TIMESTAMP_NTZ surfaces as LocalDateTime: wall-clock taken at UTC,
    // matching the session's UTC timezone contract
    case l: java.time.LocalDateTime =>
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
    case n: Number => n.longValue() // already micros
    case other => throw new IllegalArgumentException(s"timestamp value expected: $other")
  }
}
