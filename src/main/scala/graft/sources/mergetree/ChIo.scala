package graft.sources.mergetree

import java.io.{File, RandomAccessFile}

/** IO primitives for ClickHouse's on-disk MergeTree streams (SURVEY §2.1
  * S5; reference `temporal/workflow_query_executor_test.go:85` attaches a
  * web-disk MergeTree table). Two layers:
  *
  *   - the COMPRESSED FRAME format every `.bin` stream uses (public
  *     format, ClickHouse `CompressedWriteBuffer`): repeated frames of
  *     `[16B CityHash128 checksum][1B method][4B LE compressed size incl
  *     9B header][4B LE decompressed size][payload]`, method `0x82` LZ4
  *     (the default codec), `0x90` ZSTD, `0x02` None;
  *   - the NATIVE VALUE encodings layered on the decompressed stream
  *     (little-endian fixed ints/floats, LEB128 varints, varint-prefixed
  *     strings).
  *
  * Frame checksums are CityHash128 of the frame body (method byte +
  * sizes + payload) — [[graft.functions.CityHash.hash128]], the same
  * 1.0.2 lineage as the cityHash64 port. The writer stamps real
  * checksums; the reader VERIFIES any non-zero stored checksum and
  * fails loudly on mismatch (an all-zero checksum is treated as
  * absent — pre-checksum fixtures and hand-built parts still read).
  */
private[mergetree] object ChIo {
  val MethodLz4: Int = 0x82
  val MethodZstd: Int = 0x90
  val MethodNone: Int = 0x02
  val FrameHeaderBytes = 25 // 16 checksum + 1 method + 4 + 4
}

/** Random-access view of one stream file — local path or an
  * executor-local downloaded copy of an http object ([[PartFiles]]
  * decides which). */
private[mergetree] final class SeekableFile(path: String) extends AutoCloseable {
  private val raf = new RandomAccessFile(new File(path), "r")
  def length: Long = raf.length()
  def readAt(off: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    raf.seek(off)
    raf.readFully(b)
    ScanBytes.add(n.toLong)
    b
  }
  override def close(): Unit = raf.close()
}

/** Credit MergeTree storage reads to Hadoop's per-thread FileSystem
  * statistics — the channel Spark's DSv2 `MetricsHandler` snapshots
  * into `inputMetrics.setBytesRead` (it OVERWRITES any direct
  * increment, so crediting the task metrics object directly is lost;
  * measured r16). The reads themselves stay on RandomAccessFile /
  * readAllBytes for speed; only the accounting goes through the
  * statistics object. Records are already counted by Spark's own
  * MetricsIterator per emitted row — never incremented here. Driver-
  * side reads (marks, primary.idx at planning) land on driver threads
  * whose baselines no task snapshots, so they never pollute a task's
  * delta. */
private[mergetree] object ScanBytes {
  private lazy val stats =
    org.apache.hadoop.fs.FileSystem.getStatistics(
      "file", classOf[org.apache.hadoop.fs.RawLocalFileSystem])
  def add(n: Long): Unit = stats.incrementBytesRead(n)
}

/** Sequential reader over a compressed `.bin` stream with mark-style
  * seeking: a mark addresses (start offset of a compressed frame in the
  * file, byte offset within that frame's decompressed payload). Values
  * may span frames — reads continue transparently into the next frame.
  */
private[mergetree] final class ChCompressedReader(file: SeekableFile) {
  private var fileOff: Long = 0L       // next frame's start
  private var block: Array[Byte] = Array.emptyByteArray
  private var pos: Int = 0

  def seek(compressedOffset: Long, decompressedOffset: Long): Unit = {
    fileOff = compressedOffset
    block = Array.emptyByteArray
    pos = 0
    if (decompressedOffset > 0) {
      loadNextBlock()
      require(decompressedOffset <= block.length,
        s"mark decompressed offset $decompressedOffset exceeds block of ${block.length}B")
      pos = decompressedOffset.toInt
    }
  }

  private def loadNextBlock(): Unit = {
    require(fileOff < file.length,
      s"read past end of compressed stream (offset $fileOff of ${file.length})")
    val header = file.readAt(fileOff, ChIo.FrameHeaderBytes)
    val method = header(16) & 0xFF
    val compSize = leInt(header, 17)   // includes the 9 header bytes after the checksum
    val rawSize = leInt(header, 21)
    val payload = file.readAt(fileOff + ChIo.FrameHeaderBytes, compSize - 9)
    // checksum covers the frame BODY: method + sizes + payload
    if (header.take(16).exists(_ != 0)) {
      val body = new Array[Byte](9 + payload.length)
      System.arraycopy(header, 16, body, 0, 9)
      System.arraycopy(payload, 0, body, 9, payload.length)
      val (lo, hi) = graft.functions.CityHash.hash128(body)
      val storedLo = leLong(header, 0)
      val storedHi = leLong(header, 8)
      if (lo != storedLo || hi != storedHi)
        throw new IllegalArgumentException(
          f"compressed-frame checksum mismatch at offset $fileOff " +
            f"(stored $storedLo%016x:$storedHi%016x, computed $lo%016x:$hi%016x) — " +
            "the stream is corrupt, or was written by a tool with a " +
            "different CityHash lineage (zero the checksum field to skip)")
    }
    block = method match {
      case ChIo.MethodLz4 =>
        val out = new Array[Byte](rawSize)
        net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
          .decompress(payload, 0, out, 0, rawSize)
        out
      case ChIo.MethodZstd =>
        val out = new Array[Byte](rawSize)
        com.github.luben.zstd.Zstd.decompress(out, payload)
        out
      case ChIo.MethodNone => payload
      case other => throw new IllegalArgumentException(
        f"unsupported ClickHouse compression method 0x$other%02x " +
          "(LZ4, ZSTD and None are supported; codec-chained/delta streams are not)")
    }
    fileOff += ChIo.FrameHeaderBytes + (compSize - 9)
    pos = 0
  }

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def leLong(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }

  // ---- bulk access to the current decompressed block (r20): the
  // fixed-width decode lanes copy whole value runs straight out of the
  // block via the column vector's little-endian bulk puts — one
  // copyMemory per block instead of per-value byte shifts. The caller
  // owns the arithmetic: stay within blockRemaining, fall back to the
  // per-value readers for a value spanning a frame boundary. ----
  def ensureBlock(): Unit = if (pos >= block.length) loadNextBlock()
  def blockRemaining: Int = block.length - pos
  def blockBytes: Array[Byte] = block
  def blockOffset: Int = pos
  def skipInBlock(n: Int): Unit = pos += n

  def readByte(): Int = {
    if (pos >= block.length) loadNextBlock()
    val b = block(pos) & 0xFF
    pos += 1
    b
  }

  def readBytes(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var got = 0
    while (got < n) {
      if (pos >= block.length) loadNextBlock()
      val take = math.min(n - got, block.length - pos)
      System.arraycopy(block, pos, out, got, take)
      pos += take
      got += take
    }
    out
  }

  def skipBytes(n: Long): Unit = {
    var left = n
    while (left > 0) {
      if (pos >= block.length) loadNextBlock()
      val take = math.min(left, (block.length - pos).toLong)
      pos += take.toInt
      left -= take
    }
  }

  // fixed-width reads stay INSIDE the current decompressed block on the
  // fast path — no per-value allocation (the original readBytes(n) form
  // allocated a fresh array per scalar, the dominant cost of a wide
  // scan); the frame-spanning tail falls back to the copying path
  def readShortLE(): Short = {
    if (pos + 2 <= block.length) {
      val b = block; val p = pos; pos += 2
      ((b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)).toShort
    } else {
      val b = readBytes(2)
      ((b(0) & 0xFF) | ((b(1) & 0xFF) << 8)).toShort
    }
  }
  def readIntLE(): Int = {
    if (pos + 4 <= block.length) {
      val b = block; val p = pos; pos += 4
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    } else {
      val b = readBytes(4)
      (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(3) & 0xFF) << 24)
    }
  }
  def readLongLE(): Long = {
    if (pos + 8 <= block.length) {
      val b = block; val p = pos; pos += 8
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xFFL); i -= 1 }
      v
    } else {
      val b = readBytes(8)
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(i) & 0xFFL); i -= 1 }
      v
    }
  }
  def readFloatLE(): Float = java.lang.Float.intBitsToFloat(readIntLE())
  def readDoubleLE(): Double = java.lang.Double.longBitsToDouble(readLongLE())

  /** LEB128 unsigned varint — string lengths, array counts. */
  def readVarUInt(): Long = {
    var v = 0L
    var shift = 0
    var b = readByte()
    while ((b & 0x80) != 0) {
      v |= (b & 0x7FL) << shift
      shift += 7
      require(shift <= 63, "varint too long")
      b = readByte()
    }
    v | ((b & 0x7FL) << shift)
  }

  def readString(): String = {
    val n = readVarUInt()
    require(n <= Int.MaxValue, s"string of $n bytes")
    new String(readBytes(n.toInt), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Raw UTF-8 bytes of a varint-prefixed string — the scan path wraps
    * these in UTF8String directly, skipping the decode-to-String +
    * re-encode round-trip [[readString]] would pay per value. */
  def readStringBytes(): Array[Byte] = {
    val n = readVarUInt()
    require(n <= Int.MaxValue, s"string of $n bytes")
    readBytes(n.toInt)
  }
}

/** Value-encoding surface shared by the compressed stream writer and
  * the PLAIN writer `primary.idx` needs (the primary index is the one
  * uncompressed file in a part). */
private[mergetree] trait BinValueOut {
  def writeByte(b: Int): Unit
  def writeBytes(b: Array[Byte]): Unit
  final def writeShortLE(v: Short): Unit =
    writeBytes(Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
  final def writeIntLE(v: Int): Unit =
    writeBytes(Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte))
  final def writeLongLE(v: Long): Unit =
    writeBytes(Array.tabulate(8)(i => ((v >> (8 * i)) & 0xFF).toByte))
  final def writeFloatLE(v: Float): Unit = writeIntLE(java.lang.Float.floatToIntBits(v))
  final def writeDoubleLE(v: Double): Unit = writeLongLE(java.lang.Double.doubleToLongBits(v))
  final def writeVarUInt(v0: Long): Unit = {
    var v = v0
    require(v >= 0, "negative varint")
    while (v >= 0x80) { writeByte(((v & 0x7F) | 0x80).toInt); v >>= 7 }
    writeByte(v.toInt)
  }
  final def writeString(s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarUInt(b.length.toLong)
    writeBytes(b)
  }
}

/** Uncompressed value writer — `primary.idx`. */
private[mergetree] final class PlainBinWriter extends BinValueOut {
  private val out = new java.io.ByteArrayOutputStream()
  def writeByte(b: Int): Unit = out.write(b)
  def writeBytes(b: Array[Byte]): Unit = out.write(b)
  def bytes: Array[Byte] = out.toByteArray
}

/** Uncompressed value reader — `primary.idx`. */
private[mergetree] final class PlainBinReader(data: Array[Byte]) {
  private var pos = 0
  def atEnd: Boolean = pos >= data.length
  def readByte(): Int = { val b = data(pos) & 0xFF; pos += 1; b }
  def readBytes(n: Int): Array[Byte] = {
    val out = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; out
  }
  def readShortLE(): Short = ((readByte()) | (readByte() << 8)).toShort
  def readIntLE(): Int =
    readByte() | (readByte() << 8) | (readByte() << 16) | (readByte() << 24)
  def readLongLE(): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (readByte().toLong << (8 * i)); i += 1 }
    v
  }
  def readFloatLE(): Float = java.lang.Float.intBitsToFloat(readIntLE())
  def readDoubleLE(): Double = java.lang.Double.longBitsToDouble(readLongLE())
  def readVarUInt(): Long = {
    var v = 0L
    var shift = 0
    var b = readByte()
    while ((b & 0x80) != 0) {
      v |= (b & 0x7FL) << shift; shift += 7; b = readByte()
    }
    v | ((b & 0x7FL) << shift)
  }
  def readString(): String =
    new String(readBytes(readVarUInt().toInt), java.nio.charset.StandardCharsets.UTF_8)
}

/** Compressed `.bin` stream writer (fixture/export side): buffers
  * decompressed bytes and emits LZ4 frames at `blockSize` boundaries.
  * [[markHere]] snapshots the (file offset, buffered bytes) pair that a
  * `.mrk2` mark stores — the un-flushed buffer always starts a fresh
  * frame at the current end of file, which is exactly CH's invariant. */
private[mergetree] final class ChCompressedWriter(blockSize: Int = 1 << 16)
  extends BinValueOut {
  private val out = new java.io.ByteArrayOutputStream()
  private val buf = new java.io.ByteArrayOutputStream()

  def markHere: (Long, Long) = (out.size().toLong, buf.size().toLong)

  def writeByte(b: Int): Unit = { buf.write(b); maybeFlush() }
  def writeBytes(b: Array[Byte]): Unit = { buf.write(b); maybeFlush() }

  private def maybeFlush(): Unit = if (buf.size() >= blockSize) flushBlock()

  private def flushBlock(): Unit = if (buf.size() > 0) {
    val raw = buf.toByteArray
    buf.reset()
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor().compress(raw)
    val compSize = comp.length + 9
    // frame body (method + sizes + payload), checksummed as CH does
    val body = new Array[Byte](9 + comp.length)
    body(0) = ChIo.MethodLz4.toByte
    var i = 0
    while (i < 4) {
      body(1 + i) = ((compSize >> (8 * i)) & 0xFF).toByte
      body(5 + i) = ((raw.length >> (8 * i)) & 0xFF).toByte
      i += 1
    }
    System.arraycopy(comp, 0, body, 9, comp.length)
    val (lo, hi) = graft.functions.CityHash.hash128(body)
    i = 0
    while (i < 8) { out.write(((lo >> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 8) { out.write(((hi >> (8 * i)) & 0xFF).toInt); i += 1 }
    out.write(body)
  }

  /** Force the buffered bytes out as a frame now — the compact-part
    * writer ends every (granule, column) chunk's frame the way CH's
    * writer does (each chunk starts a fresh frame, marks carry
    * decompressed offset 0). */
  def endFrame(): Unit = flushBlock()

  def finish(): Array[Byte] = { flushBlock(); out.toByteArray }
}
