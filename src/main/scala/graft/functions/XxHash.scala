package graft.functions

/** XXH64 / XXH32 — Scala ports of Yann Collet's public-domain xxHash
  * (the spec at github.com/Cyan4973/xxHash), seed 0, the exact
  * algorithm ClickHouse's `xxHash64`/`xxHash32` SQL functions expose.
  * Spark's own `xxhash64` is NOT this function: it seeds 42 and its
  * byte-tail handling skips the spec's 4-byte step, so its values
  * diverge from reference XXH64 for most inputs — CH parity needs the
  * real thing.
  *
  * Argument bytes follow the same convention as [[CityHash]] (how CH
  * hashes fixed-width columns): little-endian native width; strings and
  * binary as raw bytes. All arithmetic on Java Long/Int wraps
  * identically to uint64/uint32. Golden vectors in ChFunctionsSpec come
  * from an independently validated implementation of the spec.
  */
object XxHash {

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32u(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def round64(v: Long, input: Long): Long =
    rotl(v + input * P2, 31) * P1

  @inline private def merge64(h: Long, v: Long): Long =
    (h ^ round64(0L, v)) * P1 + P4

  @inline private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  def hash64(b: Array[Byte]): Long = {
    val len = b.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = P1 + P2; var v2 = P2; var v3 = 0L; var v4 = -P1
        while (i + 32 <= len) {
          v1 = round64(v1, fetch64(b, i))
          v2 = round64(v2, fetch64(b, i + 8))
          v3 = round64(v3, fetch64(b, i + 16))
          v4 = round64(v4, fetch64(b, i + 24))
          i += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = merge64(acc, v1); acc = merge64(acc, v2)
        acc = merge64(acc, v3); merge64(acc, v4)
      } else P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round64(0L, fetch64(b, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (fetch32u(b, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((b(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    avalanche64(h)
  }

  /** Hash for SQL NULL: the empty-byte-string hash, mirroring
    * [[CityHash.NullHash]]'s documented engine choice. */
  val NullHash64: Long = hash64(Array.emptyByteArray)

  // fixed-width fast paths — the spec's tail steps specialized to the
  // value's little-endian bytes, zero allocation per row
  def hashLong64(v: Long): Long = {
    var h = P5 + 8
    h = rotl(h ^ round64(0L, v), 27) * P1 + P4
    avalanche64(h)
  }
  def hashInt64(v: Int): Long = {
    var h = P5 + 4
    h = rotl(h ^ ((v & 0xffffffffL) * P1), 23) * P2 + P3
    avalanche64(h)
  }
  def hashShort64(v: Short): Long = {
    var h = P5 + 2
    h = rotl(h ^ ((v & 0xffL) * P5), 11) * P1
    h = rotl(h ^ (((v >> 8) & 0xffL) * P5), 11) * P1
    avalanche64(h)
  }
  def hashByte64(v: Byte): Long = {
    var h = P5 + 1
    h = rotl(h ^ ((v & 0xffL) * P5), 11) * P1
    avalanche64(h)
  }
  def hashBoolean64(v: Boolean): Long = hashByte64(if (v) 1 else 0)
  def hashDouble64(v: Double): Long = hashLong64(java.lang.Double.doubleToLongBits(v))
  def hashFloat64(v: Float): Long = hashInt64(java.lang.Float.floatToIntBits(v))
  def hashUTF8_64(s: org.apache.spark.unsafe.types.UTF8String): Long = hash64(s.getBytes)

  // ---- XXH32 ----

  private val Q1 = 0x9E3779B1
  private val Q2 = 0x85EBCA77
  private val Q3 = 0xC2B2AE3D
  private val Q4 = 0x27D4EB2F
  private val Q5 = 0x165667B1

  @inline private def rotl32(x: Int, r: Int): Int = Integer.rotateLeft(x, r)

  @inline private def fetch32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) |
      ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  @inline private def round32(v: Int, input: Int): Int =
    rotl32(v + input * Q2, 13) * Q1

  @inline private def avalanche32(h0: Int): Int = {
    var h = h0
    h ^= h >>> 15; h *= Q2
    h ^= h >>> 13; h *= Q3
    h ^= h >>> 16
    h
  }

  def hash32(b: Array[Byte]): Int = {
    val len = b.length
    var i = 0
    var h =
      if (len >= 16) {
        var v1 = Q1 + Q2; var v2 = Q2; var v3 = 0; var v4 = -Q1
        while (i + 16 <= len) {
          v1 = round32(v1, fetch32(b, i))
          v2 = round32(v2, fetch32(b, i + 4))
          v3 = round32(v3, fetch32(b, i + 8))
          v4 = round32(v4, fetch32(b, i + 12))
          i += 16
        }
        rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18)
      } else Q5
    h += len
    while (i + 4 <= len) {
      h = rotl32(h + fetch32(b, i) * Q3, 17) * Q4
      i += 4
    }
    while (i < len) {
      h = rotl32(h + (b(i) & 0xff) * Q5, 11) * Q1
      i += 1
    }
    avalanche32(h)
  }

  val NullHash32: Int = hash32(Array.emptyByteArray)

  @inline private def tail32_4(h0: Int, u32: Int): Int =
    rotl32(h0 + u32 * Q3, 17) * Q4

  def hashLong32(v: Long): Int = {
    var h = Q5 + 8
    h = tail32_4(h, v.toInt)          // low word first (little-endian)
    h = tail32_4(h, (v >>> 32).toInt)
    avalanche32(h)
  }
  def hashInt32(v: Int): Int = avalanche32(tail32_4(Q5 + 4, v))
  def hashShort32(v: Short): Int = {
    var h = Q5 + 2
    h = rotl32(h + (v & 0xff) * Q5, 11) * Q1
    h = rotl32(h + ((v >> 8) & 0xff) * Q5, 11) * Q1
    avalanche32(h)
  }
  def hashByte32(v: Byte): Int =
    avalanche32(rotl32(Q5 + 1 + (v & 0xff) * Q5, 11) * Q1)
  def hashBoolean32(v: Boolean): Int = hashByte32(if (v) 1 else 0)
  def hashDouble32(v: Double): Int = hashLong32(java.lang.Double.doubleToLongBits(v))
  def hashFloat32(v: Float): Int = hashInt32(java.lang.Float.floatToIntBits(v))
  def hashUTF8_32(s: org.apache.spark.unsafe.types.UTF8String): Int = hash32(s.getBytes)
}
