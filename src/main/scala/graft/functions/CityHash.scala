package graft.functions

import org.apache.spark.unsafe.Platform

/** CityHash64 v1.0.2 — a Scala port of the public-domain CityHash by
  * Google (Geoff Pike / Jyrki Alakuijala), the exact version ClickHouse
  * vendors for its `cityHash64` SQL function (reference exercises it at
  * `README.md:57,59` — `SELECT sum(cityHash64(*)) FROM github_events`).
  *
  * v1.0.2 specifics (vs later CityHash releases): the `k3` constant
  * exists and is used in `HashLen0to16`/`HashLen17to32`; later versions
  * (≥1.1) replaced those paths with `mur`-based mixing. ClickHouse
  * pinned 1.0.2 forever for stability, so parity means porting 1.0.2.
  *
  * All arithmetic is on Java `Long` treated as uint64 — two's-complement
  * add/mul wrap identically; shifts use `>>>` (logical). Byte fetches
  * are little-endian, as on x86 where CityHash is defined.
  *
  * The byte fetches go through `Platform.getLong/getInt/getByte` on a
  * (base, offset) pair rather than `Array[Byte]` indexing: the hot
  * caller is `cityHash64(*)` over string columns, where the value is a
  * slice of an `UnsafeRow` page — hashing the slice in place through
  * [[hashMem]] avoids the per-row `UTF8String.getBytes` copy (one
  * allocation per string per row at 60M+ rows is real GC pressure).
  * Array entry points delegate with `BYTE_ARRAY_OFFSET`. Reads are
  * unaligned, which x86/ARM64 support natively; a native big-endian
  * platform byte-reverses to keep the little-endian definition.
  */
object CityHash {

  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  /** Hash value CH-compatible code would produce for a SQL NULL: we
    * define it as the hash of the empty byte string (k2). Documented
    * engine choice — the reference never hashes NULLs. */
  val NullHash: Long = k2

  private val BigEndian =
    java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.BIG_ENDIAN
  private val AOff: Long = Platform.BYTE_ARRAY_OFFSET.toLong

  @inline private def fetch64(b: AnyRef, i: Long): Long = {
    val v = Platform.getLong(b, i)
    if (BigEndian) java.lang.Long.reverseBytes(v) else v
  }

  @inline private def fetch32(b: AnyRef, i: Long): Long = {
    val v = Platform.getInt(b, i)
    (if (BigEndian) Integer.reverseBytes(v) else v) & 0xffffffffL
  }

  @inline private def fetch8(b: AnyRef, i: Long): Int =
    Platform.getByte(b, i) & 0xff

  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  // shift is in [1, 63] by construction at the single call site
  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** CityHash's Hash128to64 — also the multi-argument combiner ClickHouse
    * uses to fold per-column hashes. */
  def hash128to64(low: Long, high: Long): Long = {
    var a = (low ^ high) * kMul
    a ^= (a >>> 47)
    var b = (high ^ a) * kMul
    b ^= (b >>> 47)
    b *= kMul
    b
  }

  @inline private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(s: AnyRef, off: Long, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = fetch8(s, off)
      val b = fetch8(s, off + (len >> 1))
      val c = fetch8(s, off + len - 1)
      val y = a + (b << 8) // uint32
      val z = len + (c << 2) // uint32
      shiftMix((y & 0xffffffffL) * k2 ^ (z & 0xffffffffL) * k3) * k2
    } else k2
  }

  private def hashLen17to32(s: AnyRef, off: Long, len: Int): Long = {
    val a = fetch64(s, off) * k1
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * k2
    val d = fetch64(s, off + len - 16) * k0
    hashLen16(
      rotate(a - b, 43) + rotate(c, 30) + d,
      a + rotate(b ^ k3, 20) - c + len)
  }

  // returns (first, second) packed via the two-element array to stay
  // allocation-light in the hot loop
  @inline private def weakHashLen32WithSeeds(
      w: Long, x: Long, y: Long, z: Long, a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  @inline private def weakHashLen32WithSeeds(
      s: AnyRef, off: Long, a: Long, b: Long): (Long, Long) =
    weakHashLen32WithSeeds(
      fetch64(s, off), fetch64(s, off + 8),
      fetch64(s, off + 16), fetch64(s, off + 24), a, b)

  private def hashLen33to64(s: AnyRef, off: Long, len: Int): Long = {
    var z = fetch64(s, off + 24)
    var a = fetch64(s, off) + (len + fetch64(s, off + len - 16)) * k0
    var b = rotate(a + z, 52)
    var c = rotate(a, 37)
    a += fetch64(s, off + 8)
    c += rotate(a, 7)
    a += fetch64(s, off + 16)
    val vf = a + z
    val vs = b + rotate(a, 31) + c
    a = fetch64(s, off + 16) + fetch64(s, off + len - 32)
    z = fetch64(s, off + len - 8)
    b = rotate(a + z, 52)
    c = rotate(a, 37)
    a += fetch64(s, off + len - 24)
    c += rotate(a, 7)
    a += fetch64(s, off + len - 16)
    val wf = a + z
    val ws = b + rotate(a, 31) + c
    val r = shiftMix((vf + ws) * k2 + (wf + vs) * k0)
    shiftMix(r * k0 + vs) * k2
  }

  // ---- CityHash128 (same 1.0.2 lineage) ------------------------------
  // ClickHouse uses CityHash128 for its compressed-frame checksums
  // (every MergeTree `.bin` frame is prefixed with the 128-bit hash of
  // its method byte + sizes + payload). Ported from the same
  // public-domain 1.0.2 source as hash64 above: the `k3`-seeded entry
  // form below is the 1.0.2 spelling (1.1 reseeded it differently).
  // No external golden vectors are runnable in this sandbox (no CH
  // binary, no egress); the MergeTree round-trip spec pins
  // writer↔reader agreement and corruption detection.

  /** CityMurmur — the < 128-byte arm of CityHash128WithSeed. */
  private def cityMurmur(
      s: AnyRef, off: Long, len: Int, seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    val l = len - 16
    if (l <= 0) {
      a = shiftMix(a * k1) * k1
      c = b * k1 + hashLen0to16(s, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(s, off) else c))
    } else {
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      var left = l
      while (left > 0) {
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        left -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  /** CityHash128WithSeed, 1.0.2, over memory. Returns (low, high). */
  private def hash128WithSeedMem(
      s: AnyRef, off0: Long, len0: Int, seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seedLo, seedHi)
    var off = off0
    var len = len0
    var x = seedLo
    var y = seedHi
    var z = len * k1
    var vf = rotate(y ^ k1, 49) * k1 + fetch64(s, off)
    var vs = rotate(vf, 42) * k1 + fetch64(s, off + 8)
    var wf = rotate(y + z, 35) * k1 + x
    var ws = rotate(x + fetch64(s, off + 88), 53) * k1
    while (len >= 128) {
      var i = 0
      while (i < 2) {
        x = rotate(x + y + vf + fetch64(s, off + 16), 37) * k1
        y = rotate(y + vs + fetch64(s, off + 48), 42) * k1
        x ^= ws
        y ^= vf
        z = rotate(z ^ wf, 33)
        val v = weakHashLen32WithSeeds(s, off, vs * k1, x + wf)
        vf = v._1; vs = v._2
        val w = weakHashLen32WithSeeds(s, off + 32, z + ws, y)
        wf = w._1; ws = w._2
        val t = z; z = x; x = t
        off += 64
        i += 1
      }
      len -= 128
    }
    y += rotate(wf, 37) * k0 + z
    x += rotate(vf + z, 49) * k0
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + vs
      wf += fetch64(s, off + len - tailDone + 16)
      x = rotate(x, 49) * k0 + wf
      wf += vf
      val v = weakHashLen32WithSeeds(s, off + len - tailDone, vf, vs)
      vf = v._1; vs = v._2
    }
    x = hashLen16(x, vf)
    y = hashLen16(y, wf)
    // 1.0.2's final combine pairs (x + v.second) with w.FIRST — pairing
    // it with w.second here diverged from the reference for every input
    // ≥ 128 bytes (caught in review; the round-trip tests couldn't see
    // it because writer and reader shared the same combine)
    (hashLen16(x + vs, wf) + y, hashLen16(x + ws, y + vs))
  }

  def hash128WithSeed(
      s: Array[Byte], off: Int, len: Int, seedLo: Long, seedHi: Long): (Long, Long) =
    hash128WithSeedMem(s, AOff + off, len, seedLo, seedHi)

  /** CityHash128, 1.0.2 entry. Returns (low, high). */
  def hash128(s: Array[Byte], off: Int, len: Int): (Long, Long) = {
    val o = AOff + off
    if (len >= 16)
      hash128WithSeedMem(s, o + 16, len - 16, fetch64(s, o) ^ k3, fetch64(s, o + 8))
    else if (len >= 8)
      hash128WithSeedMem(Array.emptyByteArray, AOff, 0,
        fetch64(s, o) ^ (len * k0), fetch64(s, o + len - 8) ^ k1)
    else
      hash128WithSeedMem(s, o, len, k0, k1)
  }

  def hash128(s: Array[Byte]): (Long, Long) = hash128(s, 0, s.length)

  /** CityHash64 over `len` bytes of memory at `(s, off)` — `s` a byte
    * array with `Platform.BYTE_ARRAY_OFFSET`-based `off`, or an
    * `UnsafeRow` page base for in-place string hashing. */
  def hashMem(s: AnyRef, off: Long, len: Int): Long = {
    if (len <= 32) {
      if (len <= 16) hashLen0to16(s, off, len)
      else hashLen17to32(s, off, len)
    } else if (len <= 64) {
      hashLen33to64(s, off, len)
    } else {
      var x = fetch64(s, off)
      var y = fetch64(s, off + len - 16) ^ k1
      var z = fetch64(s, off + len - 56) ^ k0
      var v = weakHashLen32WithSeeds(s, off + len - 64, len.toLong, y)
      var w = weakHashLen32WithSeeds(s, off + len - 32, len.toLong * k1, k0)
      z += shiftMix(v._2) * k1
      x = rotate(z + x, 39) * k1
      y = rotate(y, 33) * k1

      var remaining = (len - 1) & ~63
      var pos = off
      while (remaining != 0) {
        x = rotate(x + y + v._1 + fetch64(s, pos + 16), 37) * k1
        y = rotate(y + v._2 + fetch64(s, pos + 48), 42) * k1
        x ^= w._2
        y ^= v._1
        z = rotate(z ^ w._1, 33)
        v = weakHashLen32WithSeeds(s, pos, v._2 * k1, x + w._1)
        w = weakHashLen32WithSeeds(s, pos + 32, z + w._2, y)
        val t = z; z = x; x = t
        pos += 64
        remaining -= 64
      }
      hashLen16(
        hashLen16(v._1, w._1) + shiftMix(y) * k1 + z,
        hashLen16(v._2, w._2) + x)
    }
  }

  /** CityHash64 over `len` bytes of `s` starting at `off`. */
  def hash64(s: Array[Byte], off: Int, len: Int): Long =
    hashMem(s, AOff + off, len)

  def hash64(s: Array[Byte]): Long = hashMem(s, AOff, s.length)

  // ---- fixed-width scalar encodings (little-endian, native width) ----
  // These mirror hashing the value's memory bytes, the way ClickHouse
  // hashes fixed-width column values. Widths ≤ 8 always land in
  // hashLen0to16, whose byte fetches reduce to shifts on the value
  // itself — the closed forms below are that reduction (pinned equal to
  // the byte-array form in CityHashSpec), with no buffer on the hot path.

  /** len=8 arm: fetch32(s) = low half, fetch32(s+4) = high half. */
  def hashLong(v: Long): Long =
    hashLen16(8L + ((v & 0xffffffffL) << 3), v >>> 32)

  /** len=4 arm: both fetch32 reads see the same four bytes. */
  def hashInt(v: Int): Long = {
    val u = v & 0xffffffffL
    hashLen16(4L + (u << 3), u)
  }

  /** len<4 arm: a = byte0, b = byte(len/2), c = byte(len-1). */
  def hashShort(v: Short): Long = {
    val b1 = (v >> 8) & 0xff
    val y = (v & 0xffffL) // byte0 + (byte1 << 8)
    val z = 2L + (b1 << 2)
    shiftMix(y * k2 ^ z * k3) * k2
  }

  def hashByte(v: Byte): Long = {
    val a = v & 0xff
    val y = (a + (a << 8)) & 0xffffffffL
    val z = (1 + (a << 2)) & 0xffffffffL
    shiftMix(y * k2 ^ z * k3) * k2
  }

  def hashBoolean(v: Boolean): Long = hashByte(if (v) 1 else 0)
  def hashDouble(v: Double): Long = hashLong(java.lang.Double.doubleToLongBits(v))
  def hashFloat(v: Float): Long = hashInt(java.lang.Float.floatToIntBits(v))

  /** Zero-copy: hashes the string's bytes in place (typically a slice of
    * an UnsafeRow page) — `getBytes` would copy every value. */
  def hashUTF8(s: org.apache.spark.unsafe.types.UTF8String): Long =
    hashMem(s.getBaseObject, s.getBaseOffset, s.numBytes)

  /** Left-to-right fold of per-argument hashes — matches ClickHouse's
    * multi-argument combine (Hash128to64 of the running pair). */
  def combine(h1: Long, h2: Long): Long = hash128to64(h1, h2)
}
