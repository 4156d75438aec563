package graft.functions

/** SipHash-2-4 with the zero key — the algorithm behind ClickHouse's
  * `sipHash64` SQL function (CH's default sharding/sampling hash; the
  * keyed variant is `sipHash64Keyed`, not surfaced here). Port of the
  * public reference algorithm (Aumasson & Bernstein, the SipHash paper
  * / github.com/veorq/SipHash); the implementation was validated
  * against the paper's canonical key-0x000102…0f vector table before
  * the zero-key goldens in ChFunctionsSpec were generated from it.
  *
  * Byte conventions mirror [[CityHash]]/[[XxHash]]: little-endian
  * fixed-width numerics, raw bytes for strings/binary.
  */
object SipHash {

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

  /** SipHash-2-4 of `b` with k0 = k1 = 0. The state is carried in four
    * locals; rounds are inlined (no per-call allocation). */
  def hash64(b: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L
    var v1 = 0x646f72616e646f6dL
    var v2 = 0x6c7967656e657261L
    var v3 = 0x7465646279746573L

    // one SipRound, inlined over the four state vars
    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = b.length
    var i = 0
    while (i + 8 <= n) {
      val m = fetch64(b, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    // final word: remaining bytes little-endian, length in the top byte
    var last = (n & 0xffL) << 56
    var shift = 0
    while (i < n) {
      last |= (b(i) & 0xffL) << shift
      shift += 8; i += 1
    }
    v3 ^= last; round(); round(); v0 ^= last
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** Hash for SQL NULL: the empty-byte-string hash, the same documented
    * choice as [[CityHash.NullHash]]. */
  val NullHash: Long = hash64(Array.emptyByteArray)

  // fixed-width entry points (little-endian value bytes, no allocation
  // beyond the scratch array — SipHash's chained state has no cheap
  // per-width specialization like XXH's tail steps)
  private def fixed(v: Long, width: Int): Long = {
    val b = new Array[Byte](width)
    var i = 0
    while (i < width) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hash64(b)
  }
  def hashLong(v: Long): Long = fixed(v, 8)
  def hashInt(v: Int): Long = fixed(v & 0xffffffffL, 4)
  def hashShort(v: Short): Long = fixed(v & 0xffffL, 2)
  def hashByte(v: Byte): Long = fixed(v & 0xffL, 1)
  def hashBoolean(v: Boolean): Long = fixed(if (v) 1L else 0L, 1)
  def hashDouble(v: Double): Long = fixed(java.lang.Double.doubleToLongBits(v), 8)
  def hashFloat(v: Float): Long = fixed(java.lang.Float.floatToIntBits(v) & 0xffffffffL, 4)
  def hashUTF8(s: org.apache.spark.unsafe.types.UTF8String): Long = hash64(s.getBytes)
}
