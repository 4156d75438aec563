package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CityHashSpec extends AnyFunSuite {

  private def h(s: String): Long = CityHash.hash64(s.getBytes("UTF-8"))

  test("empty string hashes to k2 (published CityHash64 fixed point)") {
    // CityHash64("") returns the k2 constant: 0x9ae16a3b2f90404f
    assert(h("") == java.lang.Long.parseUnsignedLong("9ae16a3b2f90404f", 16))
  }

  test("deterministic and offset-independent") {
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val padded = ("XX" + "the quick brown fox jumps over the lazy dog").getBytes("UTF-8")
    assert(CityHash.hash64(bytes) == CityHash.hash64(padded, 2, bytes.length))
  }

  test("every length class produces distinct, stable values") {
    // covers hashLen0to16 (0..16), hashLen17to32, hashLen33to64, long loop
    val lengths = Seq(0, 1, 2, 3, 4, 7, 8, 9, 16, 17, 31, 32, 33, 63, 64, 65, 127, 128, 200)
    val inputs = lengths.map(n => "a" * n)
    val hashes = inputs.map(h)
    assert(hashes.distinct.size == hashes.size, "collision across length classes")
    assert(inputs.map(h) == hashes, "not stable across calls")
  }

  test("single-byte difference avalanches") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rng.alphanumeric.take(1 + rng.nextInt(120)).mkString
      val a = h(s)
      val b = h(s.init + (if (s.last == 'x') 'y' else 'x'))
      // ~half the 64 bits should flip on average; loose per-sample bound
      assert(java.lang.Long.bitCount(a ^ b) > 8, s"weak avalanche for '$s'")
    }
  }

  test("fixed-width scalar encodings match their byte-array forms") {
    def le(v: Long, w: Int): Array[Byte] =
      (0 until w).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
    assert(CityHash.hashLong(42L) == CityHash.hash64(le(42L, 8)))
    assert(CityHash.hashInt(-7) == CityHash.hash64(le(-7L & 0xffffffffL, 4)))
    assert(CityHash.hashShort(300.toShort) == CityHash.hash64(le(300L, 2)))
    assert(CityHash.hashByte(9.toByte) == CityHash.hash64(le(9L, 1)))
    assert(CityHash.hashDouble(1.5) ==
      CityHash.hash64(le(java.lang.Double.doubleToLongBits(1.5), 8)))
  }

  test("combine is order-sensitive (CH Hash128to64 fold)") {
    val a = h("alpha"); val b = h("beta")
    assert(CityHash.combine(a, b) != CityHash.combine(b, a))
  }

  test("hash128: every length arm is deterministic, avalanches, and arms differ") {
    // exercise all code paths: <8, 8..15, 16..127+16 (CityMurmur),
    // >=144 (main loop with 0/1/2+ tail chunks), multi-256 blocks
    val lengths = Seq(0, 1, 5, 7, 8, 9, 15, 16, 17, 31, 64, 127, 143,
      144, 145, 175, 207, 271, 400, 1000)
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    lengths.foreach { n =>
      val bytes = Array.tabulate(n)(i => ((i * 131 + 7) & 0xff).toByte)
      val once = CityHash.hash128(bytes)
      assert(once == CityHash.hash128(bytes), s"non-deterministic at len $n")
      assert(seen.add(once), s"collision across lengths at len $n")
      if (n > 0) {
        // single-bit flip changes both halves with high probability
        val flipped = bytes.clone(); flipped(n / 2) = (flipped(n / 2) ^ 1).toByte
        val other = CityHash.hash128(flipped)
        assert(other != once, s"no avalanche at len $n")
        assert(java.lang.Long.bitCount(once._1 ^ other._1) +
          java.lang.Long.bitCount(once._2 ^ other._2) > 16,
          s"weak 128-bit avalanche at len $n")
      }
    }
    // offset reads hash the same bytes the same way
    val buf = Array.tabulate(300)(i => (i & 0xff).toByte)
    assert(CityHash.hash128(buf, 37, 200) ==
      CityHash.hash128(java.util.Arrays.copyOfRange(buf, 37, 237)))
  }
}
