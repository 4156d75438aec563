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
}
