package graft.operators

import java.text.Normalizer

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.UnicodeNorm

/** Property-style tests for the round-6 operators — driver-side
  * kernels and threshold math exercised over seeded-random inputs (the
  * DataFrame paths have their own specs; these pin the pure functions
  * they lean on). Seeded, so failures reproduce. */
class OperatorPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hexThreshold is monotone in fraction and always fixed-width-comparable") {
    val rnd = new Random(42)
    val fracs = Seq(0.0, 1.0, 0.5) ++ (1 to 200).map(_ => rnd.nextDouble())
    for (a <- fracs; b <- Seq(rnd.nextDouble(), 1.0 - a)) {
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val tl = Sampling.hexThreshold(lo)
      val th = Sampling.hexThreshold(hi)
      // lexicographic order must agree with numeric order for any pair
      assert(tl <= th, s"$lo -> $tl vs $hi -> $th")
      assert(tl == "g" ||
        (tl.length == 6 && tl.forall(c => c.isDigit || ('a' to 'f').contains(c))), tl)
    }
  }

  test("bloom filter never false-negatives over random key sets") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(200)
      val keys = (1 to n).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString)
        .distinct
      val ref = keys.toDF("k")
      val mBits = math.max(64L, keys.size.toLong * 10)
      val bits = BloomDedup.buildBits(ref, "k", k = 7, mBits = mBits)
      val misses = ref.filter(
        !BloomDedup.mightContain(org.apache.spark.sql.functions.col("k"), bits, 7, mBits))
        .count()
      assert(misses == 0, s"trial $trial: inserted key tested negative")
    }
  }

  test("hashSample and mixture run unchanged on a streaming DataFrame") {
    // scan-stage predicates must be batch/stream unified: the same
    // operator samples an unbounded ingest without modification
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData((1 to 200).map(i => (i.toLong, s"stream doc $i")): _*)
    val sampled = Sampling.hashSample(
      mem.toDF.toDF("id", "text"), "text", 0.3)
    val q = sampled.writeStream.format("memory").queryName("prop_sample_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("prop_sample_out").select("id").as[Long].collect().toSet
    val batch = Sampling.hashSample(
      (1 to 200).map(i => (i.toLong, s"stream doc $i")).toDF("id", "text"), "text", 0.3)
      .select("id").as[Long].collect().toSet
    assert(got == batch, "stream sample diverged from batch sample")
    assert(got.nonEmpty && got.size < 200)
  }

  test("UnicodeNorm kernels are idempotent and agree with java.text.Normalizer") {
    val rnd = new Random(13)
    val alphabet = "abcXYZ019 é́ﬁ①ß中"
    val samples = Seq("", "plain", "Café", "Café") ++
      (1 to 300).map(_ =>
        (1 to rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (s <- samples) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      for ((f, form) <- Seq[(org.apache.spark.unsafe.types.UTF8String => org.apache.spark.unsafe.types.UTF8String, Normalizer.Form)](
          UnicodeNorm.nfc _ -> Normalizer.Form.NFC,
          UnicodeNorm.nfd _ -> Normalizer.Form.NFD,
          UnicodeNorm.nfkc _ -> Normalizer.Form.NFKC,
          UnicodeNorm.nfkd _ -> Normalizer.Form.NFKD)) {
        val once = f(u)
        assert(once.toString == Normalizer.normalize(s, form),
          s"'$s' (${s.map(_.toInt.toHexString)}) under $form")
        assert(f(once).toString == once.toString, s"not idempotent on '$s' under $form")
      }
    }
  }
}
