package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter has no false negatives") {
    val ref = (0 until 300).map(i => s"key_$i").toDF("k")
    val mBits = 300L * 10
    val bits = BloomDedup.buildBits(ref, "k", k = 7, mBits = mBits)
    val misses = ref
      .filter(!BloomDedup.mightContain(col("k"), bits, 7, mBits))
      .count()
    assert(misses == 0, "a key inserted into the filter tested negative")
  }

  test("bloom filter rejects most absent keys (fp rate sane)") {
    val ref = (0 until 300).map(i => s"key_$i").toDF("k")
    val absent = (1000 until 2000).map(i => s"other_$i").toDF("k")
    val mBits = 300L * 10
    val bits = BloomDedup.buildBits(ref, "k", k = 7, mBits = mBits)
    val fp = absent
      .filter(BloomDedup.mightContain(col("k"), bits, 7, mBits))
      .count()
    // theoretical fp ≈ 0.8% at 10 bits/key k=7; 1000 probes → expect ~8
    assert(fp < 100, s"false-positive rate implausibly high: $fp/1000")
  }

  test("antiJoinAgainst is exact: equals the plain anti-join") {
    // overlap: new corpus shares 40 of its 150 texts with the reference
    val ref = (0 until 100).map(i => (i.toLong, s"text_$i")).toDF("id", "text")
    val next = (60 until 210).map(i => (i.toLong + 1000, s"text_$i")).toDF("id", "text")
    val got = BloomDedup.antiJoinAgainst(next, ref, "text")
      .select("id").as[Long].collect().sorted
    val want = next.join(ref.select("text"), Seq("text"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.length == 110) // 150 − 40 overlapping
  }

  test("definitely-new branch is shuffle-free (bloom prunes at scan)") {
    val ref = (0 until 50).map(i => s"t$i").toDF("text")
    val next = (0 until 200).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val mBits = 64L * 10
    val bits = BloomDedup.buildBits(ref, "text", 7, mBits)
    val plan = next.filter(!BloomDedup.mightContain(col("text"), bits, 7, mBits))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
