package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Tiny corpus with two tight semantic groups and noise: vectors 0/1
    * near-identical, 2/3 near-identical, 4..7 scattered. */
  private def corpus = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Array(0.99f, 0.1f, 0.0f, 0.0f),
      2L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      3L -> Array(0.05f, 0.99f, 0.0f, 0.0f),
      4L -> Array(0.0f, 0.0f, 1.0f, 0.0f),
      5L -> Array(0.0f, 0.0f, 0.0f, 1.0f),
      6L -> Array(0.5f, 0.5f, 0.5f, 0.5f),
      7L -> Array(-1.0f, 0.0f, 0.0f, 0.0f)
    ).toDF("vec_id", "embedding")
  }

  test("k=1 degenerates to the exact all-pairs baseline") {
    val got = SemDedup.dupPairs(corpus, "vec_id", "embedding",
        k = 1, dim = 4, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (2L, 3L)))
  }

  test("clustered pairs are a subset of the exact pairs, and find in-cluster dups") {
    val exact = SemDedup.dupPairs(corpus, "vec_id", "embedding",
        k = 1, dim = 4, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = SemDedup.dupPairs(corpus, "vec_id", "embedding",
        k = 4, dim = 4, threshold = 0.95, iters = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.subsetOf(exact), s"$clustered not in $exact")
    // seeds 0..3 put each dup pair's members nearest their own seed
    assert(clustered == exact)
  }

  test("survivors keep the min id per duplicate set plus unpaired vectors") {
    // iters=1: Lloyd refinement pulls each dup pair into one cluster
    // (iters=0 seeds ARE vectors 0..3, splitting the pairs by design)
    val got = SemDedup.survivors(corpus, "vec_id", "embedding",
        k = 4, dim = 4, threshold = 0.95, iters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 2L, 4L, 5L, 6L, 7L))
  }

  test("the cluster self-join is keyed, never a cartesian product") {
    val df = SemDedup.dupPairs(corpus, "vec_id", "embedding",
      k = 4, dim = 4, threshold = 0.95, iters = 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"semantic dedup join must key on _cluster:\n$plan")
  }
}
