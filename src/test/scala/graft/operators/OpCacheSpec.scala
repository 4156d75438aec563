package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Advisor r7: operator-internal persists (tfidf/bm25/lexical cosine/
  * cross-corpus dedup) accumulated cache entries indefinitely in a
  * long-lived session. They now register in [[OpCache]]; `releaseAll`
  * is the session-maintenance seam. */
class OpCacheSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("operator-internal persists register and releaseAll drops them") {
    val spark2 = spark
    import spark2.implicits._
    OpCache.releaseAll()
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta delta"), (3L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    val before = OpCache.trackedCount
    // r19/r20: tfidf/bm25/minHashDupPairs/simHashDupPairs/
    // ngramJaccardPairs/lexicalCosinePairs materialize through reused
    // exchanges instead of internal persists; the operators that still
    // persist corpus-derived state are the cross-corpus family
    graft.operators.BloomDedup.antiJoinAgainst(
      docs, docs.filter($"doc_id" === 1L), "text").count()
    Dedup.crossCorpusDupPairs(
      docs.filter($"doc_id" === 3L), "doc_id", "text",
      Dedup.minHashState(docs, "doc_id", "text")).count()
    assert(OpCache.trackedCount >= before + 2)
    // the persisted intermediates hold real cache entries…
    assert(!spark.sharedState.cacheManager.isEmpty)
    OpCache.releaseAll()
    assert(OpCache.trackedCount == 0)
    // …and the sweep leaves no operator-internal entries behind
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
