package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "banana cherry cherry date"),
    (2L, "apple apple apple"),
    (3L, "date egg")
  ).toDF("id", "text")

  test("tfidf: hand-computed scores, df counts documents not occurrences") {
    val r = Retrieval.tfidf(corpus, "id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    // apple: df=2 (docs 0,2) even though 4 occurrences
    assert(r((0L, "apple"))._1 == 2 && r((0L, "apple"))._2 == 2)
    assert(r((2L, "apple"))._1 == 3)
    // tfidf = tf * ln(N/df), N=4
    assert(math.abs(r((0L, "apple"))._3 - 2 * math.log(4.0 / 2)) < 1e-12)
    assert(math.abs(r((3L, "egg"))._3 - 1 * math.log(4.0 / 1)) < 1e-12)
    // a term present in every doc scores zero
    val all = Retrieval.tfidf(
      Seq((0L, "x a"), (1L, "x b")).toDF("id", "text"), "id", "text")
      .filter(col("term") === "x").select("tfidf").as[Double].collect()
    assert(all.forall(v => math.abs(v) < 1e-12))
  }

  test("bm25: hand-computed single-term score; misses drop out") {
    val r = Retrieval.bm25(corpus, "id", "text", Seq("apple"), k1 = 1.2, b = 0.75)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r.keySet == Set(0L, 2L)) // docs 1,3 have no query term
    val n = 4.0; val df = 2.0
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    val avgdl = (4 + 4 + 3 + 2) / 4.0
    def w(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + (dl / avgdl * 0.75 + 0.25) * 1.2)
    assert(math.abs(r(0L)._2 - w(2, 4)) < 1e-12)
    assert(math.abs(r(2L)._2 - w(3, 3)) < 1e-12)
    // higher tf with equal length wins
    assert(r(2L)._2 > r(0L)._2)
  }

  test("bm25: longer doc with same tf is penalized (b) and k1 saturates tf") {
    val docs = Seq(
      (0L, "hit filler filler filler filler filler filler filler"),
      (1L, "hit pad")).toDF("id", "text")
    val r = Retrieval.bm25(docs, "id", "text", Seq("hit"))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) > r(0L))
  }

  test("rrfFuse: ranks per query, tie-break by id, missing side contributes 0") {
    val a = Seq((0L, 10L, 5.0), (0L, 11L, 3.0), (0L, 12L, 3.0)).toDF("q", "d", "s")
    val b = Seq((0L, 11L, 9.0), (0L, 13L, 1.0)).toDF("q", "d", "s")
    val r = Retrieval.rrfFuse(a, b, "q", "d", "s", k = 60)
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(math.abs(r(10L) - 1.0 / 61) < 1e-15)           // rank 1 in a only
    assert(math.abs(r(11L) - (1.0 / 62 + 1.0 / 61)) < 1e-15) // a rank 2 (ties → id), b rank 1
    assert(math.abs(r(12L) - 1.0 / 63) < 1e-15)           // tie loses to 11 on id
    assert(math.abs(r(13L) - 1.0 / 62) < 1e-15)           // b only
    // fused order: doc in both lists dominates
    assert(r(11L) > r(10L))
  }

  test("lexicalCosinePairs: identical docs hit cos 1, disjoint docs never pair, df pruning works") {
    val docs = Seq(
      (0L, "rare unique words here"),
      (1L, "rare unique words here"),     // identical to 0 → cos 1
      (2L, "completely different tokens entirely"),
      (3L, "stop stop stop stop")          // only the common term
    ).toDF("id", "text")
    val pairs = Retrieval.lexicalCosinePairs(docs, "id", "text",
      minCosine = 0.5, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set((0L, 1L)))
    assert(math.abs(pairs((0L, 1L)) - 1.0) < 1e-12)
    // pruning every term (maxDf = 0) yields no vectors and no pairs
    assert(Retrieval.lexicalCosinePairs(docs, "id", "text", 0.0, 0L).count() == 0)
  }

  test("rrfFuse partitions by query: same doc ranks independently per query") {
    val a = Seq((0L, 1L, 1.0), (9L, 1L, 1.0), (9L, 2L, 2.0)).toDF("q", "d", "s")
    val b = spark.emptyDataset[(Long, Long, Double)].toDF("q", "d", "s")
    val r = Retrieval.rrfFuse(a, b, "q", "d", "s", k = 60)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(math.abs(r((0L, 1L)) - 1.0 / 61) < 1e-15) // rank 1 in its own query
    assert(math.abs(r((9L, 1L)) - 1.0 / 62) < 1e-15) // rank 2 behind score 2.0
  }

  test("bm25 wide-query fallback scores identically to the one-pass path") {
    val narrow = Retrieval.bm25(corpus, "id", "text", Seq("apple", "date"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // pad the query bag past the tf-column cap with misses: scores of
    // the real terms must not move, path switch included
    val wideTerms = Seq("apple", "date") ++ (1 to 70).map(i => s"zz_miss_$i")
    val wide = Retrieval.bm25(corpus, "id", "text", wideTerms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(wide.keySet == narrow.keySet)
    narrow.foreach { case (id, (nHit, score)) =>
      assert(wide(id)._1 == nHit, s"doc $id n_hit_terms")
      assert(math.abs(wide(id)._2 - score) < 1e-9, s"doc $id score") }
  }

  test("bm25 excludes NULL-text rows from N and avgdl on both paths") {
    val withNulls = corpus.union(
      Seq((8L, null.asInstanceOf[String]), (9L, null.asInstanceOf[String]))
        .toDF("id", "text"))
    def scores(terms: Seq[String]) =
      Retrieval.bm25(withNulls, "id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val clean = Retrieval.bm25(corpus, "id", "text", Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(Seq("apple")) == clean)
    val wideTerms = Seq("apple") ++ (1 to 70).map(i => s"zz_$i")
    assert(scores(wideTerms).keySet == clean.keySet)
    scores(wideTerms).foreach { case (id, s) =>
      assert(math.abs(s - clean(id)) < 1e-9) }
  }
}
