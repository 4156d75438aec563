package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN ([[Pq]]): the lossless-anchor contract
  * (every distinct subvector among the seeds + iters=0 → ADC equals the
  * exact distance, so PQ top-k equals brute force), recall under real
  * lossy compression with Lloyd-refined codebooks, and the ADC kernel's
  * refusal posture. */
class PqSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def exactTopK(
      vecs: Map[Long, Seq[Double]], qid: Long, k: Int): Seq[Long] =
    vecs.toSeq.filter(_._1 != qid)
      .map { case (id, v) => (l2sq(vecs(qid), v), id) }
      .sortBy(identity).take(k).map(_._2)

  test("lossless anchor: all distinct subvectors among the seeds → PQ top-k == exact top-k") {
    // dim 8, m 2: subvectors drawn from 4 patterns per subspace, all of
    // which appear among the first k=8 ids — encoding is lossless, ADC
    // distances are exact
    val pats = Seq(
      Seq(0.0, 0.0, 0.0, 1.0), Seq(1.0, 2.0, 0.0, 0.0),
      Seq(3.0, 1.0, 4.0, 1.0), Seq(5.0, 9.0, 2.0, 6.0))
    val vecs: Map[Long, Seq[Double]] = (0L until 40L).map { i =>
      // first 8 ids enumerate more than every (left, right) pattern pair
      i -> (pats((i % 4).toInt) ++ pats(((i / 2) % 4).toInt))
    }.toMap
    val df = vecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("id", "vec")
    val cb = Pq.trainCodebooks(df, "id", "vec", m = 2, k = 8, dim = 8, iters = 0)
    assert(cb.books.forall(_.size == 8))
    val got = Pq.searchTopK(df, "id", "vec", cb, queryIds = Seq(5L, 11L), k = 5)
      .orderBy("qid", "rank").collect()
    Seq(5L, 11L).foreach { q =>
      val mine = got.filter(_.getLong(0) == q).sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      val want = exactTopK(vecs, q, 5)
      // many vectors duplicate → distances tie; compare DISTANCES, and
      // ids where the exact distances are strict
      val wantD = want.map(id => l2sq(vecs(q), vecs(id)))
      val gotD = got.filter(_.getLong(0) == q).sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(gotD == wantD, s"query $q: ADC distances diverge from exact")
      assert(mine.toSet.subsetOf(vecs.keySet))
    }
  }

  test("refined codebooks keep high recall on clustered data") {
    val rnd = new scala.util.Random(42)
    val centers = (0 until 5).map(_ => Seq.fill(16)(rnd.nextDouble() * 10))
    val vecs: Map[Long, Seq[Double]] = (0L until 200L).map { i =>
      val c = centers((i % 5).toInt)
      i -> c.map(x => x + rnd.nextGaussian() * 0.3)
    }.toMap
    val df = vecs.toSeq.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("id", "vec")
    val cb = Pq.trainCodebooks(df, "id", "vec", m = 4, k = 16, dim = 16, iters = 3)
    val qids = Seq(3L, 77L, 142L)
    // the standard PQ metric is recall@R — the true top-10 recovered
    // within a WIDER shortlist (rerank-with-exact-distances is the
    // production second stage); quantized codes cannot order the fine
    // structure inside a tight cluster at 16× compression
    val got = Pq.searchTopK(df, "id", "vec", cb, qids, k = 40).collect()
    val recalls = qids.map { q =>
      val mine = got.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
      val want = exactTopK(vecs, q, 10).toSet
      mine.intersect(want).size.toDouble / want.size
    }
    assert(recalls.forall(_ >= 0.7), s"top-10-in-top-40 recall too low: $recalls")
    // Lloyd refinement must beat raw seeds on the same metric
    val cb0 = Pq.trainCodebooks(df, "id", "vec", m = 4, k = 16, dim = 16, iters = 0)
    val got0 = Pq.searchTopK(df, "id", "vec", cb0, qids, k = 40).collect()
    val recalls0 = qids.map { q =>
      val mine = got0.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
      val want = exactTopK(vecs, q, 10).toSet
      mine.intersect(want).size.toDouble / want.size
    }
    assert(recalls.sum >= recalls0.sum,
      s"refinement degraded recall: $recalls0 -> $recalls")
    // float32 embeddings at m=4 → 4 int codes per vector: the index
    // column is what a 100 TB search scans, not the vectors
    val encoded = Pq.encode(df, "vec", cb)
    assert(encoded.select("_pq").head().getSeq[Int](0).size == 4)
  }

  test("search plan: queries broadcast, the corpus code scan never shuffles before ranking") {
    val df = (0L until 50L).map(i => (i, Seq.fill(8)((i % 7).toFloat))).toDF("id", "vec")
    val cb = Pq.trainCodebooks(df, "id", "vec", m = 2, k = 4, dim = 8)
    val plan = Pq.searchTopK(df, "id", "vec", cb, Seq(1L), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    // the only Exchange beyond the query broadcast is the per-query
    // top-k window partitioning
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus must not shuffle into the join:\n$plan")
  }

  test("ADC kernel refuses out-of-range codes instead of mis-ranking") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.FunctionShim
    val df = Seq((Seq(0, 7), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))).toDF("codes", "tab")
    val dist = FunctionShim.column(graft.functions.PqAdcExpr(
      FunctionShim.expression(col("codes")), FunctionShim.expression(col("tab"))))
    val e = intercept[Exception] { df.select(dist).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("outside the subspace")))
    // in-range codes sum the addressed cells
    val ok = Seq((Seq(1, 0), Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))).toDF("codes", "tab")
    assert(ok.select(dist.as("d")).head().getDouble(0) == 5.0)
  }
}
