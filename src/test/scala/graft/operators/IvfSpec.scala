package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("centroid training is deterministic and returns k × dim") {
    val c1 = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 4, dim = 64, iters = 1)
    val c2 = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 4, dim = 64, iters = 1)
    assert(c1 == c2)
    assert(c1.length == 4 && c1.forall(_.length == 64))
  }

  test("assignment covers every vector exactly once") {
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 4, dim = 64)
    val idx = Ivf.assign(emb, "vec_id", "embedding", cents)
    assert(idx.count() == emb.count())
    val clusters = idx.groupBy("_cluster").count().collect()
    assert(clusters.map(_.getLong(1)).sum == emb.count())
  }

  test("full-probe IVF equals brute force; reduced probes keep decent recall") {
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 4, dim = 64)
    val idx = Ivf.assign(emb, "vec_id", "embedding", cents)
    val qids = Seq(0L, 1L, 2L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // probing every cluster must reproduce the exact answer
    val full = Ivf.topK(idx, cents, qids, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2))).toSet
    assert(full == brute)
    // probing half the clusters: recall over the true top-5 ≥ 50%
    val half = Ivf.topK(idx, cents, qids, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bruteIds = brute.map(t => (t._1, t._3))
    val recall = bruteIds.count(half.contains).toDouble / bruteIds.size
    assert(recall >= 0.5, s"nprobe=2 recall too low: $recall")
  }

  test("probe search never self-joins the corpus (no cartesian)") {
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 4, dim = 64)
    val idx = Ivf.assign(emb, "vec_id", "embedding", cents)
    val plan = Ivf.topK(idx, cents, Seq(0L), k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("saved index round-trips: loaded topK equals fresh; layout prunes by cluster") {
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 4, dim = 64)
    val idx = Ivf.assign(emb, "vec_id", "embedding", cents)
    val path = "/tmp/graft_ivf_index_spec"
    Ivf.saveIndex(idx, cents, path)
    val (loaded, loadedCents) = Ivf.loadIndex(spark, path)
    assert(loadedCents == cents)
    val qids = Seq(0L, 1L, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(Ivf.topK(loaded, loadedCents, qids, k = 5, nprobe = 4)) ==
      rows(Ivf.topK(idx, cents, qids, k = 5, nprobe = 4)))
    // the on-disk layout is partitioned by cluster: a single-cluster scan
    // prunes at the partition level (reads nprobe/k of the FILES)
    val plan = loaded.filter(org.apache.spark.sql.functions.col("_cluster") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(_cluster_") ||
      plan.contains("PartitionFilters: [isnotnull(_cluster"),
      s"cluster filter must prune partitions:\n$plan")
  }
}
