package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): k-means-cluster the embedding
  * corpus, then compare pairs ONLY within a cluster — semantically
  * near-identical documents land in the same cluster, so the quadratic
  * work is bounded by the largest cluster, never the corpus.
  *
  * Scale posture (the published method's whole point): the
  * cluster-keyed equi-join shuffles each vector once on `_cluster` and
  * compares |C|² per cluster instead of n² overall — with k clusters of
  * even size that is n²/k comparisons, and k is chosen to make the
  * per-cluster work tractable (SemDeDup used 50k clusters at web
  * scale). Assignment itself is one codegen'd argmin pass per row
  * ([[Ivf.assign]]); the assigned frame is persisted so the self-join
  * reads cached blocks, never re-scans the corpus. `k = 1` degenerates
  * to the exact all-pairs baseline (every vector in one cluster) — the
  * declared oracle anchor, same role as [[Dedup]]'s exact-Jaccard
  * verify stage.
  *
  * As with any clustered ANN, cross-cluster near-dups are missed by
  * construction (boundary pairs); raise `k`-quality with more Lloyd
  * `iters`, or run the banded [[Similarity.lshNeighbors]] when recall
  * across cluster boundaries matters more than the n²/k bound.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs `(id_a, id_b, cos)` with
    * `cos ≥ threshold`, `id_a < id_b`. `iters = 0` keeps the
    * deterministic seed centroids (the lowest-`k` ids' vectors) —
    * engine-portable assignment, used by the oracle query. */
  def dupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      threshold: Double,
      iters: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ExchangeReuse.warnIfDisabled(emb.sparkSession)
    val assigned =
      if (k == 1)
        emb.select(col(idCol).as("_id"), col(vecCol).as("_vec"),
          lit(0).as("_cluster"))
      else Ivf.assign(emb, idCol, vecCol,
        Ivf.trainCentroids(emb, idCol, vecCol, k, dim, iters))
    // One hash exchange on _cluster materializes the assignment (r19
    // optimization round): both self-join sides need exactly that
    // distribution, so exchange reuse serves them from one shuffle —
    // the corpus is scanned and assigned once per action, with no cache
    // stages and no second shuffle of the vectors.
    val st = assigned.repartition(col("_cluster"))
    // shuffle-hash both sides: cluster-sized partitions, never broadcast
    st.as("a")
      .join(st.as("b").hint("shuffle_hash"),
        col("a._cluster") === col("b._cluster") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        Similarity.cosine(col("a._vec"), col("b._vec")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Survivors after semantic dedup: connected components over the
    * within-cluster pair graph, smallest id per component survives
    * (plus every unpaired vector). */
  def survivors(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      threshold: Double,
      iters: Int = 2): DataFrame =
    Dedup.nearDupSurvivors(emb, idCol,
      dupPairs(emb, idCol, vecCol, k, dim, threshold, iters)
        .select(col("id_a"), col("id_b")))
}
