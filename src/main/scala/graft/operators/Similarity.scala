package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FunctionShim
import graft.functions.{CosineSimExpr, HyperplaneSigExpr, VectorKernels}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers (builder-prompt requirement):
  *   - brute-force cosine top-k — the exact baseline; a broadcast join
  *     of the (small) query set against the corpus, so the corpus is
  *     scanned once, embarrassingly parallel, no shuffle except the
  *     final per-query top-k (`Window` + filter ≈
  *     `TakeOrderedAndProject` per group);
  *   - LSH-bucketed ANN (random-hyperplane signs) — the 100 TB path:
  *     each vector lands in 2^`planes` buckets' worth of key space; the
  *     candidate join keys on the bucket signature, so cost tracks
  *     collisions, not n². Multi-probe (flip one bit) widens recall
  *     without widening the join.
  *
  * Hot-path vector math (cosine, LSH signatures) runs as native
  * codegen'd Catalyst expressions ([[graft.functions.CosineSimExpr]],
  * [[graft.functions.HyperplaneSigExpr]]) — single fused pass per row,
  * no boxing, no interpreted lambdas, no UDFs. Cold-path shaping
  * (normalize, quantize, pooling) stays on built-in functions.
  */
object Similarity {

  /** Dot product of two float-array columns (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — a native codegen'd expression
    * ([[graft.functions.CosineSimExpr]]): one fused pass computes dot
    * and both norms, instead of three interpreted
    * `zip_with`+`aggregate` folds per row. Bit-exact with the HOF
    * formulation it replaced (float×float products stay in float, the
    * accumulation runs in double, left to right). */
  def cosine(a: Column, b: Column): Column =
    FunctionShim.column(CosineSimExpr(
      FunctionShim.expression(a), FunctionShim.expression(b)))

  /** L2-normalize a vector column into `outCol` (unit vectors; zero
    * vectors pass through unchanged, in double). The norm is staged in
    * its own column so it is computed ONCE per row — a naive
    * `transform(v, x => x / norm(v))` embeds the norm expression per
    * element, O(d²) work per row. */
  def l2Normalize(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    // widen BEFORE squaring: float*float runs in float precision and
    // the accumulated error is visible at 1e-6 scale
    df.withColumn("_l2n",
        norm(transform(col(vecCol), x => x.cast("double"))))
      .withColumn(outCol,
        when(col("_l2n") === 0d, transform(col(vecCol), x => x.cast("double")))
          .otherwise(transform(col(vecCol), x => x.cast("double") / col("_l2n"))))
      .drop("_l2n")

  /** Symmetric per-vector int8 quantization — the storage/transfer
    * contract for embedding corpora (4× smaller than float32, dot
    * products stay rank-faithful): scale = 127/max(|x|), elements
    * round(x·scale) ∈ [-127, 127], plus the `<out>_scale` column needed
    * to dequantize (`q/scale`). Zero vectors quantize to zeros with
    * scale 0. Scan-stage, no shuffle. */
  def quantizeInt8(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_amax",
        array_max(transform(col(vecCol), x => abs(x))).cast("double"))
      .withColumn(outCol,
        when(col("_amax") === 0d, transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") * lit(127d) / col("_amax")).cast("int"))))
      .withColumn(s"${outCol}_scale",
        when(col("_amax") === 0d, lit(0d)).otherwise(lit(127d) / col("_amax")))
      .drop("_amax")

  /** Exact top-k cosine neighbors for the given query ids.
    *
    * The query side is tiny by construction → broadcast; the corpus side
    * streams through once. Ranking is per-query (`Window`), with a
    * deterministic (similarity DESC, neighbor id ASC) tie-break.
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    val queries = emb
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val corpus = emb.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = corpus
      .join(broadcast(queries), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosine(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  /** Element-wise mean of an embedding column per group — the pooling
    * primitive behind centroid building and cluster summaries. One
    * posexplode → codegen'd avg: a single shuffle on (group, dim),
    * map-side combined, linear in corpus × dim at any scale. Returns
    * (_g, _d, _m) rows — pivot back to arrays with
    * `collect_list` over a (dim, mean) sort if an array shape is
    * needed downstream. */
  def meanVector(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("_g"), posexplode(col(vecCol)).as(Seq("_d", "_x")))
      .groupBy("_g", "_d").agg(avg("_x").as("_m"))

  /** Deterministic hyperplane components, computed once on the driver
    * (seeded per (plane, dim) — reproducible across runs, and the
    * executors see plain literals instead of per-element hash
    * expressions). */
  private[operators] def hyperplane(pIdx: Int, dim: Int): Array[Double] =
    VectorKernels.hyperplane(pIdx, dim)

  /** Random-hyperplane signature: `planes` sign bits packed into a
    * long — a native codegen'd expression
    * ([[graft.functions.HyperplaneSigExpr]]) advancing all plane dot
    * products in ONE pass over the vector, with the hyperplane matrix
    * shipped once per task instead of `planes` literal arrays in the
    * plan. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column =
    FunctionShim.column(HyperplaneSigExpr(FunctionShim.expression(vec), planes, dim))

  /** ANN near-dup / neighbor candidates via LSH buckets, verified with
    * exact cosine. Multi-probe: each vector is also registered in every
    * bucket at Hamming distance 1, trading `planes`× duplication for
    * recall — still linear, never all-pairs.
    *
    * The signature projection materializes through one `_id` exchange
    * shared by both self-join sides (exchange reuse): the corpus is
    * scanned once per action, the `planes`×`dim` dot products run once
    * per vector (not once per side), and no serialized cache stages
    * are paid (r19 optimization round). */
  def lshNeighbors(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 12,
      dim: Int = 64,
      minCosine: Double = 0.9): DataFrame = {
    ExchangeReuse.warnIfDisabled(emb.sparkSession)
    // One hash exchange on _id materializes the signed corpus (r19
    // optimization round): the probe side and the bucket side share the
    // shuffle via exchange reuse, so the corpus is scanned and the
    // planes×dim dot products run once per action — the former persist
    // pinned the same property but paid serialized cache stages.
    val sig = emb.select(
        col(idCol).as("_id"), col(vecCol).as("_vec"),
        lshSignature(col(vecCol), planes, dim).as("_sig"))
      .repartition(col("_id"))
    // probe buckets: own signature + one-bit flips
    val probes = sig.select(
      col("_id"), col("_vec"), col("_sig"),
      explode(concat(
        array(col("_sig")),
        transform(sequence(lit(0), lit(planes - 1)),
          i => col("_sig").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("_bucket"))
    val left = probes.select(col("_id").as("id_a"), col("_vec").as("vec_a"), col("_bucket"))
    // corpus-sized embedding vectors: shuffle on the bucket key, never
    // build a broadcast of the whole corpus
    val right = sig.select(col("_id").as("id_b"), col("_vec").as("vec_b"), col("_sig").as("_bucket"))
      .hint("shuffle_hash")
    left.join(right, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= minCosine)
  }
}
