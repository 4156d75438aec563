package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FunctionShim
import graft.functions.{NearestCentroidExpr, PqAdcExpr}

/** Product-quantization ANN (Jégou, Douze, Schmid — "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the
  * memory-bound scale path for similarity search, complementing the
  * hyperplane-LSH ([[Similarity]]) and IVF ([[Ivf]]) tiers.
  *
  *   - TRAIN: the vector space splits into `m` subspaces of `dim/m`
  *     dimensions; each subspace gets a `k`-centroid codebook. Seeds
  *     are the lowest-`k` ids' subvectors (deterministic, no driver
  *     randomness — the [[Ivf]] convention), refined by `iters` Lloyd
  *     passes. ONE corpus scan per iteration advances ALL `m`
  *     subspaces (the per-subspace argmins fuse into a single
  *     projection); the per-(subspace, cluster, dimension) means are
  *     one hash aggregate of m×k×subDim cells — trivially small at any
  *     corpus size. Train on a sample at real scale; codebooks are
  *     m×k×subDim doubles and ride to executors as plan literals.
  *   - ENCODE: one scan-stage projection maps each vector to `m`
  *     centroid codes (`array<int>`, one codegen'd argmin per
  *     subspace) — 512-dim float32 at m=8 compresses 256 B → 8 codes,
  *     the compression that lets a 100 TB embedding corpus's index
  *     live in cluster memory.
  *   - SEARCH (ADC): each query precomputes its m×k table of
  *     subvector→centroid squared-L2 distances driver-side; the
  *     corpus scan sums `tab[mi][code[mi]]` per row
  *     ([[graft.functions.PqAdcExpr]], fused codegen) — table lookups
  *     instead of d multiply-adds per candidate. Queries broadcast;
  *     the only shuffle is the per-query top-k window.
  *
  * Exactness anchor (the oracle contract): with `iters = 0` the whole
  * pipeline is closed-form — codebooks ARE the first `k` subvectors —
  * so an external engine can replicate train/encode/search exactly
  * (q168's DuckDB oracle does); and when every distinct subvector
  * appears among the seeds, encoding is lossless and ADC equals the
  * exact distance, pinning the arithmetic end to end. Refined
  * codebooks (`iters > 0`) are covered by the recall property test
  * instead.
  */
object Pq {

  /** m codebooks of k centroids each, subDim doubles per centroid. */
  final case class Codebooks(dim: Int, books: Seq[Seq[Seq[Double]]]) {
    require(books.nonEmpty && books.head.nonEmpty, "empty codebooks")
    val m: Int = books.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim: Int = dim / m
  }

  private def sub(vec: Column, mi: Int, subDim: Int): Column =
    slice(vec, mi * subDim + 1, subDim)

  private def nearest(vec: Column, cents: Seq[Seq[Double]]): Column =
    NearestCentroidExpr.column(vec, cents)

  private def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
    r.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue())

  /** Squared L2 driver-side, index order — the same arithmetic the
    * codegen'd kernels run, so tables and oracle agree bit-for-bit. */
  private def l2sq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train the m codebooks. `iters = 0` keeps the deterministic seeds
    * (the closed-form oracle anchor); each refinement iteration costs
    * one corpus scan + one m×k×subDim-cell aggregate. */
  def trainCodebooks(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      dim: Int,
      iters: Int = 0): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val seeds = emb.orderBy(col(idCol)).limit(k).select(col(vecCol)).collect().map(vecOf)
    require(seeds.nonEmpty, "cannot train codebooks on an empty corpus")
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      seeds.toSeq.map(v => v.slice(mi * subDim, (mi + 1) * subDim))
    }
    (0 until iters).foreach { _ =>
      // one scan: all m subspace assignments in a single projection
      val assigned = emb.select(
        col(vecCol).as("_v"),
        array((0 until m).map(mi =>
          nearest(sub(col(vecCol), mi, subDim), books(mi))): _*).as("_cs"))
      val cells = assigned
        .select(col("_cs"), posexplode(col("_v")).as(Seq("_d", "_x")))
        .withColumn("_mi", (col("_d") / subDim).cast("int"))
        .withColumn("_sd", col("_d") % subDim)
        .withColumn("_c", element_at(col("_cs"), col("_mi") + 1))
        .groupBy("_mi", "_c", "_sd").agg(avg(col("_x").cast("double")).as("_mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      books = books.zipWithIndex.map { case (book, mi) =>
        book.zipWithIndex.map { case (seed, ci) =>
          if (cells.contains((mi, ci, 0)))
            (0 until subDim).map(sd => cells((mi, ci, sd)))
          else seed // empty cluster keeps its centroid
        }
      }
    }
    Codebooks(dim, books)
  }

  /** Scan-stage encode: vector → m centroid codes (`array<int>`). */
  def encode(emb: DataFrame, vecCol: String, cb: Codebooks, outCol: String = "_pq"): DataFrame =
    emb.withColumn(outCol, array((0 until cb.m).map(mi =>
      nearest(sub(col(vecCol), mi, cb.subDim), cb.books(mi))): _*))

  /** The m×k ADC table for one query vector. */
  def adcTable(query: Seq[Double], cb: Codebooks): Seq[Seq[Double]] =
    cb.books.zipWithIndex.map { case (book, mi) =>
      val qs = query.slice(mi * cb.subDim, (mi + 1) * cb.subDim)
      book.map(c => l2sq(qs, c))
    }

  /** Top-k by ADC distance for the given query ids (vectors pulled
    * from the corpus — self-search excludes the query row itself).
    * Queries ship as broadcast rows carrying their precomputed tables;
    * the corpus side is ONE scan of the (tiny) code column — the
    * embedding vectors themselves are not read at search time. */
  def searchTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      queryIds: Seq[Long],
      k: Int,
      codesCol: String = "_pq"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val encoded = encode(emb, vecCol, cb, codesCol)
      .select(col(idCol).as("nid"), col(codesCol).as("_codes"))
    val queries = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue(),
        adcTable(r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()), cb)))
      .toSeq.toDF("qid", "_tab")
    val dist = FunctionShim.column(PqAdcExpr(
      FunctionShim.expression(col("_codes")),
      FunctionShim.expression(col("_tab"))))
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("nid").asc)
    encoded.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), dist.as("dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("dist"))
  }
}
