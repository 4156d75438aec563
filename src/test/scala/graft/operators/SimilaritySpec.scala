package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  test("meanVector pools element-wise per group") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (2, Seq(10.0f, 20.0f)))
      .toDF("g", "vec")
    val rows = Similarity.meanVector(df, "g", "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(rows == Set((1, 0, 2.0), (1, 1, 3.0), (2, 0, 10.0), (2, 1, 20.0)))
  }

  private lazy val spark = graft.TestSpark.spark

  /** 8-dim corpus with planted structure: 1 ≡ 0 (identical), 2 ≈ 0
    * (tiny perturbation), 3/4 orthogonal-ish. */
  private def emb = {
    import spark.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (2L, Array(0.95f, 0.05f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f, 0f, 0f, 1f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val a = emb.as("a"); val b = emb.as("b")
    val sims = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(sims((0L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(sims((0L, 4L))) < 1e-12)
    assert(sims((0L, 2L)) > 0.99)
  }

  test("brute-force top-k ranks the planted twin first") {
    val out = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.head == ((0L, 1, 1L)), s"rank-1 neighbor wrong: ${out.head}")
    assert(out(1) == ((0L, 2, 2L)))
  }

  test("LSH neighbors recall identical/near-identical vectors") {
    val pairs = Similarity.lshNeighbors(emb, "vec_id", "embedding",
        planes = 8, dim = 8, minCosine = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors share every bucket → must be found
    assert(pairs.contains((0L, 1L)))
    // perturbed twin: within 1-bit multiprobe reach with high probability
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    // orthogonal vectors must not pass the cosine verify
    assert(!pairs.contains((0L, 4L)))
  }

  test("l2Normalize yields unit vectors; zero vectors pass through") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Seq(3f, 4f)), (2L, Seq(0f, 0f))).toDF("id", "embedding")
    val rows = Similarity.l2Normalize(df, "embedding", "unit")
      .orderBy("id").collect()
    val u1 = rows(0).getAs[scala.collection.Seq[Double]]("unit")
    assert(math.abs(u1(0) - 0.6) < 1e-12 && math.abs(u1(1) - 0.8) < 1e-12)
    assert(rows(1).getAs[scala.collection.Seq[Double]]("unit").toSeq == Seq(0.0, 0.0))
  }

  test("quantizeInt8 rounds to [-127,127] with a dequantizable scale") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f)), (2L, Seq(0f, 0f, 0f)))
      .toDF("id", "embedding")
    val rows = Similarity.quantizeInt8(df, "embedding", "q8")
      .orderBy("id").collect()
    val q1 = rows(0).getAs[scala.collection.Seq[Int]]("q8")
    assert(q1.toSeq == Seq(64, -127, 32)) // scale = 127/1.0; round(.5*127)=64
    assert(math.abs(rows(0).getAs[Double]("q8_scale") - 127.0) < 1e-12)
    assert(rows(1).getAs[scala.collection.Seq[Int]]("q8").toSeq == Seq(0, 0, 0))
    assert(rows(1).getAs[Double]("q8_scale") == 0.0)
  }

  test("LSH signature is deterministic across evaluations") {
    val s1 = emb.select(Similarity.lshSignature(col("embedding"), 8, 8).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val s2 = emb.select(Similarity.lshSignature(col("embedding"), 8, 8).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2)
  }

  test("int8 quantization is rank-faithful: top-k over dequantized vectors ≈ float top-k") {
    // the storage-contract claim: dot products on (q / scale) preserve
    // neighbor RANKING well enough that recall@5 stays high
    val deq = Similarity.quantizeInt8(emb, "embedding", "q8")
      .withColumn("deq",
        org.apache.spark.sql.functions.transform(col("q8"),
          x => x.cast("double") / col("q8_scale")))
      .select(col("vec_id"), col("deq").as("embedding"))
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    def topk(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df, "vec_id", "embedding", qids, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val floatTop = topk(emb.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => x.cast("double")).as("embedding")))
    val int8Top = topk(deq)
    val recall = floatTop.count(int8Top.contains).toDouble / floatTop.size
    assert(recall >= 0.8, s"int8 recall@5 too low: $recall")
  }
}
