package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[CosineSimExpr]] / [[HyperplaneSigExpr]] to the HOF
  * (`zip_with`+`aggregate`) formulations they replaced — the oracle
  * corpus (q45/q46/q54/q113) hashed THOSE results against DuckDB, so
  * the kernels must be bit-exact, including the float-precision
  * products, the null-poisoned fold, and Spark's NaN-is-largest `>=`.
  */
class VectorExprsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import graft.operators.Similarity

  // the ORIGINAL higher-order-function formulations, verbatim
  private def dotH(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def cosineH(a: Column, b: Column): Column =
    dotH(a, b) / (sqrt(dotH(a, a)) * sqrt(dotH(b, b)))
  private def lshH(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val d = aggregate(
        zip_with(vec, lit(VectorKernels.hyperplane(p, dim)), (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  private def realPairs = {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("ia") % 7 === 0 && col("ib") % 5 === 0)
  }

  test("cosine is bit-exact with the HOF formulation on real float embeddings") {
    val bad = realPairs
      .select(cosineH(col("va"), col("vb")).as("o"),
        Similarity.cosine(col("va"), col("vb")).as("n"))
      .filter(!(col("o") <=> col("n"))).count()
    assert(bad == 0L)
  }

  test("cosine is bit-exact on double and mixed float/double arrays") {
    val pd = realPairs.select(
      transform(col("va"), x => x.cast("double")).as("da"),
      transform(col("vb"), x => x.cast("double")).as("db"), col("va"))
    val badD = pd.select(cosineH(col("da"), col("db")).as("o"),
        Similarity.cosine(col("da"), col("db")).as("n"))
      .filter(!(col("o") <=> col("n"))).count()
    assert(badD == 0L, "double/double")
    val badM = pd.select(cosineH(col("va"), col("db")).as("o"),
        Similarity.cosine(col("va"), col("db")).as("n"))
      .filter(!(col("o") <=> col("n"))).count()
    assert(badM == 0L, "mixed float/double")
  }

  test("cosine edge semantics match: length mismatch, null element, null input, empty") {
    import spark.implicits._
    val edge = Seq(
      (1, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)), // zip-pads → null
      (2, Seq(1.0f, Float.NaN), Seq(1.0f, 1.0f)),  // NaN propagates
      (4, Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))
    ).toDF("id", "va", "vb")
      // null input column and null element, built without Option encoders
      .withColumn("va", when(col("id") === 4, lit(null).cast("array<float>")).otherwise(col("va")))
      .withColumn("vb", when(col("id") === 2, array(lit(1.0f), lit(null).cast("float"))).otherwise(col("vb")))
    val rows = edge
      .select(col("id"), cosineH(col("va"), col("vb")).as("o"),
        Similarity.cosine(col("va"), col("vb")).as("n"))
      .collect()
    rows.foreach { r =>
      val o = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val n = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      assert(o == n || (o != null && n != null &&
        o.doubleValue().isNaN && n.doubleValue().isNaN), s"id=${r.getInt(0)}: $o vs $n")
    }
    // and the interesting ones hit the branches we think they hit
    val byId = rows.map(r => r.getInt(0) -> r.isNullAt(2)).toMap
    assert(byId(1), "length mismatch must be null")
    assert(byId(2), "null element must poison to null")
    assert(byId(4), "null input must be null")
  }

  test("zero-norm divisor follows the session's Divide semantics (ANSI throws)") {
    import spark.implicits._
    val zero = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("va", "vb")
    // ANSI is the Spark 4 default in every graft session: both the HOF
    // plan and the kernel must raise DIVIDE_BY_ZERO, not emit NaN/Inf
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val eH = intercept[Exception] {
      zero.select(cosineH(col("va"), col("vb"))).collect()
    }
    val eK = intercept[Exception] {
      zero.select(Similarity.cosine(col("va"), col("vb"))).collect()
    }
    assert(eH.getMessage.contains("DIVIDE_BY_ZERO"), eH.getMessage)
    assert(eK.getMessage.contains("DIVIDE_BY_ZERO"), eK.getMessage)
  }

  test("lshSignature is bit-exact with the HOF formulation, incl. degenerate inputs") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    for ((planes, dim) <- Seq((12, 64), (8, 64))) {
      val bad = emb.select(lshH(col("embedding"), planes, dim).as("o"),
          Similarity.lshSignature(col("embedding"), planes, dim).as("n"))
        .filter(!(col("o") <=> col("n"))).count()
      assert(bad == 0L, s"planes=$planes dim=$dim")
    }
    import spark.implicits._
    val edge = Seq(
      (1, Seq(1.0f, 2.0f)),            // wrong length → 0
      (2, Seq.fill(64)(Float.NaN)),    // NaN dots: Spark >= says true → all bits
      (3, Seq.fill(64)(0.0f))          // zero vector → d == 0 → all bits
    ).toDF("id", "v")
      .withColumn("v", when(col("id") === 1 && lit(false), col("v")).otherwise(col("v")))
    val cmp = edge.select(col("id"), lshH(col("v"), 8, 64).as("o"),
        Similarity.lshSignature(col("v"), 8, 64).as("n")).collect()
    cmp.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getInt(0)}"))
    // null input vector → 0, matching when(null >= 0, ...).otherwise(0)
    val nullRow = edge.select(
      lshH(lit(null).cast("array<float>"), 8, 64).as("o"),
      Similarity.lshSignature(lit(null).cast("array<float>"), 8, 64).as("n")).head()
    assert(!nullRow.isNullAt(1) && nullRow.getLong(1) == 0L && nullRow.getLong(0) == 0L)
  }

  test("nearestCentroid argmin is bit-exact with the when-chain reduce") {
    import org.apache.spark.sql.graft.FunctionShim
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents: Seq[Seq[Double]] = emb.orderBy(col("vec_id")).limit(7)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    def dist2H(vec: Column, c: Seq[Double]): Column =
      aggregate(zip_with(vec, lit(c.toArray), (x, h) => (x - h) * (x - h)),
        lit(0.0), (acc, x) => acc + x)
    val hofNearest = cents.zipWithIndex.map { case (c, i) =>
      struct(dist2H(col("embedding"), c).as("d"), lit(i).as("i"))
    }.reduce((a, b) => when(b.getField("d") < a.getField("d"), b).otherwise(a))
      .getField("i")
    val kNearest = FunctionShim.column(NearestCentroidExpr(
      FunctionShim.expression(col("embedding")), cents.map(_.toArray).toArray))
    val bad = emb.select(hofNearest.as("o"), kNearest.as("n"))
      .filter(!(col("o") <=> col("n"))).count()
    assert(bad == 0L)
  }

  test("codegen and interpreted paths agree") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val q = emb.select(
      Similarity.cosine(col("embedding"), reverse(col("embedding"))).as("c"),
      Similarity.lshSignature(col("embedding"), 12, 64).as("s"))
    val whole = q.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = q.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
      assert(whole == interp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
