package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  /** 90% of rows on one hot key. */
  private def skewed = {
    import spark.implicits._
    ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "v")
  }

  test("salted count matches plain groupBy count") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("k"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 900L)
  }

  test("salted sum matches plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, col("k"), col("v"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join matches plain join") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("dk", "label")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, col("k"), col("dk"), buckets = 4)
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salt actually spreads the hot key across buckets") {
    val spread = skewed.filter(col("k") === "hot")
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 1, "hot key landed in a single salt bucket")
  }
}
