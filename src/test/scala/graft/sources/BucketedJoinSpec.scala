package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed join: the durable pre-partitioning that turns a
  * recurring big⋈big join's two shuffles into zero (builder-prompt
  * scale rule "co-locate joins via bucketing"). */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("same-bucketed tables join with zero Exchange") {
    val dir = "/root/testdata/sf0.001"
    Sinks.writeBucketed(spark.read.parquet(s"$dir/orders.parquet"),
      "orders_b", "o_custkey", numBuckets = 4, sortCols = Seq("o_custkey"))
    Sinks.writeBucketed(spark.read.parquet(s"$dir/customer.parquet"),
      "customer_b", "c_custkey", numBuckets = 4, sortCols = Seq("c_custkey"))

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      assert(joined.count() ==
        spark.read.parquet(s"$dir/orders.parquet")
          .join(spark.read.parquet(s"$dir/customer.parquet"),
            col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
