package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the TESTDATA star schema (see /root/repo/TESTDATA.md).
  *
  * All engine queries read parquet through here so the scan layer is a
  * single choke point: at 100 TB these paths become partitioned
  * directories / object-store prefixes and nothing above this object
  * changes. Reference analog: the `s3(...)` / `s3Cluster(...)` table
  * functions (reference `temporal/workflow_query_executor_test.go:42-70`)
  * — Spark's FileSourceScanExec already distributes file splits across
  * executors, which is what s3Cluster adds over s3.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
