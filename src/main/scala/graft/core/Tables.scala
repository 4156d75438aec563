package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the TESTDATA star schema (see /root/repo/TESTDATA.md).
  *
  * Every engine query reads parquet through this choke point (SparkEntry
  * routes all table access here): at 100 TB these paths become
  * partitioned directories / object-store prefixes and nothing above
  * this object changes. Reference analog: the `s3(...)` /
  * `s3Cluster(...)` table functions (reference
  * `temporal/workflow_query_executor_test.go:42-70`) — Spark's
  * FileSourceScanExec already distributes file splits across executors,
  * which is what s3Cluster adds over s3.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table '$name' (known: ${names.mkString(", ")})")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's converter
    // rejects outright; read it as a nanos Long and convert with integer
    // division (ns→µs is exact; double division would lose precision at
    // 1.7e18). Session-conf set here so any session the driver hands us
    // works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case None => df
    }
  }

  /** Register every table as a temp view for SQL-path queries.
    * Idempotent; cheap (no scan — just catalog entries). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
