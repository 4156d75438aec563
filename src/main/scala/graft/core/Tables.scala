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
    // events.ts arrives in whatever physical form the generator chose —
    // TIMESTAMP(NANOS) (rejected outright by Spark's converter unless
    // read as a nanos Long) in some rounds, TIMESTAMP(MICROS) without
    // isAdjustedToUTC (read as TIMESTAMP_NTZ) in others. Normalize both
    // to session-zone TIMESTAMP here so every operator above this choke
    // point sees one type. ns→µs uses integer division (exact; double
    // division would lose precision at 1.7e18); NTZ→LTZ under the UTC
    // session zone re-tags the same wall-clock instant.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view for SQL-path queries.
    * Idempotent; cheap (no scan — just catalog entries). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Record the testdata tables in the CATALOG, not just this session's
    * temp views, so the service doors' per-request isolated sessions
    * resolve them — `ensureSessionViews` re-materializes catalog
    * entries per request, while plain temp views never cross sessions
    * (r13 finding: `Serve <dir>` answered /hc but a fresh request
    * couldn't see lineitem). `events` registers only when its physical
    * timestamp type is plain-readable — the nanos-normalizing [[load]]
    * is a loader concern the generic catalog materializer does not
    * reproduce. */
  def recordInCatalog(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val ep = s"$dir/$n.parquet"
      val readable =
        try { spark.read.parquet(ep).schema; true }
        catch { case scala.util.control.NonFatal(_) => false }
      if (readable)
        Catalog.update(Catalog.AttachedTable(n, "", Nil, Some(ep)))
    }
}
