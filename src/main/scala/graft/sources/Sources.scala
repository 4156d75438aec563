package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Spark renditions of the reference's table functions (SURVEY §2.1).
  *
  * `s3(...)` / `s3Cluster(...)` (reference
  * `temporal/workflow_query_executor_test.go:42-70`) are both a single
  * `spark.read` — FileSourceScanExec already splits matched files across
  * executors cluster-wide, which is exactly what `s3Cluster` adds over
  * `s3`. `url(...)` / `urlCluster(...)` (reference `run.sh:17-18`) have no
  * Hadoop filesystem, so URLs are expanded on the driver and fetched on
  * executors — one URL per task, the same file-granular work unit the
  * reference's urlCluster distributes.
  *
  * All readers attach the CH virtual columns on demand: `_file` (base
  * file name) and `_path` (full URI) — reference exercises `_file` at
  * `temporal/workflow_query_executor_test.go:42,49`.
  */
object Sources {

  /** CH virtual columns over any file-backed DataFrame. */
  def withFileColumns(df: DataFrame): DataFrame =
    df.withColumn("_path", input_file_name())
      .withColumn("_file", substring_index(input_file_name(), "/", -1))

  /** `s3`/`s3Cluster`/`file` parquet scan with CH glob support. */
  def parquet(spark: SparkSession, pattern: String): DataFrame =
    spark.read.parquet(Globs.expand(pattern): _*)

  /** CSV scan; `schemaStr` is a ClickHouse schema string (schema-on-read)
    * — absent means infer, matching CH's schema-inference default.
    * `withNames` ≈ the CSVWithNames format. gzip is transparent via file
    * extension, as in Spark's CSV reader. */
  def csv(
      spark: SparkSession,
      pattern: String,
      schemaStr: Option[String] = None,
      withNames: Boolean = true): DataFrame = {
    val r = spark.read.option("header", withNames.toString)
    val r2 = schemaStr match {
      case Some(s) => r.schema(graft.types.ChSchemaParser.parse(s))
      case None => r.option("inferSchema", "true")
    }
    r2.csv(Globs.expand(pattern): _*)
  }

  /** `url()` / `urlCluster()`: fetch HTTP(S) objects as text lines,
    * distributed one-URL-per-task, then parse. The reference's urlCluster
    * is precisely "split the expanded URL list across nodes"
    * (`run.sh:17`); here the executor fetch does the same. Supports
    * `http(s)://` and `file://` (tests). CSV only — the only format the
    * reference exercises over url().
    */
  def urlCsv(
      spark: SparkSession,
      urlPattern: String,
      schemaStr: Option[String] = None,
      withNames: Boolean = true): DataFrame = {
    import spark.implicits._
    val urls = Globs.expandRanges(urlPattern).flatMap(Globs.expandAlternation).distinct
    // one task per URL: the file is the work unit, as in the reference
    val lines: Dataset[String] = spark
      .createDataset(urls)
      .repartition(urls.size)
      .flatMap(u => fetchLines(u))
    val r = spark.read.option("header", withNames.toString)
    val r2 = schemaStr match {
      case Some(s) => r.schema(graft.types.ChSchemaParser.parse(s))
      case None => r.option("inferSchema", "true")
    }
    r2.csv(lines)
  }

  /** Executor-side fetch. gzip-decodes by extension like CH. */
  private[sources] def fetchLines(url: String): Iterator[String] = {
    val raw = new java.net.URI(url).toURL.openStream()
    val in = if (url.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw) else raw
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  }
}
