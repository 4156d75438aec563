package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** File sinks (SURVEY §2.1 S10/S11): the reference returns results
  * row-major to the caller and hints a future S3 result offload
  * (`workflow_query_executor.go:94` TODO "Return S3 url"). Here both
  * exist: [[graft.service.QueryService]] is the Cols+Rows envelope;
  * these writers are the at-scale result path (a 100 TB result never
  * goes through the driver).
  */
object Sinks {

  def writeParquet(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(
      df: DataFrame,
      path: String,
      header: Boolean = true,
      compression: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).option("header", header.toString)
      // RFC-4180 doubled quotes, matching every reader in this package
      // (Spark's default backslash escape would corrupt a round-trip
      // through Sources.csv/urlCsv)
      .option("escape", "\"")
    compression.foreach(c => w.option("compression", c))
    w.csv(path)
  }

  /** JSONEachRow (newline-delimited JSON) export — the write twin of
    * the `JSONEachRow` read format in [[Sources.json]]/`urlJson`
    * (reference format surface, SURVEY §2.1 S6). One JSON object per
    * line, gzip optional, distributed (one file per partition). */
  def writeJsonEachRow(
      df: DataFrame,
      path: String,
      compression: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    compression.foreach(c => w.option("compression", c))
    w.json(path)
  }

  /** Sharded training-order export: the write twin of
    * [[graft.operators.Sampling.shuffleShards]] — one directory per
    * shard (`shard=<s>/`), rows within a shard laid out by `pos`. A
    * trainer reads shard directories round-robin for a reproducible
    * pseudo-random epoch order; at 100 TB this is S independent sorted
    * writes, never a global sort. */
  def writeShards(
      df: DataFrame,
      path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode(mode).partitionBy("shard").parquet(path)

  /** Bucketed + sorted table layout — the co-located-join story: two
    * tables bucketed by the same key into the same bucket count join
    * with NO shuffle on either side (Catalyst reuses the bucket
    * partitioning). This is the "pre-partition the big join" rule from
    * the builder prompt made durable on disk; at 100 TB it converts
    * every recurring fact⋈fact join from two full shuffles into zero. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKey: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(numBuckets, bucketKey)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** MergeTree-ORDER-BY-parity layout (W7): repartition on the leading
    * key then sort within partitions by the full key before writing.
    * Parquet row-group min/max stats come out key-clustered, so
    * predicate pushdown skips row groups the way CH's primary index
    * skips granules. This is layout-time work — one shuffle — buying
    * every subsequent keyed scan its pruning. */
  def writeSorted(
      df: DataFrame,
      path: String,
      sortKey: Seq[String],
      numFiles: Int = 0,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(sortKey.nonEmpty, "writeSorted needs a sort key")
    val keyed =
      if (numFiles > 0) df.repartition(numFiles, col(sortKey.head))
      else df.repartition(col(sortKey.head))
    keyed.sortWithinPartitions(sortKey.map(col): _*)
      .write.mode(mode).parquet(path)
  }
}
