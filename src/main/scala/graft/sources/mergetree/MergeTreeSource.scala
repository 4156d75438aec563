package graft.sources.mergetree

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.types.ChSchemaParser

/** DataSource V2 provider for ClickHouse MergeTree wide parts over a
  * local directory or http(s) endpoint — the data path behind
  * `ATTACH TABLE … ENGINE=MergeTree … SETTINGS disk=disk(type=web,
  * endpoint='…')` (reference `temporal/workflow_query_executor_test.go:85`;
  * VERDICT r9 task #1). Usage:
  *
  * {{{
  * spark.read.format("mergetree")
  *   .option("endpoint", "http://host/table_root")
  *   .option("ddl", "`id` UInt64, `name` LowCardinality(String)")
  *   .load()
  * }}}
  *
  * Scale shape:
  *   - splits are GRANULE RANGES, grouped to `rowsPerSplit` (default
  *     1 « 20): a thousand-granule part fans out across the cluster
  *     instead of pinning one task per part;
  *   - column pruning is real IO pruning: an unprojected column's
  *     streams are never opened, so `SELECT count(*)` touches marks
  *     only — the same asymmetry MergeTree itself gets from its
  *     columnar layout;
  *   - executors fetch their own streams (endpoint access ships inside
  *     the split); http objects land in a per-executor content-addressed
  *     cache, one fetch per file per executor.
  *
  * The `ddl` option (the ATTACH column list) is authoritative for the
  * TABLE schema — Spark-side names/types come from it via
  * [[ChSchemaParser]] — while each part's own `columns.txt` drives the
  * per-part decode, so a part written before a column was added still
  * reads (missing column → nulls), matching MergeTree's ALTER story.
  */
final class MergeTreeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mergetree"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChSchemaParser.parse(MergeTreeSource.ddl(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MergeTreeTable(
      MergeTreeSource.endpoint(opts), MergeTreeSource.ddl(opts), schema,
      opts.getLong("rowsPerSplit", 1L << 20))
  }
}

/** Public facade for the catalog layer ([[graft.core.Catalog]] routes
  * ATTACH endpoints here when they hold a MergeTree part tree). */
object MergeTree {
  def looksLikeMergeTree(endpoint: String): Boolean =
    TableFiles.looksLikeMergeTree(endpoint)
  def read(spark: org.apache.spark.sql.SparkSession, endpoint: String,
      ddl: String): org.apache.spark.sql.DataFrame =
    spark.read.format("mergetree")
      .option("endpoint", endpoint).option("ddl", ddl).load()
}

private object MergeTreeSource {
  def endpoint(o: CaseInsensitiveStringMap): String = {
    val e = o.get("endpoint")
    require(e != null && e.nonEmpty, "mergetree source requires the 'endpoint' option")
    e
  }
  def ddl(o: CaseInsensitiveStringMap): String = {
    val d = o.get("ddl")
    require(d != null && d.nonEmpty,
      "mergetree source requires the 'ddl' option (the ATTACH column list)")
    d
  }
}

private final class MergeTreeTable(
    endpoint: String, ddl: String, tableSchema: StructType, rowsPerSplit: Long)
  extends Table with SupportsRead {
  override def name(): String = s"mergetree($endpoint)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MergeTreeScanBuilder(endpoint, ddl, tableSchema, rowsPerSplit)
}

private final class MergeTreeScanBuilder(
    endpoint: String, ddl: String, full: StructType, rowsPerSplit: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new MergeTreeScan(endpoint, ddl, required, rowsPerSplit)
}

private final class MergeTreeScan(
    endpoint: String, ddl: String, required: StructType, rowsPerSplit: Long)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mergetree endpoint=$endpoint columns=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val tf = TableFiles(endpoint)
    val parts = tf.partDirs()
    require(parts.nonEmpty, s"no MergeTree parts under endpoint '$endpoint'")
    parts.iterator.flatMap { part =>
      val meta = PartMeta.read(tf, part)
      // group granules into row-bounded splits
      val splits = Array.newBuilder[InputPartition]
      var start = 0
      var i = 0
      var acc = 0L
      while (i < meta.granuleRows.length) {
        acc += meta.granuleRows(i)
        i += 1
        if (acc >= rowsPerSplit || i == meta.granuleRows.length) {
          splits += MergeTreeSplit(tf, part, start,
            meta.granuleRows.slice(start, i), meta.columns)
          start = i
          acc = 0L
        }
      }
      splits.result()
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MergeTreeReaderFactory(required.fieldNames.toSeq, ddl)
}

/** One granule range of one part. Carries the part's own column list so
  * the reader decodes what the PART has, not what the table declares. */
private final case class MergeTreeSplit(
    files: TableFiles,
    part: String,
    markStart: Int,
    granuleRows: Array[Int],
    partColumns: Seq[(String, String)]) extends InputPartition

private final class MergeTreeReaderFactory(requiredCols: Seq[String], ddl: String)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[MergeTreeSplit]
    val n = split.granuleRows.sum
    val partTypes = split.partColumns.toMap
    // decode eagerly (bounded by rowsPerSplit), then iterate; an
    // unprojected or part-missing column never opens a stream
    val colValues: Array[Array[Any]] = requiredCols.toArray.map { c =>
      partTypes.get(c) match {
        case None => Array.fill[Any](n)(null) // column added after this part was written
        case Some(chTypeStr) =>
          val t = ChType.parse(chTypeStr)
          val opened = scala.collection.mutable.ArrayBuffer.empty[SeekableFile]
          val streams = new ColumnCodec.Streams(
            s => {
              val f = split.files.seekable(s"${split.part}/$s.bin")
              opened += f
              new ChCompressedReader(f)
            },
            s => PartMeta.marksOf(split.files, split.part, s))
          try ColumnCodec.decode(c, t, streams, split.markStart, split.granuleRows)
          finally opened.foreach(_.close())
      }
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < n }
      override def get(): InternalRow =
        new GenericInternalRow(Array.tabulate[Any](colValues.length)(c => colValues(c)(i)))
      override def close(): Unit = ()
    }
  }
}
