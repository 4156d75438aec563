package org.apache.spark.sql.graft

import java.io.OutputStream
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

/** Bridge into Spark's Arrow plumbing (private[sql]) for the HTTP
  * door's `FORMAT Arrow` / `FORMAT ArrowStream` responses: Spark
  * already ships the schema mapping (`ArrowUtils.toArrowSchema`) and a
  * per-type vector writer (`execution.arrow.ArrowWriter`) — the same
  * machinery its own Arrow collect paths use — so the door reuses them
  * instead of re-implementing a per-type Arrow encoder. One batch
  * buffer driver-side; rows stream through in `batchRows` chunks. */
object ArrowShim {

  /** Stream `rows` as Arrow IPC onto `out`: the STREAM framing for
    * `ArrowStream` (what `clickhouse-client --format ArrowStream`
    * emits), the FILE framing (capped by a footer, seekable) for
    * `Arrow`. Returns the row count. */
  def streamResult(
      schema: StructType,
      timeZoneId: String,
      rows: Iterator[Seq[Any]],
      out: OutputStream,
      batchRows: Int,
      fileFormat: Boolean): Long = {
    val arrowSchema = ArrowUtils.toArrowSchema(
      schema, timeZoneId, errorOnDuplicatedFieldNames = true,
      largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-http-arrow", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val writer = ArrowWriter.create(root)
      val ipc =
        if (fileFormat) new ArrowFileWriter(root, null, Channels.newChannel(out))
        else new ArrowStreamWriter(root, null, Channels.newChannel(out))
      val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      ipc.start()
      var n = 0L
      var inBatch = 0
      def flush(): Unit = if (inBatch > 0) {
        writer.finish()
        ipc.writeBatch()
        writer.reset()
        inBatch = 0
      }
      rows.foreach { r =>
        writer.write(toCatalyst(Row.fromSeq(r)).asInstanceOf[InternalRow])
        inBatch += 1
        n += 1
        if (inBatch >= batchRows) flush()
      }
      flush()
      ipc.end()
      n
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** Decode an Arrow IPC STREAM body into (Spark schema, external
    * rows) — the ingest direction for `INSERT … FORMAT ArrowStream`.
    * Batches read through Spark's own [[ArrowColumnVector]] wrapper
    * (the exact typed bridge its Arrow collect paths use), then
    * convert to external rows for `createDataFrame`. Inline ingest is
    * driver-side by nature — the bytes ARE the request body. */
  def readStream(bytes: Array[Byte]): (StructType, Seq[Row]) = {
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-http-arrow-in", 0, Long.MaxValue)
    val reader = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val schema = ArrowUtils.fromArrowSchema(root.getSchema)
      val toScala = CatalystTypeConverters.createToScalaConverter(schema)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (reader.loadNextBatch()) {
        val cols: Array[ColumnVector] = root.getFieldVectors.asScala
          .map(v => new ArrowColumnVector(v): ColumnVector).toArray
        val batch = new ColumnarBatch(cols, root.getRowCount)
        val it = batch.rowIterator()
        while (it.hasNext) {
          rows += toScala(it.next().copy()).asInstanceOf[Row]
        }
      }
      (schema, rows.toSeq)
    } finally {
      reader.close()
      allocator.close()
    }
  }
}
