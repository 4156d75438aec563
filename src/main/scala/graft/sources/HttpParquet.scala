package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Parquet over HTTP(S) for `s3('https://…/x_{0,1}.parquet')` — the
  * reference's second demo query shape
  * (`temporal/workflow_query_executor_test.go:49`). There is no Hadoop
  * filesystem for http, and parquet needs a seekable, length-known
  * stream, so each URL is fetched to executor-local tmp (ONE file per
  * task — the same work unit `urlCluster` distributes) and decoded
  * there with the parquet-java column reader. The driver fetches only
  * the FIRST file to derive the schema; every other byte moves
  * executor-side. Files are deleted on task completion, success or
  * failure.
  *
  * Scale posture: N URLs → N tasks, zero shuffle, rows stream out of
  * the row-group reader lazily (never a whole decoded file in memory).
  * The tradeoff vs a real filesystem scan is no column
  * pruning/predicate pushdown into the remote fetch — whole objects
  * cross the wire, exactly like the reference's url() path.
  */
object HttpParquet {

  /** Read a (possibly `{a,b}`/`{n..m}`-globbed) http(s) parquet URL set
    * as a DataFrame with `_path`/`_file` virtual columns attached. */
  def read(spark: SparkSession, urlPattern: String): DataFrame = {
    val urls = Globs.expandRanges(urlPattern).flatMap(Globs.expandAlternation).distinct
    require(urls.nonEmpty, s"parquet url() expanded to zero URLs: $urlPattern")
    val dataSchema = withLocalCopy(urls.head)(f => sparkSchema(footer(f)))
    val out = StructType(dataSchema.fields ++
      Seq(StructField("_path", StringType), StructField("_file", StringType)))
    val rows = spark.sparkContext
      .parallelize(urls, urls.size)
      .flatMap(u => readRows(u, dataSchema))
    spark.createDataFrame(rows, out)
  }

  // ---- driver-side schema derivation ----

  private def footer(local: java.io.File): MessageType = {
    val in = HadoopInputFile.fromPath(new HPath(local.toURI), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema
    finally r.close()
  }

  private def withLocalCopy[A](url: String)(f: java.io.File => A): A = {
    val tmp = java.io.File.createTempFile("graft_httpq_", ".parquet")
    try { download(url, tmp); f(tmp) }
    finally { tmp.delete(): Unit }
  }

  /** Flat-schema MessageType → Spark StructType. Nested groups are
    * rejected loudly; INT64 TIMESTAMP(NANOS) maps to long, matching the
    * `Tables.load` nanosAsLong posture. */
  private[sources] def sparkSchema(msg: MessageType): StructType =
    StructType(msg.getFields.asScala.map { field =>
      require(field.isPrimitive,
        s"parquet-over-http supports flat schemas; '${field.getName}' is nested")
      StructField(field.getName, sparkType(field.asPrimitiveType()), nullable = true)
    }.toArray)

  private def sparkType(p: PrimitiveType): DataType = {
    val lt = p.getLogicalTypeAnnotation
    // Logical annotations the decoder below does NOT honor must fail as
    // loudly as unsupported physical types: falling through to the raw
    // physical type would return unscaled decimal ints / sign-flipped
    // uint64 values instead of an error.
    lt match {
      case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
        throw new IllegalArgumentException(
          s"parquet-over-http: DECIMAL column '${p.getName}' is not supported")
      case t: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if !t.isSigned && t.getBitWidth >= 32 =>
        // UINT64 has no signed home at all; UINT32 values above 2^31
        // would sign-flip through getInteger — both refuse loudly
        throw new IllegalArgumentException(
          s"parquet-over-http: unsigned INT(${t.getBitWidth}) column " +
            s"'${p.getName}' would be mis-read through the signed decoder")
      case _ => ()
    }
    p.getPrimitiveTypeName match {
      case BOOLEAN => BooleanType
      case INT32 =>
        lt match {
          case _: DateLogicalTypeAnnotation => DateType
          case _ => IntegerType
        }
      case INT64 =>
        lt match {
          case t: TimestampLogicalTypeAnnotation
              if t.getUnit != LogicalTypeAnnotation.TimeUnit.NANOS =>
            // isAdjustedToUTC=false is Spark's TimestampNTZ — mirror the
            // native reader so http and file scans agree on schema
            if (t.isAdjustedToUTC) TimestampType else TimestampNTZType
          case _ => LongType
        }
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case BINARY =>
        lt match {
          case _: StringLogicalTypeAnnotation => StringType
          case _ => BinaryType
        }
      case other =>
        throw new IllegalArgumentException(
          s"parquet-over-http: unsupported physical type $other for '${p.getName}'")
    }
  }

  // ---- executor-side fetch + decode ----

  private def readRows(url: String, expected: StructType): Iterator[Row] = {
    val tmp = java.io.File.createTempFile("graft_httpq_", ".parquet")
    // a failed download / corrupt body must not leak the tmp file on a
    // long-lived executor (each task retry would leave another one)
    val reader =
      try {
        download(url, tmp)
        ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(tmp.toURI), new Configuration()))
      } catch {
        case e: Throwable => tmp.delete(); throw e
      }
    val cleanup = () => { reader.close(); tmp.delete(): Unit }
    Option(TaskContext.get()).foreach {
      _.addTaskCompletionListener[Unit](_ => cleanup())
    }
    val fileMsg = reader.getFooter.getFileMetaData.getSchema
    val fileSchema = sparkSchema(fileMsg)
    require(fileSchema == expected,
      s"schema mismatch across url() parquet files: $url has $fileSchema, " +
        s"first file has $expected")
    val file = url.substring(url.lastIndexOf('/') + 1)
    val columnIO = new ColumnIOFactory().getColumnIO(fileMsg)

    // lazy row-group-at-a-time iteration: one decoded record in flight
    new Iterator[Row] {
      private var groupRows = 0L
      private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
      private def advance(): Boolean = {
        val pages = reader.readNextRowGroup()
        if (pages == null) { cleanup(); false }
        else {
          groupRows = pages.getRowCount
          recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(fileMsg))
          if (groupRows > 0) true else advance()
        }
      }
      override def hasNext: Boolean = groupRows > 0 || advance()
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        groupRows -= 1
        val g = recordReader.read()
        val vals = new Array[Any](expected.length + 2)
        var i = 0
        while (i < expected.length) {
          vals(i) = value(g, i, expected.fields(i).dataType,
            fileMsg.getType(i).asPrimitiveType())
          i += 1
        }
        vals(expected.length) = url
        vals(expected.length + 1) = file
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }
  }

  private def value(g: Group, i: Int, dt: DataType, p: PrimitiveType): Any =
    if (g.getFieldRepetitionCount(i) == 0) null
    else dt match {
      case BooleanType => g.getBoolean(i, 0)
      case IntegerType => g.getInteger(i, 0)
      case LongType => g.getLong(i, 0)
      case FloatType => g.getFloat(i, 0)
      case DoubleType => g.getDouble(i, 0)
      case StringType => g.getString(i, 0)
      case BinaryType => g.getBinary(i, 0).getBytes
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(g.getInteger(i, 0).toLong))
      case TimestampType =>
        val micros = timestampMicros(g, i, p)
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val micros = timestampMicros(g, i, p)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case other =>
        throw new IllegalArgumentException(s"unsupported type $other")
    }

  private def timestampMicros(g: Group, i: Int, p: PrimitiveType): Long = {
    val unit = p.getLogicalTypeAnnotation
      .asInstanceOf[TimestampLogicalTypeAnnotation].getUnit
    val v = g.getLong(i, 0)
    if (unit == LogicalTypeAnnotation.TimeUnit.MILLIS) v * 1000L else v
  }

  private def download(url: String, dest: java.io.File): Unit = {
    val in = Sources.openHttpStream(url)
    try java.nio.file.Files.copy(in, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
  }
}
