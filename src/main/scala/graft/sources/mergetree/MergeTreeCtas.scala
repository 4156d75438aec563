package graft.sources.mergetree

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CTAS `ENGINE = MergeTree` materialization (VERDICT r9 task #8): the
  * write front door accepted the ENGINE clause but produced parquet;
  * this writes a REAL wide-part tree through [[MergeTreePartWriter]] —
  * ATTACH-able by the same path the reference's github_events ATTACH
  * reads (q160), locally or served over http (the `.index` listing is
  * written too).
  *
  * Scale posture, stated loudly: parts are materialized DRIVER-SIDE
  * (the part writer is a local-filesystem encoder), bounded by
  * [[MaxRowsConf]] (default 10M rows) — the right tool for dimension
  * tables, curated exports, and fixtures, NOT for re-shaping a corpus
  * (use plain CTAS for that: executor-parallel sorted parquet carries
  * the same pruning story). Exceeding the bound refuses with that
  * guidance rather than OOMing the driver.
  */
object MergeTreeCtas {

  val MaxRowsConf = "spark.graft.ctasMergeTreeMaxRows"
  private val DefaultMaxRows = 10L * 1000 * 1000
  private val PartRows = 1 << 20
  private val Granularity = 8192

  /** CH type string for a Spark field. Nullability is decided from the
    * DATA (observed nulls), not the schema flag — Spark marks almost
    * everything nullable, and a Nullable key column would refuse the
    * primary index. */
  private def chBase(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BooleanType => "Bool"
    case DateType => "Date32"
    case TimestampType | TimestampNTZType => "DateTime64(6)"
    case other => throw new IllegalArgumentException(
      s"CTAS ENGINE=MergeTree: no MergeTree encoding for Spark type " +
        s"${other.simpleString} — cast it in the SELECT (decimals → " +
        "double or string, maps/structs → explicit columns)")
  }

  /** Write `df` as a part tree under `dir`; returns (rows, ATTACH ddl).
    * Rows are globally sorted by `orderBy` then chunked, so every part
    * is sorted and carries a truthful primary.idx. `declaredDdl` (the
    * maintenance paths pass the table's own column list) PRESERVES the
    * original CH types — Enum stays Enum, LowCardinality stays
    * LowCardinality, unsigned widths stay unsigned — instead of
    * re-deriving wider Spark-mapped types, so a mutated tree still
    * decodes under its original ATTACH DDL (review finding). */
  def write(
      spark: SparkSession,
      df: DataFrame,
      dir0: String,
      orderBy: Seq[String],
      declaredDdl: Option[String] = None,
      op: String = "CTAS ENGINE=MergeTree"): (Long, String) = {
    val dir = localDir(dir0)
    val (asRows, cols) = prepare(spark, df, orderBy, allowEmpty = false, declaredDdl, op)
    // same per-endpoint serialization as appendPart: two concurrent
    // rewrites would race the backup-staged swap
    treeLock(dir).synchronized {
      writeOrSwapTree(spark, dir, cols, asRows, orderBy)
    }
    (asRows.size.toLong, cols.map { case (n, t) => s"`$n` $t" }.mkString(", "))
  }

  /** Append the frame as ONE NEW PART of an existing tree — CH's own
    * INSERT model (every INSERT batch is a part; merges come later via
    * OPTIMIZE). Bounded driver-side like [[write]]; an empty frame
    * appends nothing. The part is STAGED under a `tmp_` name (excluded
    * from part listings, as CH's own tmp_ parts are) and renamed into
    * place, so a mid-write death never leaves a torn readable part
    * (review finding). Returns the appended row count. */
  def appendPart(
      spark: SparkSession,
      df: DataFrame,
      dir0: String,
      orderBy: Seq[String],
      declaredDdl: Option[String] = None,
      op: String = "INSERT INTO"): Long = {
    val dir = localDir(dir0)
    val (asRows, cols) = prepare(spark, df, orderBy, allowEmpty = true, declaredDdl, op)
    if (asRows.isEmpty) return 0L
    require(asRows.size <= PartRows,
      s"INSERT INTO a MergeTree table appends ONE part, bounded to $PartRows " +
        "rows per statement — batch larger loads into multiple INSERTs")
    // number allocation + staging + rename are serialized per endpoint:
    // the QueryServer runs statements on a thread pool, and two
    // unlocked INSERTs could allocate the same part number or sweep
    // each other's in-flight staged dir (advisor finding)
    treeLock(dir).synchronized {
      // the NEXT part starts above every existing block RANGE — max of
      // the MAX block field, so an appended part is never "covered" by
      // a merged part like all_1_5_1 (advisor finding: the MIN field
      // computed 2 here, and real ClickHouse would silently drop the
      // covered part's rows on ATTACH)
      val next = 1 + TableFiles(dir).partDirs()
        .flatMap(TableFiles.maxBlock).maxOption.getOrElse(0)
      val partName = s"all_${next}_${next}_0"
      // unique staged name (fails PartNameRe → invisible to readers);
      // sweep only AGED staged leftovers — a concurrent statement's
      // fresh tmp dir must survive the sweep
      val staged = s"tmp_${java.util.UUID.randomUUID().toString.take(8)}"
      sweepStaged(dir, olderThanMs = StagedSweepAgeMs)
      writeChunk(dir, cols, asRows, staged, orderBy)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir, staged),
        java.nio.file.Paths.get(dir, partName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      MergeTreePartWriter.writeHttpIndex(dir)
    }
    spark.catalog.refreshByPath(dir)
    asRows.size.toLong
  }

  private val StagedSweepAgeMs = 60L * 60 * 1000

  /** Delete `tmp_*` staging dirs under the tree older than the given
    * age — crashed-append debris, never a concurrent writer's live
    * staging (those are seconds old; debris is hours). */
  private def sweepStaged(dir: String, olderThanMs: Long): Unit = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("tmp_") &&
        f.lastModified() < cutoff)
      .foreach { d =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d.toPath).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
  }

  /** One JVM-wide lock object per normalized tree dir. */
  private val treeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def treeLock(dir: String): Object =
    treeLocks.computeIfAbsent(
      java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString,
      _ => new Object)

  /** Maintenance writes address trees by the ATTACH endpoint string,
    * which may carry a file: scheme in any rendering — `file:///p`,
    * `file:/p` (the hadoop Path/URI form the old literal `file://`
    * stripPrefix let through as a RELATIVE path — advisor finding).
    * [[TableFiles.localPath]] is the one normalizer. */
  private def localDir(dir: String): String = TableFiles.localPath(dir)

  /** `name -> CH type` from an ATTACH-style column list. */
  private def parseDdl(ddl: String): Map[String, String] =
    graft.types.ChSchemaParser.splitTopLevel(ddl, ',').map(_.trim).map { entry =>
      if (entry.startsWith("`")) {
        val end = entry.indexOf('`', 1)
        (entry.substring(1, end), entry.substring(end + 1).trim)
      } else {
        val sp = entry.indexWhere(_.isWhitespace)
        require(sp > 0, s"unparseable DDL entry: $entry")
        (entry.substring(0, sp), entry.substring(sp + 1).trim)
      }
    }.toMap

  /** Validate, sort, collect (bounded), derive CH column types from the
    * declared DDL (maintenance) or the schema (CTAS) + observed
    * nullability. */
  private def prepare(
      spark: SparkSession,
      df: DataFrame,
      orderBy: Seq[String],
      allowEmpty: Boolean,
      declaredDdl: Option[String] = None,
      op: String = "CTAS ENGINE=MergeTree"): (Seq[Seq[Any]], Seq[(String, String)]) = {
    val fields = df.schema.fields
    val declared: Map[String, String] = declaredDdl.map(parseDdl).getOrElse(Map.empty)
    orderBy.foreach { k =>
      require(fields.exists(_.name == k),
        s"$op: ORDER BY column '$k' is not in the SELECT")
    }
    // type support refuses from the SCHEMA, before any execution — an
    // unsupported column must not cost the full sort + driver collect
    // first (review finding); a column covered by the declared DDL
    // keeps ITS type and needs no Spark-side derivation
    fields.foreach { f =>
      if (!declared.contains(f.name)) f.dataType match {
        case ArrayType(et, _) => chBase(et)
        case dt => chBase(dt)
      }
    }
    val arrayElem: Map[String, DataType] = fields.collect {
      case StructField(n, ArrayType(et, _), _, _) => n -> et
    }.toMap
    val cap = spark.conf.getOption(MaxRowsConf).map(_.toLong).getOrElse(DefaultMaxRows)
    require(cap > 0 && cap <= Int.MaxValue, s"$MaxRowsConf out of range: $cap")
    val sorted = if (orderBy.nonEmpty)
      df.orderBy(orderBy.map(org.apache.spark.sql.functions.col): _*) else df
    val rows = sorted.limit(cap.toInt + 1).collect()
    require(rows.length <= cap,
      s"$op materializes MergeTree parts driver-side and is " +
        s"bounded to $cap rows ($MaxRowsConf — raise it if the driver " +
        "heap allows); for corpus-scale results use plain CREATE TABLE " +
        "… ORDER BY … AS SELECT (executor-parallel sorted parquet, same " +
        "pruning story)")
    require(allowEmpty || rows.nonEmpty,
      s"$op: empty result — a MergeTree part tree cannot be empty " +
        "(for CTAS use the plain parquet form; a mutation deleting every " +
        "row should drop/recreate the table instead)")

    // nullability from the data; null ARRAY ELEMENTS have no MergeTree
    // encoding in the supported subset and refuse loudly
    val hasNull = Array.fill(fields.length)(false)
    rows.foreach { r =>
      var i = 0
      while (i < fields.length) {
        if (r.isNullAt(i)) hasNull(i) = true
        else if (arrayElem.contains(fields(i).name)) {
          val s = r.getSeq[Any](i)
          require(!s.contains(null),
            s"$op: column '${fields(i).name}' has a NULL " +
              "array element — Nullable inside Array is outside the " +
              "MergeTree subset; coalesce the elements in the SELECT")
        }
        i += 1
      }
    }
    val cols: Seq[(String, String)] = fields.zipWithIndex.map { case (f, i) =>
      declared.get(f.name) match {
        case Some(dt) =>
          // the table's own type is authoritative; NULLs into a
          // non-Nullable column refuse, as ClickHouse itself does — a
          // silently-Nullable rewrite would contradict the registered
          // view's schema and fold IS NULL to false (review finding)
          require(!hasNull(i) || dt.trim.startsWith("Nullable"),
            s"$op: cannot write NULL into non-Nullable column " +
              s"'${f.name}' ($dt) — ClickHouse refuses this too; " +
              "coalesce the value or declare the column Nullable")
          f.name -> dt
        case None =>
          val base = f.dataType match {
            case ArrayType(et, _) => s"Array(${chBase(et)})"
            case dt => chBase(dt)
          }
          val t =
            if (hasNull(i)) {
              require(!f.dataType.isInstanceOf[ArrayType],
                s"$op: array column '${f.name}' has NULL rows " +
                  "— Nullable(Array) is outside the MergeTree subset")
              require(!orderBy.contains(f.name),
                s"$op: ORDER BY column '${f.name}' contains " +
                  "NULLs — a primary-key column must be non-null")
              s"Nullable($base)"
            } else base
          f.name -> t
      }
    }.toSeq

    (rows.iterator.map(_.toSeq).toSeq, cols)
  }

  /** One chunk as one part — COMPACT below the granularity when its
    * types fit the compact subset (CH's min_bytes_for_wide_part rule;
    * a mixed wide/compact tree is the normal shape of a real table). */
  private def writeChunk(
      treeDir: String, cols: Seq[(String, String)], chunk: Seq[Seq[Any]],
      partName: String, orderBy: Seq[String]): Unit = {
    val compactOk = chunk.size < Granularity &&
      cols.forall { case (_, ts) => CompactCodec.supported(ChType.parse(ts)) }
    if (compactOk)
      MergeTreePartWriter.writeCompactPart(
        treeDir, cols, chunk, granularity = Granularity,
        partName = partName, orderBy = orderBy)
    else
      MergeTreePartWriter.writePart(
        treeDir, cols, chunk, granularity = Granularity,
        partName = partName, orderBy = orderBy)
  }

  /** Whole-tree materialization. A re-run over an existing tree goes
    * through the backup-staged swap, so a mid-write failure leaves the
    * previous tree intact rather than a deleted original plus a torn
    * replacement (review finding); a fresh path writes directly.
    *
    * Parts of a REWRITE are numbered above the previous tree's max
    * block: part names are MergeTree's content-version unit, and
    * reusing `all_1_1_0…` across a row-count-preserving mutation left
    * the `name:rows:granules:columns` inventory — and therefore the
    * projection staleness fingerprint — unchanged, so queries kept
    * rerouting to a stale pre-mutation companion (advisor finding,
    * HIGH). Monotonic renumbering restores the doc'd invariant:
    * "merges/mutations replace parts under new names". */
  private def writeOrSwapTree(
      spark: SparkSession, dir: String, cols: Seq[(String, String)],
      asRows: Seq[Seq[Any]], orderBy: Seq[String]): Unit = {
    val root = java.nio.file.Paths.get(dir)
    val existingTree = java.nio.file.Files.isDirectory(root)
    val base =
      if (existingTree)
        TableFiles(dir).partDirs().flatMap(TableFiles.maxBlock)
          .maxOption.getOrElse(0)
      else 0
    def writeTree(treeDir: String): Unit = {
      var partNo = base
      asRows.grouped(PartRows).foreach { chunk =>
        partNo += 1
        writeChunk(treeDir, cols, chunk, s"all_${partNo}_${partNo}_0", orderBy)
      }
      MergeTreePartWriter.writeHttpIndex(treeDir)
    }
    if (existingTree)
      graft.core.FsSwap.replace(spark, dir, "ctas") { tmp =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp.toString))
        writeTree(tmp.toString)
      }
    else writeTree(dir)
  }
}
