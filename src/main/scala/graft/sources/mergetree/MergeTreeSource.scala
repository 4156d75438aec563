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
    val orderBy = Option(opts.get("orderBy")).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Nil).filter(_.nonEmpty)
    // `parts`: restrict the scan to the named part dirs — the delta
    // unit for incremental projection refresh (parts are MergeTree's
    // append granule); empty = whole table
    val parts = Option(opts.get("parts")).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Nil).filter(_.nonEmpty)
    // rowsPerSplit 0 (the default) = AUTO: sized from the table's total
    // rows and the session's parallelism at planning (see
    // [[MergeTreeScan.planInputPartitions]]) — small tables get
    // row-bounded fan-out, large ones avoid drowning the scheduler in
    // tiny tasks (measured: 6M rows in 240 splits cost 2-10× the same
    // scan in 80). An explicit value pins it; either way the split
    // bounds per-task decode memory.
    new MergeTreeTable(
      MergeTreeSource.endpoint(opts), MergeTreeSource.ddl(opts), schema,
      opts.getLong("rowsPerSplit", 0L), orderBy, parts)
  }
}

/** Public facade for the catalog layer ([[graft.core.Catalog]] routes
  * ATTACH endpoints here when they hold a MergeTree part tree). */
object MergeTree {
  def looksLikeMergeTree(endpoint: String): Boolean =
    TableFiles.looksLikeMergeTree(endpoint)

  /** `<endpoint>/store/<uuid[0,3)>/<uuid>` — where a web disk keeps a
    * table's part tree (the ATTACH statement's UUID names it). */
  def storeRoot(endpoint: String, uuid: String): String =
    TableFiles.storeRoot(endpoint, uuid)

  /** Normalized local filesystem path of an endpoint (any `file:`
    * rendering stripped) — the identity the maintenance tier compares
    * endpoints by. */
  def localPath(endpoint: String): String = TableFiles.localPath(endpoint)

  /** Session knob routing even local tree writes through the Hadoop
    * FileSystem API (`hadoop`) — see [[TreeFs.ForceHadoopConf]]. */
  val FsConf: String = TreeFs.ForceHadoopConf

  /** Validate a CH type string against the decodable MergeTree subset
    * (throws with the subset description) — the schema-evolution DDL
    * check, surfaced here because [[ChType]] is package-private. */
  def validateType(ts: String): Unit = { ChType.parse(ts); () }

  /** Remove every part of partition `pid` from a LOCAL tree — CH's
    * `ALTER TABLE … DROP PARTITION`: metadata-time retention, no
    * rewrite of surviving parts. Dropping an absent partition is a
    * no-op (CH's behavior). Returns the dropped row count (the parts'
    * own count.txt sums). The part-set change moves the tree's
    * fingerprint, so registered projections fall back to source until
    * re-materialized. */
  def dropPartition(
      spark: org.apache.spark.sql.SparkSession,
      endpoint: String, pid: String): Long = {
    val (dir, fs) = TreeFs.forWrite(endpoint)
    val rows = MergeTreeCtas.withTreeLock(dir) {
      val tf = TableFiles(dir)
      val victims = tf.partDirs()
        .filter(p => MergeTreePartitioning.pidOf(p) == pid)
      val n = victims.map(p => tf.text(s"$p/count.txt").trim.toLong).sum
      victims.foreach(p => fs.deleteTree(fs.join(dir, p)))
      if (victims.nonEmpty) MergeTreePartWriter.writeHttpIndex(dir, fs)
      n
    }
    spark.catalog.refreshByPath(dir)
    rows
  }

  /** Delete EXACTLY the named parts (already-absent names no-op).
    * The crash-safe half of OPTIMIZE PARTITION: the merged
    * replacements ATTACH under fresh block numbers FIRST, then the
    * superseded originals drop BY NAME — a failure between the two
    * steps leaves duplicate rows the next OPTIMIZE collapses, never
    * lost rows (advisor r12: drop-then-attach lost the partition when
    * the attach failed); drop-by-name also spares any part a
    * concurrent INSERT added to the partition after the merge read
    * its inputs. */
  def dropParts(
      spark: org.apache.spark.sql.SparkSession,
      endpoint: String, parts: Seq[String]): Long = {
    val (dir, fs) = TreeFs.forWrite(endpoint)
    val rows = MergeTreeCtas.withTreeLock(dir) {
      val tf = TableFiles(dir)
      val live = tf.partDirs().toSet
      val victims = parts.filter(live)
      val n = victims.map(p => tf.text(s"$p/count.txt").trim.toLong).sum
      victims.foreach(p => fs.deleteTree(fs.join(dir, p)))
      if (victims.nonEmpty) MergeTreePartWriter.writeHttpIndex(dir, fs)
      n
    }
    spark.catalog.refreshByPath(dir)
    rows
  }

  /** Part inventory for `system.parts`: (part name, rows, granules,
    * column count) per part under the endpoint. */
  def partsInfo(endpoint: String): Seq[(String, Long, Int, Int)] = {
    val tf = TableFiles(endpoint)
    tf.partDirs().map { p =>
      val meta = PartMeta.read(tf, p)
      (p, meta.rows, meta.granuleRows.length, meta.columns.size)
    }
  }
  def read(spark: org.apache.spark.sql.SparkSession, endpoint: String,
      ddl: String, orderBy: Seq[String] = Nil,
      parts: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    spark.read.format("mergetree")
      .option("endpoint", endpoint).option("ddl", ddl)
      .option("orderBy", orderBy.mkString(","))
      .option("parts", parts.mkString(","))
      .load()

  /** (endpoint, ddl, orderBy) when the logical-plan node is a mergetree
    * DSv2 relation over the WHOLE table — the hook the projection
    * reroute and DDL layer use to recognize an ATTACHed MergeTree table
    * ([[graft.plans.AggProjectionRewrite]], VERDICT r9 task #3). A
    * parts-filtered read (the incremental-refresh delta scan) is NOT
    * the table and must never match — a reroute would answer a partial
    * read from the full companion. */
  def relationInfo(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[(String, String, Seq[String])] = p match {
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      d.table match {
        case t: MergeTreeTable if t.partsFilter.isEmpty =>
          Some((t.endpoint, t.ddl, t.orderBy))
        case _ => None
      }
    // after V2ScanRelationPushDown the relation is wrapped in a
    // ScanRelation — rules injected late (the runtime
    // extraOptimizations path, used by sessions built without the
    // extensions conf) only ever see this shape, so both must match
    // (review: the reroute silently never fired on such sessions)
    case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      relationInfo(s.relation)
    case _ => None
  }

  /** ATTACH-style column list synthesized from a tree's first part
    * (`columns.txt`) — lets maintenance statements target a bare path
    * with no session DDL in scope. A VALIDATED partless tree (root
    * format_version.txt, no parts) returns "" — it has no schema to
    * synthesize, and path-form maintenance on it is a no-op (review
    * finding: the empty-table feature's own statements threw here). */
  def ddlOf(endpoint: String): String = {
    val tf = TableFiles(endpoint)
    val parts = tf.partDirs()
    if (parts.isEmpty) {
      require(tf.exists("format_version.txt"),
        s"no MergeTree parts under endpoint '$endpoint'")
      ""
    } else
      PartMeta.read(tf, parts.head).columns
        .map { case (n, t) => s"`$n` $t" }.mkString(", ")
  }

  /** Does any part of the tree carry a non-empty primary index? Used by
    * the path-form maintenance statements: rewriting such a tree with
    * an unknown ORDER BY key would silently drop the index and the
    * clustering it documents — refuse and point at the named table,
    * whose key the catalog knows. */
  def hasPrimaryIndex(endpoint: String): Boolean = {
    val tf = TableFiles(endpoint)
    tf.partDirs().exists(p =>
      tf.exists(s"$p/primary.idx") && tf.smallFile(s"$p/primary.idx").nonEmpty)
  }

  /** Maintenance (OPTIMIZE / mutations) applies to LOCAL trees only:
    * an http(s) endpoint is a web disk, and web disks are READ-ONLY in
    * ClickHouse's own contract — refusing is the faithful behavior. */
  def requireLocalForMaintenance(endpoint: String, op: String): Unit =
    require(!endpoint.startsWith("http://") && !endpoint.startsWith("https://"),
      s"$op on '$endpoint': an http(s) web-disk endpoint is read-only " +
        "(ClickHouse web disks are too) — mirror the parts to a local " +
        "tree to maintain them")

  /** Sorted part inventory lines `name:rows:granules:columns` — the
    * table's content identity. Parts are immutable BY NAME in MergeTree
    * semantics — appends add parts, merges/mutations replace them under
    * new names — so the part set is the table version, and set
    * difference against a recorded inventory yields the append delta. */
  def partsInventory(endpoint: String): Seq[String] =
    partsInfo(endpoint).map { case (p, rows, g, c) => s"$p:$rows:$g:$c" }.sorted

  /** md5 of [[partsInventory]] — the staleness fingerprint. */
  def partsFingerprint(endpoint: String): String =
    fingerprintOf(partsInventory(endpoint))

  def fingerprintOf(inventory: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(inventory.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
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

private[mergetree] final class MergeTreeTable(
    val endpoint: String, val ddl: String, tableSchema: StructType,
    rowsPerSplit: Long, val orderBy: Seq[String],
    val partsFilter: Seq[String] = Nil)
  extends Table with SupportsRead {
  override def name(): String = s"mergetree($endpoint)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MergeTreeScanBuilder(endpoint, ddl, tableSchema, rowsPerSplit, orderBy,
      partsFilter)
}

private final class MergeTreeScanBuilder(
    endpoint: String, ddl: String, full: StructType, rowsPerSplit: Long,
    orderBy: Seq[String], partsFilter: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = full
  private var prunePredicates: Array[Filter] = Array.empty
  private var partPredicates: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Granule pruning is SKIPPING, not filtering — like parquet row-group
    * stats, every filter is returned for Spark to re-evaluate; the ones
    * on the leading primary-key column are additionally recorded (and
    * reported via pushedFilters, so `.explain` shows them) to drive the
    * mark-range selection in [[MergeTreeScan]]. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val key = orderBy.headOption
    // Enum keys: the part orders by CH enum CODE while Spark evaluates
    // the surfaced String column LEXICOGRAPHICALLY — the two orders
    // disagree, so RANGE predicates must not prune on enum keys (review
    // finding: a code-ordered granule can hold names inside a
    // lexicographic range its code range excludes). Equality/IN stay
    // sound: name↔code is a bijection, membership is order-free.
    val keyIsEnum = key.exists { k =>
      try graft.types.ChSchemaParser.splitTopLevel(ddl, ',').map(_.trim)
        .exists(c => c.startsWith(s"`$k`") && c.contains("Enum"))
      catch { case _: Exception => true } // unparseable → be conservative
    }
    prunePredicates = key match {
      case Some(k) => filters.filter {
        case EqualTo(a, v) => a == k && v != null
        case In(a, vs) => a == k && vs.nonEmpty && !vs.contains(null)
        case GreaterThan(a, v) => a == k && v != null && !keyIsEnum
        case GreaterThanOrEqual(a, v) => a == k && v != null && !keyIsEnum
        case LessThan(a, v) => a == k && v != null && !keyIsEnum
        case LessThanOrEqual(a, v) => a == k && v != null && !keyIsEnum
        case _ => false
      }
      case None => Array.empty[Filter]
    }
    // part-level minmax pruning considers simple predicates on ANY
    // column: only parts that actually carry a `minmax_<col>.idx` for
    // the column (partition-key source columns) are affected, so
    // recording broadly costs one memoized exists() per part
    partPredicates = filters.filter {
      case EqualTo(_, v) => v != null
      case In(_, vs) => vs.nonEmpty && !vs.contains(null)
      case GreaterThan(_, v) => v != null
      case GreaterThanOrEqual(_, v) => v != null
      case LessThan(_, v) => v != null
      case LessThanOrEqual(_, v) => v != null
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] =
    (prunePredicates ++ partPredicates).distinct

  override def build(): Scan =
    new MergeTreeScan(endpoint, ddl, required, rowsPerSplit, orderBy,
      prunePredicates, partsFilter, partPredicates)
}

private final class MergeTreeScan(
    endpoint: String, ddl: String, required: StructType,
    configuredRowsPerSplit: Long,
    orderBy: Seq[String],
    prunePredicates: Array[org.apache.spark.sql.sources.Filter],
    partsFilter: Seq[String] = Nil,
    partPredicates: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mergetree endpoint=$endpoint columns=[${required.fieldNames.mkString(",")}]" +
      (if (prunePredicates.nonEmpty)
        s" prune=[${prunePredicates.mkString(",")}]" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val tf = TableFiles(endpoint)
    val allParts = tf.partDirs()
    val parts =
      if (partsFilter.isEmpty) allParts
      else {
        val missing = partsFilter.filterNot(allParts.contains)
        require(missing.isEmpty,
          s"parts option names absent parts under '$endpoint': ${missing.mkString(", ")}")
        allParts.filter(partsFilter.contains)
      }
    // a PARTLESS tree is a valid EMPTY table when the root carries the
    // format_version.txt marker (CH: a table IS its metadata, parts are
    // optional — VERDICT r10 missing #3); without the marker an empty
    // part list still refuses, or a typo'd endpoint would silently
    // return zero rows
    if (parts.isEmpty) {
      require(tf.exists("format_version.txt"),
        s"no MergeTree parts under endpoint '$endpoint'")
      return Array.empty
    }
    // part-level MINMAX pruning (CH's partition pruning): a part whose
    // `minmax_<col>.idx` range excludes a pushed predicate never has
    // its metadata read, let alone its data — at a year-partitioned
    // 100 TB table a one-month query plans over one partition's parts.
    // The sweep runs on the same bounded pool as the metadata reads
    // (each http part costs a round-trip) and decodes each referenced
    // column's minmax ONCE per part however many predicates touch it.
    val selected =
      if (partPredicates.isEmpty) parts
      else graft.core.DriverPool.map(parts)(p => (p, partQualifies(tf, p)))
        .filter(_._2).map(_._1)
    if (selected.isEmpty) return Array.empty
    // per-part metadata on a bounded driver pool — serial reads make
    // planning linear in part count single-threaded (the same shape as
    // the projection fingerprint sweep), and each http part costs a
    // round-trip
    val metas: Map[String, PartMeta] =
      graft.core.DriverPool.map(selected)(p => p -> PartMeta.read(tf, p)).toMap
    // AUTO split size: aim for ~2 tasks per core over the SELECTED
    // parts, floored at 64k rows (under that, task overhead dominates
    // decode — measured) and capped at 1M (bounds per-task memory for
    // wide decodes)
    val rowsPerSplit =
      if (configuredRowsPerSplit > 0) configuredRowsPerSplit
      else {
        val total = metas.values.map(_.rows).sum
        val par = math.max(org.apache.spark.sql.SparkSession.active
          .sparkContext.defaultParallelism, 1)
        math.min(math.max(total / (2L * par), 1L << 16), 1L << 20)
      }
    selected.iterator.flatMap { part =>
      val meta = metas(part)
      // compact parts: refuse unsupported column types at PLANNING, not
      // mid-task on an executor
      if (meta.compact) {
        val partTypes = meta.columns.toMap
        required.fieldNames.foreach { c =>
          partTypes.get(c).foreach { ts =>
            val t = ChType.parse(ts)
            require(CompactCodec.supported(t),
              s"compact part $part: column `$c` of type $ts is outside " +
                "the compact-part subset (scalars, Nullable(scalar), " +
                "Array(scalar))")
          }
        }
      }
      val keep = qualifyingGranules(tf, part, meta)
      // split CONTIGUOUS runs of qualifying granules into row-bounded
      // mark ranges (mid-part starts are fully supported by the decode)
      val splits = Array.newBuilder[InputPartition]
      var start = -1
      var acc = 0L
      def flush(end: Int): Unit = if (start >= 0) {
        splits += MergeTreeSplit(tf, part, start,
          meta.granuleRows.slice(start, end), meta.columns, meta.compact)
        start = -1; acc = 0L
      }
      var i = 0
      while (i < meta.granuleRows.length) {
        if (keep(i)) {
          if (start < 0) start = i
          acc += meta.granuleRows(i)
          if (acc >= rowsPerSplit) flush(i + 1)
        } else flush(i)
        i += 1
      }
      flush(meta.granuleRows.length)
      splits.result()
    }.toArray
  }

  /** Can this part contain rows matching the pushed predicates, judged
    * by its `minmax_<col>.idx` sidecars? A column with no minmax file,
    * an uncomparable/enum type, or an uncomparable literal KEEPS the
    * part — pruning is skipping, never filtering. */
  /** Predicates grouped by referenced column with that column's
    * prunable CH type — computed once per scan, not per part. A column
    * outside the DDL, with an enum/uncomparable type, never prunes. */
  private lazy val partPruneByColumn
      : Seq[(String, ChType, Seq[org.apache.spark.sql.sources.Filter])] = {
    import org.apache.spark.sql.sources._
    val ddlTypes: Map[String, String] =
      try graft.types.ChSchemaParser.columnPairs(ddl).toMap
      catch { case _: Exception => Map.empty }
    def attrOf(f: Filter): Option[String] = f match {
      case EqualTo(a, _) => Some(a)
      case In(a, _) => Some(a)
      case GreaterThan(a, _) => Some(a)
      case GreaterThanOrEqual(a, _) => Some(a)
      case LessThan(a, _) => Some(a)
      case LessThanOrEqual(a, _) => Some(a)
      case _ => None
    }
    partPredicates.toSeq.flatMap(f => attrOf(f).map(_ -> f))
      .groupBy(_._1).toSeq.flatMap { case (a, fs) =>
        val tOpt =
          try ddlTypes.get(a).map(ChType.parse)
          catch { case _: Exception => None }
        tOpt.flatMap { t0 =>
          val inner = t0 match {
            case ChType.LowCardinalityT(i) => i
            case x => x
          }
          val enumLike = inner match {
            case _: ChType.Enum => true
            case _ => false
          }
          if (enumLike || !KeyOrdering(Seq(t0)).comparable(inner)) None
          else Some((a, t0, fs.map(_._2)))
        }
      }
  }

  private def partQualifies(tf: TableFiles, part: String): Boolean = {
    import org.apache.spark.sql.sources._
    partPruneByColumn.forall { case (a, t0, fs) =>
      val inner = t0 match {
        case ChType.LowCardinalityT(i) => i
        case x => x
      }
      val ord = KeyOrdering(Seq(t0))
      PartMeta.minMaxIndex(tf, part, a, t0) match {
        case None => true
        case Some((lo, hi)) =>
          def keep(p: => Boolean): Boolean =
            try p catch { case _: Exception => true }
          fs.forall {
            case EqualTo(_, v) => keep(
              ord.compareValues(inner, lo, v) <= 0 &&
                ord.compareValues(inner, hi, v) >= 0)
            case In(_, vs) => keep(vs.exists(v =>
              ord.compareValues(inner, lo, v) <= 0 &&
                ord.compareValues(inner, hi, v) >= 0))
            case GreaterThan(_, v) =>
              keep(ord.compareValues(inner, hi, v) > 0)
            case GreaterThanOrEqual(_, v) =>
              keep(ord.compareValues(inner, hi, v) >= 0)
            case LessThan(_, v) =>
              keep(ord.compareValues(inner, lo, v) < 0)
            case LessThanOrEqual(_, v) =>
              keep(ord.compareValues(inner, lo, v) <= 0)
            case _ => true
          }
      }
    }
  }

  /** Which granules can contain rows matching the pushed key-prefix
    * predicates. Granule g's leading-key range is [idx(g), idx(g+1)] —
    * inclusive BOTH ends, a boundary value can straddle granules; the
    * last granule of a part is unbounded above. No index / no
    * predicates / uncomparable key type → keep everything. */
  private def qualifyingGranules(
      tf: TableFiles, part: String, meta: PartMeta): Int => Boolean = {
    val n = meta.granuleRows.length
    if (prunePredicates.isEmpty || orderBy.isEmpty) return _ => true
    val partTypes = meta.columns.toMap
    val keyTypes =
      try orderBy.flatMap(k => partTypes.get(k).map(ChType.parse))
      catch { case _: Exception => Nil }
    if (keyTypes.size != orderBy.size) return _ => true
    val ord = KeyOrdering(keyTypes)
    val keyT = keyTypes.head match {
      case ChType.LowCardinalityT(inner) => inner
      case t => t
    }
    if (!ord.comparable(keyT)) return _ => true
    PartMeta.primaryIndex(tf, part, keyTypes, n) match {
      case None => _ => true
      case Some(idx) =>
        import org.apache.spark.sql.sources._
        (g: Int) => {
          val gLo = idx(g)
          val gHi = if (g + 1 < n) Some(idx(g + 1)) else None
          // a predicate whose literal cannot be compared (e.g. a value
          // outside an enum declaration) must KEEP the granule — mapping
          // the failure to "equal" would actively prune and silently
          // drop rows (review finding)
          def keep(p: => Boolean): Boolean =
            try p catch { case _: Exception => true }
          prunePredicates.forall {
            case EqualTo(_, v) => keep(
              ord.compareValues(keyT, gLo, v) <= 0 &&
                gHi.forall(h => ord.compareValues(keyT, h, v) >= 0))
            case GreaterThan(_, v) => keep(
              gHi.forall(h => ord.compareValues(keyT, h, v) > 0))
            case GreaterThanOrEqual(_, v) => keep(
              gHi.forall(h => ord.compareValues(keyT, h, v) >= 0))
            case LessThan(_, v) => keep(ord.compareValues(keyT, gLo, v) < 0)
            case LessThanOrEqual(_, v) => keep(ord.compareValues(keyT, gLo, v) <= 0)
            case In(_, vs) => keep(
              vs.exists(v => ord.compareValues(keyT, gLo, v) <= 0 &&
                gHi.forall(h => ord.compareValues(keyT, h, v) >= 0)))
            case _ => true
          }
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MergeTreeReaderFactory(required, ddl)
}

/** One granule range of one part. Carries the part's own column list so
  * the reader decodes what the PART has, not what the table declares. */
private final case class MergeTreeSplit(
    files: TableFiles,
    part: String,
    markStart: Int,
    granuleRows: Array[Int],
    partColumns: Seq[(String, String)],
    compact: Boolean) extends InputPartition

private final class MergeTreeReaderFactory(required: StructType, ddl: String)
  extends PartitionReaderFactory {

  private val requiredCols: Seq[String] = required.fieldNames.toSeq

  /** Columnar whenever the projected schema is vectorizable (the full
    * supported MergeTree subset is) — decided from the scan-wide
    * schema, never per split, so Spark sees a uniform answer. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    ColumnarFill.supported(required)

  /** Run `body` with a stream context for one column of one wide part;
    * every opened file closes on exit. */
  private def withStreams[A](split: MergeTreeSplit)(body: ColumnCodec.Streams => A): A = {
    val opened = scala.collection.mutable.ArrayBuffer.empty[SeekableFile]
    val streams = new ColumnCodec.Streams(
      s => {
        val f = split.files.seekable(s"${split.part}/$s.bin")
        opened += f
        new ChCompressedReader(f)
      },
      s => PartMeta.marksOf(split.files, split.part, s))
    try body(streams) finally opened.foreach(_.close())
  }

  /** One decode shared by both emit shapes: per-column Catalyst values
    * for the split, bounded by rowsPerSplit. An unprojected or
    * part-missing column never opens a stream. */
  private def decodeColumns(split: MergeTreeSplit, n: Int): Array[Array[Any]] = {
    val partTypes = split.partColumns.toMap
    if (split.compact) decodeCompact(split, n)
    else requiredCols.toArray.map { c =>
      partTypes.get(c) match {
        case None => Array.fill[Any](n)(null) // column added after this part was written
        case Some(chTypeStr) =>
          val t = ChType.parse(chTypeStr)
          withStreams(split)(st =>
            ColumnCodec.decode(c, t, st, split.markStart, split.granuleRows))
      }
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[MergeTreeSplit]
    val n = split.granuleRows.sum
    val colValues = decodeColumns(split, n)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < n }
      override def get(): InternalRow =
        new GenericInternalRow(Array.tabulate[Any](colValues.length)(c => colValues(c)(i)))
      override def close(): Unit = ()
    }
  }

  /** The columnar emit (VERDICT r9 task #1): one primitive-vector batch
    * per split — downstream operators and the ColumnarToRow transition
    * run inside whole-stage codegen over vector slots instead of
    * unboxing a GenericInternalRow per row. Plain scalar columns (the
    * hot numeric/string case) decode STRAIGHT into the vector with no
    * boxed intermediate ([[ColumnCodec.scalarsInto]]); wrapper types
    * (Nullable/LowCardinality/Array) and compact parts decode boxed and
    * fill. */
  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val split = partition.asInstanceOf[MergeTreeSplit]
    val n = split.granuleRows.sum
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var emitted = false
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean =
        if (emitted) false
        else {
          batch =
            if (split.compact)
              ColumnarFill.batch(required, decodeColumns(split, n), n)
            else {
              val partTypes = split.partColumns.toMap
              val vectors = required.fields.map { f =>
                val v = new org.apache.spark.sql.execution.vectorized
                  .OnHeapColumnVector(n, f.dataType)
                partTypes.get(f.name) match {
                  case None => v.putNulls(0, n) // column added after this part
                  case Some(chTypeStr) =>
                    ChType.parse(chTypeStr) match {
                      // LowCardinality(String[, Nullable]) emits a
                      // DICTIONARY-BACKED vector (r16): the split-global
                      // key list becomes the vector dictionary and rows
                      // carry int ids — a dictionary-aware consumer
                      // (graft.plans.DictAgg) then touches each distinct
                      // value once per batch instead of once per row,
                      // the same contract the parquet reader gives it
                      case ChType.LowCardinalityT(inner)
                          if inner == ChType.Str ||
                            inner == ChType.NullableT(ChType.Str) =>
                        val (keys, ids) = withStreams(split)(st =>
                          ColumnCodec.decodeLowCardinalityIndexed(
                            f.name, inner, st, split.markStart,
                            split.granuleRows))
                        val keyBytes = keys.map(
                          _.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
                            .getBytes)
                        v.setDictionary(new LcVectorDictionary(keyBytes))
                        val idsVec = v.reserveDictionaryIds(n)
                        var i = 0
                        while (i < n) {
                          if (ids(i) < 0) v.putNull(i)
                          else idsVec.putInt(i, ids(i))
                          i += 1
                        }
                      case t if ColumnCodec.fastScalar(t) =>
                        withStreams(split)(st => ColumnCodec.scalarsInto(
                          t, st.seek(f.name, split.markStart), n, v))
                      case t =>
                        val vals = withStreams(split)(st => ColumnCodec.decode(
                          f.name, t, st, split.markStart, split.granuleRows))
                        ColumnarFill.fillColumn(v, f.dataType, vals, n)
                    }
                }
                v
              }
              new org.apache.spark.sql.vectorized.ColumnarBatch(
                vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
            }
          emitted = true
          true
        }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }

  /** Compact part: one shared `data.bin`, per-(granule, column) marks
    * from `data.mrk3`. Column pruning still skips DECODE for
    * unprojected columns (their chunks are seeked past, never
    * deserialized), though the shared file is opened once regardless. */
  private def decodeCompact(split: MergeTreeSplit, n: Int): Array[Array[Any]] = {
    val partTypes = split.partColumns.toMap
    val colIdx = split.partColumns.map(_._1).zipWithIndex.toMap
    if (requiredCols.isEmpty) return Array.empty
    val (marks, _) = PartMeta.compactMarks(split.files, split.part, split.partColumns.size)
    val f = split.files.seekable(s"${split.part}/data.bin")
    try {
      val r = new ChCompressedReader(f)
      requiredCols.toArray.map { c =>
        partTypes.get(c) match {
          case None => Array.fill[Any](n)(null)
          case Some(chTypeStr) =>
            CompactCodec.decode(c, ChType.parse(chTypeStr), r, marks,
              colIdx(c), split.markStart, split.granuleRows)
        }
      }
    } finally f.close()
  }
}


/** Column-vector dictionary over a LowCardinality split's key bytes —
  * implements Spark's `Dictionary` so `WritableColumnVector` serves
  * `getUTF8String` through id lookup (only `decodeToBinary` is ever
  * called for string vectors). */
private[mergetree] final class LcVectorDictionary(keys: Array[Array[Byte]])
    extends org.apache.spark.sql.execution.vectorized.Dictionary {
  override def decodeToBinary(id: Int): Array[Byte] = keys(id)
  override def decodeToInt(id: Int): Int =
    throw new UnsupportedOperationException("LC string dictionary")
  override def decodeToLong(id: Int): Long =
    throw new UnsupportedOperationException("LC string dictionary")
  override def decodeToFloat(id: Int): Float =
    throw new UnsupportedOperationException("LC string dictionary")
  override def decodeToDouble(id: Int): Double =
    throw new UnsupportedOperationException("LC string dictionary")
}
