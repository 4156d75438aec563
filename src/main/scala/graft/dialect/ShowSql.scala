package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CH `SHOW CREATE TABLE t` → one `statement` row reconstructing the
  * table's DDL (the reference's users introspect attached tables this
  * way; Spark's own SHOW CREATE TABLE only covers catalog tables, not
  * the session views the ATTACH/CTAS flow registers).
  *
  *   - ATTACH'd tables replay their recorded column list, UUID, ORDER
  *     BY, SAMPLE BY and endpoint — a FUNCTIONAL replay (the endpoint
  *     is the resolved one, e.g. a probed `store/<uuid>` root, and its
  *     disk type reflects where it actually points), re-runnable
  *     through this engine's own ATTACH parser;
  *   - CTAS tables, quoted paths, and plain parquet-backed views
  *     render their live Spark schema in CH type names (`Int64`,
  *     `Nullable(String)`, `DateTime`, …).
  */
object ShowSql {

  private val StmtRe =
    """(?is)^\s*SHOW\s+CREATE\s+(?:TABLE\s+)?(?:'([^']+)'|([\w.`"]+))\s*$""".r
  private val ShowTablesRe =
    """(?is)^\s*SHOW\s+TABLES\s*(?:LIKE\s+'([^']*)')?\s*$""".r
  private val DescribeRe =
    """(?is)^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(?:'([^']+)'|([\w.`"]+))\s*$""".r
  private val ExistsRe =
    """(?is)^\s*EXISTS\s+(?:TABLE\s+)?(?:'([^']+)'|([\w.`"]+))\s*$""".r

  private val ProcesslistRe = """(?is)^\s*SHOW\s+PROCESSLIST\s*$""".r

  def isShowCreate(sql: String): Boolean = StmtRe.matches(sql)
  def isIntrospection(sql: String): Boolean =
    StmtRe.matches(sql) || ShowTablesRe.matches(sql) ||
      DescribeRe.matches(sql) || ExistsRe.matches(sql) ||
      ProcesslistRe.matches(sql)

  /** `SHOW TABLES [LIKE '%pat%']` — the session's visible tables (temp
    * views from ATTACH/CTAS plus registered catalog entries), one
    * `name` per row, sorted, as CH lists the current database. */
  private def showTables(spark: SparkSession, like: Option[String]): DataFrame = {
    import spark.implicits._
    // the ONE listing shared with system.tables (review finding: two
    // hand-copies of the merge had already diverged on dedup)
    val all = graft.core.SystemTables.visibleTables(spark).map(_._1)
    val filtered = like match {
      case None => all
      case Some(p) =>
        // CH LIKE: % any run, _ one char, case-sensitive; \% and \_
        // match the literal characters; LIKE '' matches only the
        // empty string (zero tables), as in CH. Escaped per-character
        // — the old quote-then-splice built the regex by substituting
        // inside a \Q…\E block, which both ignored backslash escapes
        // and broke on patterns containing \E (advisor r11).
        val sb = new StringBuilder
        var i = 0
        def lit(c: Char): Unit = {
          if ("\\^$.|?*+()[]{}".indexOf(c.toInt) >= 0) sb.append('\\')
          sb.append(c)
        }
        while (i < p.length) {
          p.charAt(i) match {
            case '\\' if i + 1 < p.length => lit(p.charAt(i + 1)); i += 2
            case '%' => sb.append(".*"); i += 1
            case '_' => sb.append("."); i += 1
            case c => lit(c); i += 1
          }
        }
        val re = sb.toString.r
        all.filter(re.matches(_))
    }
    filtered.toSeq.toDF("name")
  }

  /** `DESCRIBE TABLE t` — CH's seven-column shape (name, type,
    * default_type, default_expression, comment, codec_expression,
    * ttl_expression); the tails render empty, as CH does for columns
    * with no default/comment/codec/TTL. MergeTree-backed tables render
    * their TRUE declared types; everything else the live Spark schema
    * in CH spellings. */
  private def describe(spark: SparkSession, pathLit: Option[String],
      name: Option[String]): DataFrame = {
    import spark.implicits._
    import graft.sources.mergetree.MergeTree
    def fromDdl(ddl: String): Seq[(String, String, Map[String, String])] =
      graft.types.ChSchemaParser.columnDefs(ddl)
    val cols: Seq[(String, String, Map[String, String])] = pathLit match {
      // a quoted path that IS a part tree describes its own columns.txt
      // (the same sniffing the sibling maintenance statements use —
      // review finding: the parquet reader threw on a tree path)
      case Some(p) if MergeTree.looksLikeMergeTree(p) =>
        fromDdl(MergeTree.ddlOf(p))
      case Some(p) =>
        spark.read.parquet(p).schema.fields
          .map(f => (f.name, chType(f), Map.empty[String, String])).toSeq
      case None =>
        val n = name.get
        ProjectionSql.resolveMergeTree(spark, n) match {
          case Some((_, ddl, _)) =>
            // both name spellings — backquoted and bare (review
            // finding: the hand-rolled parse threw on bare names)
            fromDdl(ddl)
          case None => spark.table(n).schema.fields
            .map(f => (f.name, chType(f), Map.empty[String, String])).toSeq
        }
    }
    cols.map { case (c, t, o) =>
      val (defType, defExpr) = o.get("default")
        .map(e => ("DEFAULT", e)).getOrElse(("", ""))
      (c, t, defType, defExpr,
        o.get("comment").map(stripQuotes).getOrElse(""),
        o.get("codec").map(v => "CODEC" + v).getOrElse(""), "")
    }.toDF("name", "type", "default_type", "default_expression",
      "comment", "codec_expression", "ttl_expression")
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("\\'", "'")
    else t
  }

  /** `EXISTS TABLE t` — CH's one-row `result` 0/1. */
  private def exists(spark: SparkSession, pathLit: Option[String],
      name: Option[String]): DataFrame = {
    import spark.implicits._
    val found = pathLit match {
      case Some(p) =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
      case None =>
        val n = name.get
        // case-insensitive catalog scan subsumes the exact lookup —
        // the same resolution SHOW CREATE uses
        spark.catalog.tableExists(n) ||
          graft.core.Catalog.all.exists(_.name.equalsIgnoreCase(n))
    }
    Seq(if (found) 1 else 0).toDF("result")
  }

  def run(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    sql match {
      case ProcesslistRe() =>
        // CH's SHOW PROCESSLIST ≡ SELECT * FROM system.processes
        return graft.core.SystemTables.processes(spark)
      case ShowTablesRe(pat) => return showTables(spark, Option(pat))
      case DescribeRe(p, n) =>
        return describe(spark, Option(p), Option(n).map(ProjectionSql.clean))
      case ExistsRe(p, n) =>
        return exists(spark, Option(p), Option(n).map(ProjectionSql.clean))
      case _ => ()
    }
    val (pathLit, name) = sql match {
      case StmtRe(p, n) => (Option(p), Option(n).map(ProjectionSql.clean))
      case other => throw new IllegalArgumentException(
        s"unparseable SHOW CREATE statement: $other")
    }
    // quoted-path form: same table-designator grammar as the sibling
    // statements — render the parquet schema directly
    pathLit.foreach { p =>
      val cols = spark.read.parquet(p).schema.fields
        .map(f => s"`${f.name}` ${chType(f)}").mkString(", ")
      return Seq(s"CREATE TABLE `$p` ($cols) ENGINE = MergeTree")
        .toDF("statement")
    }
    val n = name.get
    // case-insensitive like table resolution — an exact-case miss must
    // not silently fall through to the generic rendering
    // a plain view renders its registered statement
    graft.core.MatViews.lookupPlain(n).foreach { case (vn, select) =>
      import spark.implicits._
      return Seq(s"CREATE VIEW $vn AS $select").toDF("statement")
    }
    // a materialized view renders its own statement (it has no catalog
    // entry — the registry is the source of truth)
    graft.core.MatViews.lookup(n).foreach { v =>
      import spark.implicits._
      val head = s"CREATE MATERIALIZED VIEW ${v.name}"
      val stmt =
        if (v.inner) {
          val eng = graft.core.Catalog.lookup(v.target)
            .map(_.engineShown).getOrElse("MergeTree")
          s"$head ENGINE = $eng AS ${v.select}"
        } else s"$head TO ${v.target} AS ${v.select}"
      return Seq(stmt).toDF("statement")
    }
    val entry = graft.core.Catalog.lookup(n).orElse(
      graft.core.Catalog.all.find(_.name.equalsIgnoreCase(n)))
    val stmt = entry match {
      // ownsStorage (CTAS) entries render CREATE TABLE below even
      // though they now record their DDL too (review-era fix)
      case Some(t) if t.schemaDdl.nonEmpty && !t.ownsStorage =>
        val uuid = t.uuid.map(u => s" UUID '$u'").getOrElse("")
        val partBy = t.partitionBy.map(p => s" PARTITION BY $p").getOrElse("")
        val orderBy =
          if (t.orderBy.nonEmpty) s" ORDER BY (${t.orderBy.mkString(", ")})" else ""
        val sampleBy = t.sampleBy.map(sb => s" SAMPLE BY $sb").getOrElse("")
        val settings = t.endpoint.map { e =>
          val diskType = if (e.startsWith("http")) "web" else "local"
          s" SETTINGS disk = disk(type = $diskType, endpoint = '$e')"
        }.getOrElse("")
        val ttl = t.ttl.map(x => s" TTL $x").getOrElse("")
        s"ATTACH TABLE ${t.name}$uuid (${t.schemaDdl}) " +
          s"ENGINE = ${t.engineShown}$partBy$orderBy$sampleBy$ttl$settings"
      case other =>
        val orderBy = other.filter(_.orderBy.nonEmpty)
          .map(t => s" ORDER BY (${t.orderBy.mkString(", ")})").getOrElse("")
        val partBy = other.flatMap(_.partitionBy)
          .map(p => s" PARTITION BY $p").getOrElse("")
        // a MergeTree-backed view (CTAS ENGINE=MergeTree) carries its
        // TRUE column list in the relation — render that, not the Spark
        // schema, which marks everything nullable and would print a
        // Nullable ORDER BY key no CH table could declare
        ProjectionSql.resolveMergeTree(spark, n) match {
          case Some((_, ddl, _)) =>
            val eng = other.map(_.engineShown).getOrElse("MergeTree")
            val ttl = other.flatMap(_.ttl).map(x => s" TTL $x").getOrElse("")
            s"CREATE TABLE $n ($ddl) ENGINE = $eng$partBy$orderBy$ttl"
          case None =>
            // CTAS parquet entry or a plain session view — render the
            // live schema in CH type names
            val cols = spark.table(n).schema.fields
              .map(f => s"`${f.name}` ${chType(f)}").mkString(", ")
            s"CREATE TABLE $n ($cols) ENGINE = MergeTree$orderBy"
        }
    }
    Seq(stmt).toDF("statement")
  }

  /** Field rendering honors nullability — the parser's `Nullable(T)`
    * is the correct inverse for Spark's default-nullable columns. */
  private def chType(f: StructField): String =
    if (f.nullable) s"Nullable(${chType(f.dataType)})" else chType(f.dataType)

  /** Spark → ClickHouse type spelling (the inverse of the subset
    * [[graft.types.ChSchemaParser]] accepts). */
  def chType(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BooleanType => "Bool"
    case DateType => "Date"
    case _: TimestampType.type => "DateTime"
    case TimestampNTZType => "DateTime"
    case BinaryType => "String"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(e, _) => s"Array(${chType(e)})"
    case MapType(k, v, _) => s"Map(${chType(k)}, ${chType(v)})"
    case other => other.sql // honest fallback for exotic types
  }
}
