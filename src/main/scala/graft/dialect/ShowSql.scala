package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CH `SHOW CREATE TABLE t` → one `statement` row reconstructing the
  * table's DDL (the reference's users introspect attached tables this
  * way; Spark's own SHOW CREATE TABLE only covers catalog tables, not
  * the session views the ATTACH/CTAS flow registers).
  *
  *   - ATTACH'd tables replay their recorded column list, ORDER BY and
  *     endpoint verbatim;
  *   - CTAS tables and plain parquet-backed views render their Spark
  *     schema in CH type names (`Int64`, `Float64`, `DateTime`, …).
  */
object ShowSql {

  private val StmtRe =
    """(?is)^\s*SHOW\s+CREATE\s+(?:TABLE\s+)?([\w.`"]+)\s*$""".r

  def isShowCreate(sql: String): Boolean = StmtRe.matches(sql)

  def run(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val name = sql match {
      case StmtRe(n) => ProjectionSql.clean(n)
      case other => throw new IllegalArgumentException(
        s"unparseable SHOW CREATE statement: $other")
    }
    val stmt = graft.core.Catalog.lookup(name) match {
      case Some(t) if t.schemaDdl.nonEmpty =>
        val orderBy =
          if (t.orderBy.nonEmpty) s" ORDER BY (${t.orderBy.mkString(", ")})" else ""
        val settings = t.endpoint
          .map(e => s" SETTINGS disk = disk(type = web, endpoint = '$e')")
          .getOrElse("")
        s"ATTACH TABLE ${t.name} (${t.schemaDdl}) ENGINE = MergeTree$orderBy$settings"
      case other =>
        // CTAS entry (schema not recorded as DDL) or a plain session
        // view — render the live schema in CH type names
        val schema = spark.table(name).schema
        val cols = schema.fields
          .map(f => s"`${f.name}` ${chType(f.dataType)}").mkString(", ")
        val orderBy = other.filter(_.orderBy.nonEmpty)
          .map(t => s" ORDER BY (${t.orderBy.mkString(", ")})").getOrElse("")
        s"CREATE TABLE $name ($cols) ENGINE = MergeTree$orderBy"
    }
    Seq(stmt).toDF("statement")
  }

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
