package graft.sources.mergetree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MergeTree `PARTITION BY` support — the data-lifecycle axis of the
  * format (reference analog: every production ClickHouse table
  * partitions, usually by `toYYYYMM(date)`, and retention is `ALTER
  * TABLE … DROP PARTITION`). A partitioned tree's parts are named
  * `<partition id>_<min>_<max>_<level>` instead of `all_…`; block
  * numbers are table-global but part COVERAGE is judged within a
  * partition, so two parts of different partitions may share block
  * numbers.
  *
  * Partition-ID rendering (what becomes the part-name prefix):
  *   - integer results (incl. `toYYYYMM`/`toYear`) → decimal text;
  *   - Date results → `yyyyMMdd` digits;
  *   - String results → verbatim when filesystem/name-safe
  *     (`[A-Za-z0-9-]{1,64}` — underscore is the part-name separator),
  *     otherwise 16-hex of xxhash64. ClickHouse hashes exotic keys too
  *     (sipHash128); the IDs differ there but the semantics — grouping,
  *     minmax pruning, DROP PARTITION by ID — are identical.
  * Anything else (floats, timestamps, tuples) refuses loudly: CH
  * practice partitions by low-cardinality date/int/string derivations,
  * and a float partition key is a modeling bug we'd rather surface.
  *
  * Each written part also carries `partition.dat` (the partition VALUE
  * in its native binary) and, when the partition expression derives
  * from exactly one scalar column, `minmax_<col>.idx` (min and max of
  * that SOURCE column, serialized like `primary.idx` entries) — CH's
  * own files, which the scan uses for part-level pruning on predicates
  * over the source column.
  */
object MergeTreePartitioning {

  /** Internal staging columns appended after the table's own columns. */
  val PvalCol = "__graft_pval"
  val PidCol = "__graft_pid"

  private val SafeId = "^[A-Za-z0-9-]{1,64}$"

  /** CH type string for the partition VALUE's Spark type (the
    * `partition.dat` encoding). */
  private def pvalChType(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case DateType => "Date32"
    case StringType => "String"
    case other => throw new IllegalArgumentException(
      s"PARTITION BY expression of type ${other.simpleString} is not " +
        "supported — partition by an integer, date, or string " +
        "derivation (e.g. toYYYYMM(date_col))")
  }

  /** Append [[PvalCol]] and [[PidCol]] to `df` for the partition
    * expression `partitionBy` (CH function names resolve through the
    * session's registered dialect functions). Returns the staged frame,
    * the partition value's CH type string, and the single source column
    * name when the expression derives from exactly one column (the
    * minmax-index subject). */
  def stage(df: DataFrame, partitionBy: String): (DataFrame, String, Option[String]) = {
    val pv = expr(partitionBy)
    val probe = df.select(pv.as(PvalCol))
    val dt = probe.schema.head.dataType
    val chT = pvalChType(dt)
    val refs = probe.queryExecution.analyzed.expressions
      .flatMap(_.references.map(_.name)).distinct
    val srcCol = refs match {
      case Seq(one) => Some(one)
      case _ => None
    }
    val pvalC = pv.as(PvalCol)
    val pidC: Column = (dt match {
      case ByteType | ShortType | IntegerType | LongType => pv.cast(StringType)
      case DateType => date_format(pv, "yyyyMMdd")
      case StringType =>
        // NULL must PROPAGATE so the writer's refusal fires with its
        // clean message — Spark's xxhash64 ignores null args and
        // returns its seed, which would mint a phantom id (review
        // finding). 'all' is the unpartitioned sentinel in part names
        // — a literal 'all' value takes the hashed spelling instead.
        when(pv.isNull, lit(null).cast(StringType))
          .when(pv.rlike(SafeId) && pv =!= "all", pv)
          .otherwise(lower(hex(xxhash64(pv))))
      case other => throw new IllegalArgumentException(other.simpleString)
    }).as(PidCol)
    (df.select(col("*"), pvalC, pidC), chT, srcCol)
  }

  /** CH's "no partitioning" spelling — `PARTITION BY tuple()` — which
    * its own SHOW CREATE emits for unpartitioned tables. Callers map it
    * to None before recording. */
  def isNoPartition(expr: String): Boolean =
    expr.trim.matches("(?i)tuple\\s*\\(\\s*\\)")

  /** Render a DROP PARTITION literal the way the writer rendered the
    * ID. `isId` is the explicit `DROP PARTITION ID '…'` form (verbatim).
    * Value form: numbers verbatim, name-safe strings verbatim; anything
    * else must use the ID form (we will not re-derive a hashed ID from
    * a literal without the expression's type context). */
  def renderDropId(literal: String, isId: Boolean): String = {
    val raw = literal.trim.stripPrefix("'").stripSuffix("'").trim
    require(raw.nonEmpty, "empty partition id")
    if (isId) raw
    // a date literal must render the way the writer rendered Date
    // partition values (yyyyMMdd digits) — passing '1994-01-01' through
    // verbatim silently dropped nothing (review finding)
    else if (raw.matches("^\\d{4}-\\d{2}-\\d{2}$")) raw.replace("-", "")
    else if (raw.matches("^-?\\d+$") || (raw.matches(SafeId) && raw != "all")) raw
    else throw new IllegalArgumentException(
      s"DROP PARTITION $literal: this value renders as a hashed " +
        "partition id — use DROP PARTITION ID '<id>' with the id shown " +
        "in the part names / system.parts")
  }

  /** The partition-id prefix of a part name (`all` for unpartitioned
    * tables) — the ONE place this parse lives (review finding: four
    * copies had appeared). */
  def pidOf(partName: String): String =
    partName.substring(0, partName.indexOf('_'))

  /** Part-name prefixes present in a tree (the live partition ids). */
  def partitionIds(parts: Seq[String]): Seq[String] =
    parts.map(pidOf).distinct.sorted

  /** True when the tree's parts carry a partition scheme (any prefix
    * other than CH's unpartitioned `all`). */
  def isPartitioned(parts: Seq[String]): Boolean =
    parts.exists(p => pidOf(p) != "all")
}
