package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.FunctionShim

/** Answer bare `count(*)` over an unfiltered parquet relation from the
  * files' footer metadata instead of scanning data pages — the
  * optimization every columnar warehouse applies (a parquet footer
  * carries exact per-row-group row counts; reference analog: ClickHouse
  * `optimize_count_from_files`, DuckDB's metadata-only count).
  *
  * At 100 TB this turns the most common smoke query in existence into a
  * metadata job: footers only — kilobytes per file — instead of a full
  * corpus scan. Locally it removes the scan job entirely (the plan
  * collapses to a [[LocalRelation]]).
  *
  * Fires ONLY when provably exact:
  *   - global aggregate (no GROUP BY) whose every output is
  *     `count(<non-null literal>)` — the `count(*)` / `count()` /
  *     `count(1)` family — with no DISTINCT and no FILTER clause;
  *   - the child is a parquet [[HadoopFsRelation]] under nothing but
  *     cardinality-preserving wrappers (Project / SubqueryAlias): any
  *     Filter, Sample, Generate, Limit, join, or v2 relation leaves the
  *     plan untouched;
  *   - batch only (never a streaming relation).
  *
  * Footer reads: driver-side thread pool for few files; a tiny Spark
  * metadata job ([[FunctionShim.distributedParquetRowCount]]) past
  * [[CountFromFooters.DriverReadMaxFiles]] so a 100k-object store never
  * serializes footer fetches on the driver.
  *
  * Disable with `spark.graft.countFromFooters=false`.
  */
case class CountFromFooters(spark: SparkSession) extends Rule[LogicalPlan] {

  import CountFromFooters._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.forall(isPlainCount) && plainParquet(child).isDefined =>
        val rel = plainParquet(child).get
        val total = rowCount(rel)
        LocalRelation(agg.output, Seq(InternalRow.fromSeq(aggExprs.map(_ => total))))
    }
  }

  /** `count(<non-null literal>)`, aliased or bare: the shapes whose
    * value is exactly the relation's row count. */
  private def isPlainCount(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) => isPlainCountAgg(ae)
    case ae: AggregateExpression => isPlainCountAgg(ae)
    case _ => false
  }

  private def isPlainCountAgg(ae: AggregateExpression): Boolean = ae match {
    case AggregateExpression(Count(children), Complete, false, None, _) =>
      children.forall { case l: Literal => l.value != null; case _ => false }
    case _ => false
  }

  /** The parquet relation under cardinality-preserving wrappers only. */
  private def plainParquet(p: LogicalPlan): Option[HadoopFsRelation] = p match {
    case l: LogicalRelation if !l.isStreaming =>
      l.relation match {
        case r: HadoopFsRelation if r.fileFormat.isInstanceOf[ParquetFileFormat] => Some(r)
        case _ => None
      }
    case Project(_, c) => plainParquet(c)
    case SubqueryAlias(_, c) => plainParquet(c)
    case _ => None
  }

  private def rowCount(rel: HadoopFsRelation): Long = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val paths = rel.location.listFiles(Nil, Nil)
      .flatMap(_.files).filter(_.getLen > 0).map(_.getPath)
    if (paths.isEmpty) 0L
    else if (paths.size > DriverReadMaxFiles)
      FunctionShim.distributedParquetRowCount(spark, paths.map(_.toString), hadoopConf)
    else {
      // few files: footer reads on a bounded driver pool (each is a
      // ~kilobyte ranged read; a Spark job would cost more than it saves)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(paths.size, 8))
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(paths.map { p =>
          new java.util.concurrent.Callable[Long] {
            override def call(): Long = {
              val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hadoopConf)
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try r.getRecordCount finally r.close()
            }
          }
        }.asJava).asScala.map(_.get()).sum
      } finally pool.shutdown()
    }
  }
}

object CountFromFooters {
  val EnabledKey = "spark.graft.countFromFooters"

  /** Above this many files the footer sweep becomes a Spark job. */
  val DriverReadMaxFiles = 64
}
