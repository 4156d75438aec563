package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.FunctionShim

/** The columnar-rewrite rules' shared source-relation machinery —
  * [[DictAggRewrite]] and [[BitmapDistinctRewrite]] accept the same
  * two scan shapes (a bare parquet relation, an ATTACHed MergeTree
  * DSv2 relation) with the same unwrapping, name resolution, and
  * columnar-scan extraction; keeping one copy stops the two rules
  * drifting (review r16 — a fix had to be applied four times). */
private[plans] object ScanRelations {

  sealed trait SrcRel
  final case class ParquetRel(lr: LogicalRelation) extends SrcRel
  final case class MergeTreeRel(
      endpoint: String, ddl: String, orderBy: Seq[String]) extends SrcRel

  /** The relation under cardinality-preserving wrappers only — any
    * Filter/Sample/Limit/join leaves the plan unmatched (the
    * MergeTree scan's pushFilters keeps all filters as residuals, so a
    * filtered scan always carries a Filter node and never matches). */
  def relationOf(p: LogicalPlan): Option[SrcRel] = p match {
    case l: LogicalRelation if !l.isStreaming =>
      l.relation match {
        case r: HadoopFsRelation if r.fileFormat.isInstanceOf[ParquetFileFormat] =>
          Some(ParquetRel(l))
        case _ => None
      }
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      graft.sources.mergetree.MergeTree.relationInfo(d)
        .map { case (ep, ddl, ob) => MergeTreeRel(ep, ddl, ob) }
    case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      graft.sources.mergetree.MergeTree.relationInfo(sr)
        .map { case (ep, ddl, ob) => MergeTreeRel(ep, ddl, ob) }
    case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      relationOf(c)
    case SubqueryAlias(_, c) => relationOf(c)
    case _ => None
  }

  /** An attribute's RELATION column name, or None if it doesn't reach
    * the relation as a bare data column. Filters are attribute-
    * transparent (r17: [[DictAggRewrite]] accepts filtered scans). */
  def resolve(p: LogicalPlan, attr: Attribute): Option[String] = p match {
    case org.apache.spark.sql.catalyst.plans.logical.Filter(_, c) =>
      resolve(c, attr)
    case l: LogicalRelation =>
      l.output.find(_.exprId == attr.exprId).map(_.name)
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if graft.sources.mergetree.MergeTree.relationInfo(d).isDefined =>
      d.output.find(_.exprId == attr.exprId).map(_.name)
    case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if graft.sources.mergetree.MergeTree.relationInfo(sr).isDefined =>
      sr.output.find(_.exprId == attr.exprId).map(_.name)
    case Project(projList, c) =>
      projList.find(_.exprId == attr.exprId).flatMap {
        case a: AttributeReference => resolve(c, a)
        case Alias(a: AttributeReference, _) => resolve(c, a)
        case _ => None
      }
    case SubqueryAlias(_, c) => resolve(c, attr)
    case _ => None
  }

  /** True when the AggProjections reroute owns this source (parquet
    * companion scans) — the rewrites must not re-rewrite it. */
  def isProjectionCompanion(spark: SparkSession, src: SrcRel): Boolean =
    src match {
      case ParquetRel(lr) =>
        val roots = lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString)
        val projRoot = AggProjections.projectionRoot(spark)
        roots.exists(_.contains(projRoot)) ||
          AggProjections.allManifests.exists(m =>
            roots.exists(_.contains(m.dataPath)))
      case _: MergeTreeRel => false
    }

  /** A fresh DataFrame scanning exactly `neededNames` of the source —
    * attribute-based projection on the parquet branch, a new DSv2 read
    * (pruned by V2ScanRelationPushDown) on the MergeTree branch. The
    * MergeTree select goes through `Dataset.col`-safe resolution by
    * ATTRIBUTE, never by parsed name (a dotted CH column name like
    * `a.b` would misparse as struct access; review r16). */
  def scanDf(spark: SparkSession, src: SrcRel,
      neededNames: Seq[String]): Option[DataFrame] =
    scanDf(spark, src, neededNames, None)

  /** As above, with an optional filter REBUILT over the fresh
    * relation's attrs (`mkFilter(name → attr)`): pushed into the scan
    * for row-group/granule pruning. The caller's kernel still
    * re-applies the predicate exactly — parquet pushdown prunes pages,
    * it does not guarantee row-level filtering. */
  def scanDf(spark: SparkSession, src: SrcRel,
      neededNames: Seq[String],
      mkFilter: Option[Map[String, Attribute] => Expression]): Option[DataFrame] = {
    def wrap(rel: LogicalPlan, attrs: Seq[Attribute]): LogicalPlan = {
      val byName = rel.output.map(a => a.name -> a).toMap
      val inner = mkFilter match {
        case Some(f) =>
          org.apache.spark.sql.catalyst.plans.logical.Filter(f(byName), rel)
        case None => rel
      }
      Project(attrs, inner)
    }
    src match {
      case ParquetRel(lr) =>
        val relNew = lr.newInstance()
        val attrs = neededNames.map(n => relNew.output.find(_.name == n) match {
          case Some(a) => a
          case None => return None
        })
        Some(FunctionShim.ofRows(spark, wrap(relNew, attrs)))
      case MergeTreeRel(endpoint, ddl, orderBy) =>
        val df = graft.sources.mergetree.MergeTree.read(spark, endpoint, ddl, orderBy)
        val rel = df.queryExecution.analyzed
        val attrs = neededNames.map(n => rel.output.find(_.name == n) match {
          case Some(a) => a
          case None => return None
        })
        Some(FunctionShim.ofRows(spark, wrap(rel, attrs)))
    }
  }

  /** The columnar leaf scan of a planned scan DataFrame — None when
    * the plan holds no (columnar) scan to consume. */
  def columnarScan(df: DataFrame): Option[SparkPlan] =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => (f: SparkPlan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        (b: SparkPlan)
    }.filter(_.supportsColumnar)

  /** Planned (batch RDD, scan output) per (relation INSTANCE, column
    * set) — r18's cut at the per-query constant: planning the rules'
    * sub-scan (analyze + optimize + physical-plan a fresh DataFrame)
    * measured ~30 ms of BitmapDistinctRewrite's time per query
    * (PlanPhases probe), ALL of it identical work on a repeated shape.
    *
    * Keyed by the `HadoopFsRelation` instance's identity: Tables'
    * relation cache serves ONE instance per (session, path, content
    * signature), so a data change produces a NEW instance and this
    * cache misses — the identity IS the invalidation. Plans built
    * outside that cache (fresh `spark.read` per query) get fresh
    * relation instances and simply never hit. Only UNFILTERED parquet
    * scans cache: a filter expression has no stable cheap key, and
    * MergeTree tables mutate through the write door. The RDD is
    * immutable and re-runnable across jobs; re-using it re-reads the
    * files every execution (only the PLAN is cached, never data). */
  private val plannedScans = new java.util.IdentityHashMap[
    AnyRef, scala.collection.mutable.Map[
      String,
      (org.apache.spark.rdd.RDD[org.apache.spark.sql.vectorized.ColumnarBatch],
        Seq[Attribute])]]()
  private val PlannedScansMax = 128

  /** [[scanDf]] + [[columnarScan]] + `executeColumnar()` in one step,
    * cached for unfiltered parquet scans (see [[plannedScans]]). */
  def columnarBatches(spark: SparkSession, src: SrcRel,
      neededNames: Seq[String],
      mkFilter: Option[Map[String, Attribute] => Expression])
      : Option[(org.apache.spark.rdd.RDD[org.apache.spark.sql.vectorized.ColumnarBatch],
          Seq[Attribute])] = {
    def planFresh() =
      scanDf(spark, src, neededNames, mkFilter)
        .flatMap(columnarScan)
        .map(s => (s.executeColumnar(), s.output))
    src match {
      case ParquetRel(lr) if mkFilter.isEmpty =>
        val relKey: AnyRef = lr.relation
        // reader-shaping confs shape the cached RDD's partitioning and
        // batch format - a mid-session change must miss, not serve the
        // old plan (ADVICE r18: split-size alone was not enough)
        val colKey = neededNames.mkString(",") + "|" + Seq(
          "spark.sql.files.maxPartitionBytes",
          "spark.sql.files.minPartitionNum",
          "spark.sql.files.openCostInBytes",
          "spark.sql.leafNodeDefaultParallelism",
          "spark.default.parallelism",
          "spark.sql.parquet.enableVectorizedReader",
          "spark.sql.parquet.columnarReaderBatchSize")
          .map(k => spark.conf.getOption(k).getOrElse("")).mkString("|")
        plannedScans.synchronized {
          val m = plannedScans.get(relKey)
          if (m != null) {
            val hit = m.get(colKey)
            if (hit.isDefined) return hit
          }
        }
        val out = planFresh()
        out.foreach { v =>
          plannedScans.synchronized {
            if (plannedScans.size >= PlannedScansMax) plannedScans.clear()
            var m = plannedScans.get(relKey)
            if (m == null) {
              m = scala.collection.mutable.Map.empty
              plannedScans.put(relKey, m)
            }
            m.put(colKey, v)
          }
        }
        out
      case _ => planFresh()
    }
  }
}

/** The rewrites' shared output-expression walker — both rules (each in
  * two modes) re-express an Aggregate's outputs over replacement
  * expressions for the aggregate calls and group keys, with the same
  * recursion and the same exact-dataType guard. One copy, four call
  * sites (same rationale as [[ScanRelations]]: r16 needed one fix
  * applied four times; review r17 caught the walker drifting the same
  * way). */
private[plans] object RewriteOutputs {

  import org.apache.spark.sql.catalyst.expressions.{Literal, NamedExpression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

  /** Each output rewritten through `mapAgg`/`mapAttr` (literals pass,
    * deterministic compositions recurse), aliased back under the
    * original name and exprId; None the moment any output cannot be
    * expressed EXACTLY (type included) — the caller then abandons the
    * whole rewrite. */
  def apply(
      aggExprs: Seq[NamedExpression],
      mapAgg: AggregateExpression => Option[Expression],
      mapAttr: AttributeReference => Option[Expression]): Option[Seq[NamedExpression]] = {
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference => mapAttr(a)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty && other.deterministic =>
        val kids = other.children.map(rewriteExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }
    val out = Seq.newBuilder[NamedExpression]
    aggExprs.foreach { ne =>
      val (inner, name) = ne match {
        case Alias(c, n) => (c, n)
        case a: Attribute => (a: Expression, a.name)
        case other => (other: Expression, other.name)
      }
      rewriteExpr(inner)
        .filter(_.dataType == ne.dataType) // exact type or no rewrite
        .map(r => Alias(r, name)(exprId = ne.exprId, qualifier = ne.qualifier)) match {
        case Some(a) => out += a
        case None => return None
      }
    }
    Some(out.result())
  }

  /** The aggregate-call index lookup both rules share: identity first
    * (the common case — the same object referenced from several
    * outputs), semantic equality as the fallback. */
  def aeIndex(
      aes: java.util.IdentityHashMap[AggregateExpression, Integer],
      aeList: Seq[AggregateExpression])(ae: AggregateExpression): Option[Int] = {
    val boxed = aes.get(ae)
    if (boxed != null) Some(boxed.intValue)
    else aeList.zipWithIndex
      .collectFirst { case (x, i) if x.semanticEquals(ae) => i }
  }
}
