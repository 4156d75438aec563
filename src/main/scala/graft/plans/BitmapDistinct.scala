package graft.plans

import org.roaringbitmap.longlong.Roaring64Bitmap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Bitmap-based exact distinct count for integer columns — the q3
  * shape (`uniqExact(o_custkey)`; reference analog: ClickHouse's
  * `uniqExact` state and `groupBitmap`, both of which ship a compact
  * set state instead of the raw keys).
  *
  * Spark's native `count(DISTINCT intCol)` plans THREE shuffle-bound
  * stages: partial-distinct per partition, a hash exchange of every
  * distinct key, a merge stage, then a second (single-partition)
  * exchange for the final count — at sf10 that is ~0.2 s of stage
  * scheduling for ~0.05 s of CPU (SCALING.md r15 decomposition), and
  * at 100 TB it shuffles every distinct key across the cluster.
  *
  * This rewrite (kill switch `spark.graft.bitmapDistinct=false`)
  * turns the global-aggregate spelling into TWO stages: a columnar
  * scan stage that folds each partition's values into a
  * [[Roaring64Bitmap]] and emits ONE serialized blob per
  * partition, and a final merge that ORs the blobs and takes the
  * cardinality ([[BitmapOrCardinality]], a native
  * `TypedImperativeAggregate` — no UDFs). The shuffle is one compressed
  * bitmap per partition — never larger than the raw distinct keys it
  * replaces (Roaring's worst case on sparse 64-bit keys is bounded by
  * the key bytes themselves), and typically orders of magnitude
  * smaller.
  *
  * Scope: a global `Aggregate` (no GROUP BY) over a bare parquet
  * relation whose every output is `count(DISTINCT col)` on an
  * Int/Long column (several distinct columns each get their own
  * bitmap). NULLs are ignored, as `count(DISTINCT …)` requires.
  */
object BitmapDistinct {

  val EnabledKey = "spark.graft.bitmapDistinct"

  /** Engagement counter — PlanSpec asserts the rewrite fires on the
    * bench q3 shape. */
  val engagements = new java.util.concurrent.atomic.AtomicLong(0L)

  def serialize(bm: Roaring64Bitmap): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  /** One blob row per partition: every non-null value of each tracked
    * column folded into that column's bitmap. `colIdxs(j)` is the j-th
    * tracked column's index in the scan output; `isLong(j)` picks the
    * vector getter. */
  def partial(
      batches: Iterator[ColumnarBatch],
      colIdxs: Array[Int],
      isLong: Array[Boolean]): Iterator[Row] = {
    val bms = Array.fill(colIdxs.length)(new Roaring64Bitmap())
    while (batches.hasNext) {
      val batch = batches.next()
      val n = batch.numRows()
      var j = 0
      while (j < colIdxs.length) {
        val vec = batch.column(colIdxs(j))
        val bm = bms(j)
        var i = 0
        if (isLong(j)) {
          while (i < n) {
            if (!vec.isNullAt(i)) bm.addLong(vec.getLong(i))
            i += 1
          }
        } else {
          while (i < n) {
            if (!vec.isNullAt(i)) bm.addLong(vec.getInt(i).toLong)
            i += 1
          }
        }
        j += 1
      }
    }
    bms.foreach(_.runOptimize())
    Iterator.single(Row.fromSeq(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        bms.map(serialize))))
  }
}

/** `OR` the per-partition bitmap blobs, evaluate to the cardinality —
  * the merge side of [[BitmapDistinct]]. A native Catalyst typed
  * aggregate: stays inside ObjectHashAggregate, no UDF. */
case class BitmapOrCardinality(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Roaring64Bitmap]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Roaring64Bitmap =
    new Roaring64Bitmap()

  override def update(
      buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.or(BitmapDistinct.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(
      buffer: Roaring64Bitmap,
      other: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64Bitmap): Any =
    buffer.getLongCardinality

  override def serialize(buffer: Roaring64Bitmap): Array[Byte] =
    BitmapDistinct.serialize(buffer)

  override def deserialize(storageFormat: Array[Byte]): Roaring64Bitmap =
    BitmapDistinct.deserialize(storageFormat)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_or_cardinality"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrCardinality =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrCardinality =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapOrCardinality =
    copy(child = newChild)
}

/** The rewrite rule — see [[BitmapDistinct]]. Registered alongside
  * [[DictAggRewrite]] in both registration paths. */
case class BitmapDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import BitmapDistinct._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.getOption(EnabledKey).exists(_.trim.equalsIgnoreCase("false")))
      return plan
    plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        (try tryRewrite(aggExprs, child)
        catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"bitmapDistinct rewrite failed; keeping the scan plan: $e")
            None
        }).getOrElse(agg)
    }
  }

  private def tryRewrite(
      aggExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val src = ScanRelations.relationOf(child).getOrElse(return None)
    // never re-rewrite an AggProjections COMPANION scan — same
    // exclusion (and rationale) as DictAggRewrite
    if (ScanRelations.isProjectionCompanion(spark, src)) return None

    // every aggregate call must be count(DISTINCT intCol); collect the
    // distinct columns in first-seen order
    val aes = new java.util.IdentityHashMap[AggregateExpression, Integer]()
    aggExprs.foreach(_.foreach {
      case ae: AggregateExpression => aes.putIfAbsent(ae, Integer.valueOf(aes.size))
      case _ =>
    })
    if (aes.isEmpty) return None
    val aeList: Seq[AggregateExpression] = {
      val arr = new Array[AggregateExpression](aes.size)
      aes.forEach((k, v) => arr(v.intValue) = k)
      scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
    }
    // aeIdx → (relation column name, integral width)
    val plans: Seq[(String, Boolean)] = aeList.map { ae =>
      if (!ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(Seq(a: AttributeReference)) =>
          val n = ScanRelations.resolve(child, a).getOrElse(return None)
          a.dataType match {
            case LongType => (n, true)
            case IntegerType => (n, false)
            case _ => return None
          }
        case _ => return None
      }
    }

    val neededNames = plans.map(_._1).distinct
    val scanDf = ScanRelations.scanDf(spark, src, neededNames)
      .getOrElse(return None)
    val scan = ScanRelations.columnarScan(scanDf).getOrElse(return None)
    val scanOut = scan.output
    // one bitmap per DISTINCT tracked column; aggregates share them
    val colIdxs = neededNames.map(n => scanOut.indexWhere(_.name == n)).toArray
    if (colIdxs.exists(_ < 0)) return None
    val isLong = colIdxs.map(i => scanOut(i).dataType == LongType)
    val blobIdxOf: Map[String, Int] = neededNames.zipWithIndex.toMap

    val rowRdd: RDD[Row] = scan.executeColumnar()
      .mapPartitions(it => BitmapDistinct.partial(it, colIdxs, isLong))

    val schema = StructType(neededNames.zipWithIndex.map { case (_, i) =>
      StructField(s"bm_$i", BinaryType, nullable = true)
    })
    val partialDf = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .createDataFrame(rowRdd, schema)
    val partialPlan = partialDf.queryExecution.analyzed
    val pAttr: Map[Int, Attribute] =
      partialPlan.output.zipWithIndex.map(_.swap).toMap

    def mergeOf(i: Int): Expression = {
      val (colName, _) = plans(i)
      BitmapOrCardinality(pAttr(blobIdxOf(colName))).toAggregateExpression()
    }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        val boxed = aes.get(ae)
        val idx: Option[Int] =
          if (boxed != null) Some(boxed.intValue)
          else aeList.zipWithIndex
            .collectFirst { case (x, i) if x.semanticEquals(ae) => i }
        idx.map(mergeOf)
      case l: Literal => Some(l)
      case other if other.children.nonEmpty && other.deterministic =>
        val kids = other.children.map(rewriteExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    val outputs = aggExprs.map { ne =>
      val (inner, name) = ne match {
        case Alias(c, n) => (c, n)
        case a: Attribute => (a: Expression, a.name)
        case other => (other: Expression, other.name)
      }
      rewriteExpr(inner)
        .filter(_.dataType == ne.dataType)
        .map(r => Alias(r, name)(exprId = ne.exprId, qualifier = ne.qualifier))
        .getOrElse(return None)
    }

    engagements.incrementAndGet()
    logInfo(s"bitmapDistinct: rewriting count(DISTINCT ${neededNames.mkString(", ")}) " +
      "to per-partition Roaring64 bitmaps + OR-merge")
    Some(Aggregate(Nil, outputs, partialPlan))
  }

}
