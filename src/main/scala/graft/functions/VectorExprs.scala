package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity as a native codegen'd expression — one fused pass
  * per row over both arrays via [[VectorKernels.cosine]], replacing the
  * three interpreted `zip_with`+`aggregate` folds (dot, |a|, |b|) the
  * HOF formulation costs. Bit-exact with that formulation (see the
  * kernel's precision contract); null on null input, length mismatch,
  * or null elements, exactly like the zip-padded fold. */
case class CosineSimExpr(left: Expression, right: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // captured at construction, like Divide's evalMode: ANSI throws on a
  // zero-norm divisor, non-ANSI yields null
  private val ansi: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val r = VectorKernels.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right), ansi)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val VK = VectorKernels.getClass.getName.stripSuffix("$")
    val ga = left.genCode(ctx)
    val gb = right.genCode(ctx)
    val boxed = ctx.freshName("cosBoxed")
    ev.copy(code = code"""
      |${ga.code}
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${ga.isNull}) {
      |  ${gb.code}
      |  if (!${gb.isNull}) {
      |    java.lang.Double $boxed = $VK.cosine(
      |      ${ga.value}, ${gb.value}, ${elemFloat(left)}, ${elemFloat(right)}, $ansi);
      |    if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

/** Shared typing for the CH vector-distance family: numeric-array
  * inputs, double output, one fused kernel pass per row. */
private[functions] object VectorExprs {
  /** Element type tag for [[VectorKernels]] accessors; -1 = unsupported. */
  def elemTag(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case ArrayType(ShortType, _) => 4
    case ArrayType(ByteType, _) => 5
    case _ => -1
  }
}

/** CH binary vector functions — `dotProduct`, `L1Distance`,
  * `L2Distance`, `L2SquaredDistance`, `LinfDistance`,
  * `cosineDistance` — as one native codegen'd expression over two
  * numeric arrays. All compute in double and return Float64 (CH's
  * Distance-family convention, extended to dotProduct — documented
  * deviation from its input-typed return). Length mismatch throws
  * (CH ARRAY_SIZES_DONT_MATCH); null input or element → null. */
case class VectorDistExpr(left: Expression, right: Expression, kind: String)
    extends Expression {

  require(VectorDistExpr.Kinds.contains(kind), s"unknown kind $kind")

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorDistExpr.Names(kind)

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.elemTag(left.dataType) >= 0 && VectorExprs.elemTag(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric-array inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  // raw pairReduce op for the non-cosine kinds
  private def op: Int = kind match {
    case "dot" => VectorKernels.OpDot
    case "l1" => VectorKernels.OpL1
    case "l2" | "l2sq" => VectorKernels.OpL2Sq
    case "linf" => VectorKernels.OpLinf
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val ta = VectorExprs.elemTag(left.dataType)
    val tb = VectorExprs.elemTag(right.dataType)
    val r =
      if (kind == "cosd") VectorKernels.cosineDistance(ad, bd, ta, tb)
      else VectorKernels.pairReduce(ad, bd, ta, tb, op)
    if (r == null) null
    else if (kind == "l2") Math.sqrt(r.doubleValue())
    else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val VK = VectorKernels.getClass.getName.stripSuffix("$")
    val ga = left.genCode(ctx)
    val gb = right.genCode(ctx)
    val ta = VectorExprs.elemTag(left.dataType)
    val tb = VectorExprs.elemTag(right.dataType)
    val boxed = ctx.freshName("vdBoxed")
    val call =
      if (kind == "cosd") s"$VK.cosineDistance(${ga.value}, ${gb.value}, $ta, $tb)"
      else s"$VK.pairReduce(${ga.value}, ${gb.value}, $ta, $tb, $op)"
    val finish =
      if (kind == "l2") s"Math.sqrt($boxed.doubleValue())" else s"$boxed.doubleValue()"
    ev.copy(code = code"""
      |${ga.code}
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${ga.isNull}) {
      |  ${gb.code}
      |  if (!${gb.isNull}) {
      |    java.lang.Double $boxed = $call;
      |    if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $finish; }
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object VectorDistExpr {
  val Kinds: Set[String] = Set("dot", "l1", "l2", "l2sq", "linf", "cosd")
  val Names: Map[String, String] = Map(
    "dot" -> "dotProduct", "l1" -> "L1Distance", "l2" -> "L2Distance",
    "l2sq" -> "L2SquaredDistance", "linf" -> "LinfDistance",
    "cosd" -> "cosineDistance")
}

/** CH vector norms — `L1Norm`, `L2Norm`, `L2SquaredNorm`, `LinfNorm` —
  * over one numeric array; double accumulation, Float64 result. Null
  * input or element → null. */
case class VectorNormExpr(child: Expression, kind: String) extends Expression {

  require(VectorNormExpr.Kinds.contains(kind), s"unknown kind $kind")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = VectorNormExpr.Names(kind)

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.elemTag(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric-array input, got ${child.dataType.sql}")

  private def op: Int = kind match {
    case "l1" => VectorKernels.OpL1
    case "l2" | "l2sq" => VectorKernels.OpL2Sq
    case "linf" => VectorKernels.OpLinf
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val r = VectorKernels.normReduce(
      v.asInstanceOf[ArrayData], VectorExprs.elemTag(child.dataType), op)
    if (r == null) null
    else if (kind == "l2") Math.sqrt(r.doubleValue())
    else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val VK = VectorKernels.getClass.getName.stripSuffix("$")
    val gen = child.genCode(ctx)
    val t = VectorExprs.elemTag(child.dataType)
    val boxed = ctx.freshName("vnBoxed")
    val finish =
      if (kind == "l2") s"Math.sqrt($boxed.doubleValue())" else s"$boxed.doubleValue()"
    ev.copy(code = code"""
      |${gen.code}
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${gen.isNull}) {
      |  java.lang.Double $boxed = $VK.normReduce(${gen.value}, $t, $op);
      |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $finish; }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

object VectorNormExpr {
  val Kinds: Set[String] = Set("l1", "l2", "l2sq", "linf")
  val Names: Map[String, String] = Map(
    "l1" -> "L1Norm", "l2" -> "L2Norm", "l2sq" -> "L2SquaredNorm",
    "linf" -> "LinfNorm")
}

/** Argmin-over-centroids as a native codegen'd expression: one pass
  * over the vector advances all `k` squared-L2 accumulators
  * ([[VectorKernels.nearestCentroid]]), replacing `k` interpreted
  * `zip_with`+`aggregate` folds and a `k`-deep `when` chain per row.
  * The centroid matrix ships once per task via `addReferenceObj`.
  * Never null: degenerate inputs collapse to index 0, the value the
  * all-null `when` chain produced. */
object NearestCentroidExpr {
  /** Column-API wrapper shared by the IVF and PQ tiers (review finding:
    * both operators carried verbatim copies of this glue). */
  def column(vec: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.FunctionShim.column(NearestCentroidExpr(
      org.apache.spark.sql.graft.FunctionShim.expression(vec),
      centroids.map(_.toArray).toArray))
}

case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
    extends Expression {

  require(centroids.nonEmpty, "centroids must be non-empty")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids, elemFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val VK = VectorKernels.getClass.getName.stripSuffix("$")
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val gen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${gen.code}
        |final int ${ev.value} = ${gen.isNull}
        |  ? 0
        |  : $VK.nearestCentroid(${gen.value}, $mat, $elemFloat);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  // the matrix is a constructor param but not a child expression;
  // equality/semanticHash fall back to case-class equals over the
  // array reference — fine, these expressions are built per-plan
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

/** Packed random-hyperplane sign signature as a native codegen'd
  * expression: all `planes` dot products advance in ONE pass over the
  * vector ([[VectorKernels.hyperplaneSig]]), replacing `planes`
  * interpreted `zip_with`+`aggregate` folds per row. The hyperplane
  * matrix is materialized once per task via `addReferenceObj`, not
  * `planes` literal arrays in the plan. Never null: degenerate inputs
  * (null vector, wrong length, null element) yield signature 0L, the
  * value the original `when(d >= 0, bit).otherwise(0)` chain produces
  * for all-null dots. */
case class HyperplaneSigExpr(child: Expression, planes: Int, dim: Int) extends Expression {

  require(planes > 0 && planes <= 63, "planes must be in [1, 63]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    Array.tabulate(planes)(p => VectorKernels.hyperplane(p, dim))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else VectorKernels.hyperplaneSig(v.asInstanceOf[ArrayData], matrix, dim, elemFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val VK = VectorKernels.getClass.getName.stripSuffix("$")
    val mat = ctx.addReferenceObj("hyperplanes", matrix, "double[][]")
    val gen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${gen.code}
        |final long ${ev.value} = ${gen.isNull}
        |  ? 0L
        |  : $VK.hyperplaneSig(${gen.value}, $mat, $dim, $elemFloat);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}
