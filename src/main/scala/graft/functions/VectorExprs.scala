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
