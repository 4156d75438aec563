package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static ADC (asymmetric distance computation) kernel for product
  * quantization: `sum over m of tab[m][codes[m]]` — the per-row hot
  * loop of PQ search (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011, §IV.A). Lives behind
  * [[PqAdcExpr]]'s interpreted AND generated paths so both execute the
  * same arithmetic in the same order. */
object PqKernels {
  /** null on null inputs; throws on subspace-count mismatch or a code
    * outside its table — silent wrong ranks are the PQ failure mode
    * this engine refuses. */
  def adc(codes: ArrayData, tab: ArrayData): java.lang.Double = {
    if (codes == null || tab == null) return null
    val m = codes.numElements()
    if (m != tab.numElements())
      throw new IllegalArgumentException(
        s"PQ codes have $m subspaces but the distance table has ${tab.numElements()}")
    var sum = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i) || tab.isNullAt(i)) return null
      val c = codes.getInt(i)
      val row = tab.getArray(i)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"PQ code $c outside the subspace-$i table of ${row.numElements()} centroids")
      if (row.isNullAt(c)) return null
      sum += row.getDouble(c)
      i += 1
    }
    sum
  }
}

/** `pq_adc(codes, tab)` — approximate distance of a PQ-encoded corpus
  * vector to a query, given the query's per-subspace distance table:
  * `codes` is `array<int>` (one centroid code per subspace), `tab` is
  * `array<array<double>>` (per subspace, distance from the query's
  * subvector to each centroid). One fused codegen'd pass per row — the
  * whole PQ search scan stays inside WholeStageCodegen; no lambda
  * interpretation over the M-way sum. */
case class PqAdcExpr(codes: Expression, tab: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(codes, tab)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val tabOk = tab.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && tabOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got " +
        s"${codes.dataType.sql} / ${tab.dataType.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val c = codes.eval(input)
    if (c == null) return null
    val t = tab.eval(input)
    if (t == null) return null
    PqKernels.adc(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val PK = PqKernels.getClass.getName.stripSuffix("$")
    val gc = codes.genCode(ctx)
    val gt = tab.genCode(ctx)
    val boxed = ctx.freshName("adcBoxed")
    ev.copy(code = code"""
      |${gc.code}
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${gc.isNull}) {
      |  ${gt.code}
      |  if (!${gt.isNull}) {
      |    java.lang.Double $boxed = $PK.adc(${gc.value}, ${gt.value});
      |    if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren(0), tab = newChildren(1))
}
