package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH `sipHash64(x)` as a native codegen'd expression — SipHash-2-4,
  * zero key (see [[SipHash]]). Single argument; NULL hashes to the
  * empty-byte-string hash, the same documented choice as
  * [[CityHash64Expr]].
  */
case class SipHash64Expr(child: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "sipHash64"

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | LongType | IntegerType | ShortType |
        ByteType | BooleanType | DoubleType | FloatType | DateType |
        TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sipHash64 does not support type ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) SipHash.NullHash
    else child.dataType match {
      case StringType => SipHash.hashUTF8(v.asInstanceOf[UTF8String])
      case BinaryType => SipHash.hash64(v.asInstanceOf[Array[Byte]])
      case LongType | TimestampType | TimestampNTZType => SipHash.hashLong(v.asInstanceOf[Long])
      case IntegerType | DateType => SipHash.hashInt(v.asInstanceOf[Int])
      case ShortType => SipHash.hashShort(v.asInstanceOf[Short])
      case ByteType => SipHash.hashByte(v.asInstanceOf[Byte])
      case BooleanType => SipHash.hashBoolean(v.asInstanceOf[Boolean])
      case DoubleType => SipHash.hashDouble(v.asInstanceOf[Double])
      case FloatType => SipHash.hashFloat(v.asInstanceOf[Float])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val SH = SipHash.getClass.getName.stripSuffix("$") // graft.functions.SipHash
    val gen = child.genCode(ctx)
    val call = child.dataType match {
      case StringType => s"$SH.hashUTF8(${gen.value})"
      case BinaryType => s"$SH.hash64(${gen.value})"
      case LongType | TimestampType | TimestampNTZType => s"$SH.hashLong(${gen.value})"
      case IntegerType | DateType => s"$SH.hashInt(${gen.value})"
      case ShortType => s"$SH.hashShort(${gen.value})"
      case ByteType => s"$SH.hashByte(${gen.value})"
      case BooleanType => s"$SH.hashBoolean(${gen.value})"
      case DoubleType => s"$SH.hashDouble(${gen.value})"
      case FloatType => s"$SH.hashFloat(${gen.value})"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    ev.copy(
      code = code"""
        |${gen.code}
        |final long ${ev.value} = (${gen.isNull} ? $SH.NullHash() : $call);
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}
