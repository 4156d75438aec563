package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH `xxHash64(x)` / `xxHash32(x)` as a native codegen'd expression —
  * reference XXH64/XXH32 at seed 0 (see [[XxHash]] for why Spark's own
  * `xxhash64` cannot stand in). Single argument, matching the dominant
  * CH use (shard/sample keys); the 32-bit variant returns CH's UInt32
  * as an unsigned value in a Spark Long. NULL hashes to the
  * empty-byte-string hash, the same documented choice as
  * [[CityHash64Expr]].
  */
case class XxHashChExpr(child: Expression, bits: Int) extends Expression {

  require(bits == 32 || bits == 64, "bits must be 32 or 64")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = s"xxHash$bits"

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | LongType | IntegerType | ShortType |
        ByteType | BooleanType | DoubleType | FloatType | DateType |
        TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support type ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (bits == 64) {
      if (v == null) XxHash.NullHash64
      else child.dataType match {
        case StringType => XxHash.hashUTF8_64(v.asInstanceOf[UTF8String])
        case BinaryType => XxHash.hash64(v.asInstanceOf[Array[Byte]])
        case LongType | TimestampType | TimestampNTZType => XxHash.hashLong64(v.asInstanceOf[Long])
        case IntegerType | DateType => XxHash.hashInt64(v.asInstanceOf[Int])
        case ShortType => XxHash.hashShort64(v.asInstanceOf[Short])
        case ByteType => XxHash.hashByte64(v.asInstanceOf[Byte])
        case BooleanType => XxHash.hashBoolean64(v.asInstanceOf[Boolean])
        case DoubleType => XxHash.hashDouble64(v.asInstanceOf[Double])
        case FloatType => XxHash.hashFloat64(v.asInstanceOf[Float])
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    } else {
      val h: Int =
        if (v == null) XxHash.NullHash32
        else child.dataType match {
          case StringType => XxHash.hashUTF8_32(v.asInstanceOf[UTF8String])
          case BinaryType => XxHash.hash32(v.asInstanceOf[Array[Byte]])
          case LongType | TimestampType | TimestampNTZType => XxHash.hashLong32(v.asInstanceOf[Long])
          case IntegerType | DateType => XxHash.hashInt32(v.asInstanceOf[Int])
          case ShortType => XxHash.hashShort32(v.asInstanceOf[Short])
          case ByteType => XxHash.hashByte32(v.asInstanceOf[Byte])
          case BooleanType => XxHash.hashBoolean32(v.asInstanceOf[Boolean])
          case DoubleType => XxHash.hashDouble32(v.asInstanceOf[Double])
          case FloatType => XxHash.hashFloat32(v.asInstanceOf[Float])
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      h & 0xffffffffL
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val XX = XxHash.getClass.getName.stripSuffix("$") // graft.functions.XxHash
    val gen = child.genCode(ctx)
    val suffix = bits.toString
    val call = child.dataType match {
      case StringType => s"$XX.hashUTF8_$suffix(${gen.value})"
      case BinaryType => s"$XX.hash$suffix(${gen.value})"
      case LongType | TimestampType | TimestampNTZType => s"$XX.hashLong$suffix(${gen.value})"
      case IntegerType | DateType => s"$XX.hashInt$suffix(${gen.value})"
      case ShortType => s"$XX.hashShort$suffix(${gen.value})"
      case ByteType => s"$XX.hashByte$suffix(${gen.value})"
      case BooleanType => s"$XX.hashBoolean$suffix(${gen.value})"
      case DoubleType => s"$XX.hashDouble$suffix(${gen.value})"
      case FloatType => s"$XX.hashFloat$suffix(${gen.value})"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    val nullHash = if (bits == 64) s"$XX.NullHash64()" else s"$XX.NullHash32()"
    val raw = s"(${gen.isNull} ? $nullHash : $call)"
    val widened = if (bits == 64) raw else s"((long) $raw) & 0xffffffffL"
    ev.copy(
      code = code"""
        |${gen.code}
        |final long ${ev.value} = $widened;
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}
