package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cityHash64(args…)` as a native Catalyst expression with whole-stage
  * codegen — the Spark-side twin of ClickHouse's headline
  * `SELECT sum(cityHash64(*)) FROM github_events` (reference
  * `README.md:59,106-122`).
  *
  * Semantics:
  *   - each argument is hashed per its physical width: strings/binary as
  *     raw bytes, fixed-width numerics as little-endian native bytes
  *     (the way CH hashes fixed-width columns), dates as Int days,
  *     timestamps as Long micros;
  *   - multiple arguments fold left-to-right with `Hash128to64`, CH's
  *     own combiner;
  *   - NULL hashes to the empty-string hash (documented engine choice —
  *     the reference never hashes NULLs).
  *
  * The hot path stays inside whole-stage codegen: `doGenCode` emits
  * static calls into [[CityHash]] (same shape as Spark's own `XxHash64`
  * expression, which calls `XXH64` statics). Result is the CH UInt64 bit
  * pattern carried in a Spark Long.
  */
case class CityHash64Expr(children: Seq[Expression]) extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "cityHash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot(supported)
    if (children.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cityHash64 requires at least one argument (use cityHash64(*) via select)")
    else if (bad.nonEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cityHash64 does not support type(s): ${bad.mkString(", ")}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | LongType | IntegerType | ShortType |
        ByteType | BooleanType | DoubleType | FloatType | DateType |
        TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def hashOne(v: Any, dt: DataType): Long =
    if (v == null) CityHash.NullHash
    else dt match {
      case StringType => CityHash.hashUTF8(v.asInstanceOf[UTF8String])
      case BinaryType => CityHash.hash64(v.asInstanceOf[Array[Byte]])
      case LongType | TimestampType | TimestampNTZType => CityHash.hashLong(v.asInstanceOf[Long])
      case IntegerType | DateType => CityHash.hashInt(v.asInstanceOf[Int])
      case ShortType => CityHash.hashShort(v.asInstanceOf[Short])
      case ByteType => CityHash.hashByte(v.asInstanceOf[Byte])
      case BooleanType => CityHash.hashBoolean(v.asInstanceOf[Boolean])
      case DoubleType => CityHash.hashDouble(v.asInstanceOf[Double])
      case FloatType => CityHash.hashFloat(v.asInstanceOf[Float])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  override def eval(input: InternalRow): Any = {
    var h = hashOne(children.head.eval(input), children.head.dataType)
    var i = 1
    while (i < children.length) {
      h = CityHash.combine(h, hashOne(children(i).eval(input), children(i).dataType))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val CH = CityHash.getClass.getName.stripSuffix("$") // graft.functions.CityHash
    val hash = ctx.freshName("cityHash")
    val childCode = children.zipWithIndex.map { case (child, idx) =>
      val gen = child.genCode(ctx)
      val call = child.dataType match {
        case StringType => s"$CH.hashUTF8(${gen.value})"
        case BinaryType => s"$CH.hash64(${gen.value})"
        case LongType | TimestampType | TimestampNTZType => s"$CH.hashLong(${gen.value})"
        case IntegerType | DateType => s"$CH.hashInt(${gen.value})"
        case ShortType => s"$CH.hashShort(${gen.value})"
        case ByteType => s"$CH.hashByte(${gen.value})"
        case BooleanType => s"$CH.hashBoolean(${gen.value})"
        case DoubleType => s"$CH.hashDouble(${gen.value})"
        case FloatType => s"$CH.hashFloat(${gen.value})"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      val h = s"(${gen.isNull} ? $CH.NullHash() : $call)"
      val assign =
        if (idx == 0) s"$hash = $h;"
        else s"$hash = $CH.combine($hash, $h);"
      s"""
         |${gen.code}
         |$assign
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long $hash = 0L;
        |$childCode
        |final long ${ev.value} = $hash;
      """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
