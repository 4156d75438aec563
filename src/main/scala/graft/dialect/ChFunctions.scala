package graft.dialect

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.graft.FunctionShim
import org.apache.spark.sql.types._

import graft.functions.CityHash64Expr

/** ClickHouse-compat function surface, registered as native Catalyst
  * expression builders (never UDFs — everything stays codegen-able).
  *
  * The names cover what the reference demonstrably exercises plus the
  * common CH idioms a user would hit first (SURVEY §2.2 P5/P6, §2.3
  * A4/A7): `cityHash64` (`README.md:59`), `uniq`/`uniqExact`
  * (`README.md:57`), conditional/If-combinator aggregates, `toDate`-style
  * casts, `multiIf`, `arrayJoin` (`explode`).
  */
object ChFunctions {

  @volatile private var registered: Set[Int] = Set.empty

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val id = System.identityHashCode(spark)
    if (registered.contains(id)) return
    synchronized {
      if (registered.contains(id)) return

      FunctionShim.register(spark, "cityHash64", exprs => CityHash64Expr(exprs))

      // approximate distinct — HLL++, the same sketch family as CH uniq
      FunctionShim.register(spark, "uniq",
        exprs => new HyperLogLogPlusPlus(exprs.head))
      FunctionShim.register(spark, "uniqCombined",
        exprs => new HyperLogLogPlusPlus(exprs.head))
      // exact distinct
      FunctionShim.register(spark, "uniqExact",
        exprs => Count(exprs).toAggregateExpression(isDistinct = true))

      // If-combinators: CH `aggIf(x, cond)` — aggregate over rows where
      // cond holds. Spark aggs skip NULLs, so route through If(cond,x,null).
      def ifArm(x: Expression, cond: Expression): Expression =
        If(cond, x, Literal(null))
      FunctionShim.register(spark, "sumIf",
        { case Seq(x, cond) => Sum(ifArm(x, cond)) })
      FunctionShim.register(spark, "countIf",
        { case Seq(cond) => Count(Seq(ifArm(Literal(1), cond))) })
      FunctionShim.register(spark, "avgIf",
        { case Seq(x, cond) => Average(ifArm(x, cond)) })
      FunctionShim.register(spark, "minIf",
        { case Seq(x, cond) => Min(ifArm(x, cond)) })
      FunctionShim.register(spark, "maxIf",
        { case Seq(x, cond) => Max(ifArm(x, cond)) })

      // any(x) — CH "an arbitrary (first seen) value"
      FunctionShim.register(spark, "any", exprs => new First(exprs.head))
      FunctionShim.register(spark, "anyLast", exprs => new Last(exprs.head))

      // multiIf(c1,v1, c2,v2, …, else)
      FunctionShim.register(spark, "multiIf", { exprs =>
        require(exprs.length >= 3 && exprs.length % 2 == 1,
          "multiIf needs cond,value pairs plus an else")
        val branches = exprs.dropRight(1).grouped(2).map(p => (p(0), p(1))).toSeq
        CaseWhen(branches, Some(exprs.last))
      })

      // lateral array expansion — CH arrayJoin ↔ Spark explode (Generator)
      FunctionShim.register(spark, "arrayJoin", exprs => Explode(exprs.head))

      // to* casts (CH names); unsigned targets widen per SURVEY §1.2
      def cast(dt: DataType): Seq[Expression] => Expression =
        exprs => Cast(exprs.head, dt)
      FunctionShim.register(spark, "toDate", cast(DateType))
      FunctionShim.register(spark, "toDateTime", cast(TimestampType))
      FunctionShim.register(spark, "toString", cast(StringType))
      FunctionShim.register(spark, "toInt8", cast(ByteType))
      FunctionShim.register(spark, "toInt16", cast(ShortType))
      FunctionShim.register(spark, "toInt32", cast(IntegerType))
      FunctionShim.register(spark, "toInt64", cast(LongType))
      FunctionShim.register(spark, "toUInt8", cast(ShortType))
      FunctionShim.register(spark, "toUInt16", cast(IntegerType))
      FunctionShim.register(spark, "toUInt32", cast(LongType))
      FunctionShim.register(spark, "toUInt64", cast(LongType))
      FunctionShim.register(spark, "toFloat32", cast(FloatType))
      FunctionShim.register(spark, "toFloat64", cast(DoubleType))

      // string predicates CH users reach for first
      FunctionShim.register(spark, "empty",
        exprs => EqualTo(Length(exprs.head), Literal(0)))
      FunctionShim.register(spark, "notEmpty",
        exprs => GreaterThan(Length(exprs.head), Literal(0)))

      // splitByChar(sep, s) — CH argument order (separator first); the
      // literal separator is regex-quoted for Spark's split
      FunctionShim.register(spark, "splitByChar", { case Seq(sep, s) =>
        val escaped = sep match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            Literal(java.util.regex.Pattern.quote(v.toString))
          case other => other // non-literal: caller supplies a regex-safe separator
        }
        StringSplit(s, escaped, Literal(-1))
      })
      // position(haystack, needle) — 1-based like CH; 0 when absent
      FunctionShim.register(spark, "position",
        { case Seq(hay, needle) => StringInstr(hay, needle) })
      FunctionShim.register(spark, "lengthUTF8", exprs => Length(exprs.head))
      // JSONExtract family: CH extracts by top-level key name
      def jsonPath(key: Expression): Expression = key match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          Literal("$." + v.toString)
        case other => Concat(Seq(Literal("$."), other))
      }
      FunctionShim.register(spark, "JSONExtractString",
        { case Seq(json, key) => GetJsonObject(json, jsonPath(key)) })
      FunctionShim.register(spark, "JSONExtractInt",
        { case Seq(json, key) => Cast(GetJsonObject(json, jsonPath(key)), LongType) })
      FunctionShim.register(spark, "JSONExtractFloat",
        { case Seq(json, key) => Cast(GetJsonObject(json, jsonPath(key)), DoubleType) })
      // date/time helpers (CH names) — all map to native expressions
      FunctionShim.register(spark, "toStartOfHour",
        exprs => TruncTimestamp(Literal("hour"), exprs.head))
      FunctionShim.register(spark, "toStartOfDay",
        exprs => TruncTimestamp(Literal("day"), exprs.head))
      FunctionShim.register(spark, "toStartOfMonth",
        exprs => TruncDate(Cast(exprs.head, DateType), Literal("month")))
      FunctionShim.register(spark, "toYear",
        exprs => Year(Cast(exprs.head, DateType)))
      FunctionShim.register(spark, "toMonth",
        exprs => Month(Cast(exprs.head, DateType)))
      FunctionShim.register(spark, "toDayOfMonth",
        exprs => DayOfMonth(Cast(exprs.head, DateType)))
      FunctionShim.register(spark, "toHour",
        exprs => Hour(exprs.head))
      FunctionShim.register(spark, "toYYYYMM", { exprs =>
        val d = Cast(exprs.head, DateType)
        Add(Multiply(Year(d), Literal(100)), Month(d))
      })
      // quantile(x, q) / quantileExact — exact interpolated percentile
      FunctionShim.register(spark, "quantile",
        { case Seq(x, q) => new Percentile(x, q) })
      FunctionShim.register(spark, "quantileExact",
        { case Seq(x, q) => new Percentile(x, q) })

      registered += id
    }
  }
}
