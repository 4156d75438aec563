package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CH `ORDER BY x WITH FILL [FROM a] [TO b] [STEP s]` — gap filling for
  * ordered (usually time-series) results: rows are inserted for every
  * missing grid point a, a+s, … (TO exclusive, CH semantics), with the
  * non-fill columns defaulted (numbers → 0, strings → '' — CH's type
  * defaults; other types stay NULL).
  *
  * Execution shape: the grid is a `spark.range` (distributed, never a
  * driver-side list) FULL OUTER joined with the result on the fill
  * column — existing off-grid rows survive, missing grid points appear.
  * Bounds default to the result's min/max (one cheap extra aggregate,
  * only when FROM/TO are omitted). The result is re-sorted on the fill
  * column, matching CH's post-fill ordering.
  */
object Fill {

  /** `interpolate` columns take the last real row's value on filled
    * rows (CH `INTERPOLATE (col)` carry-forward; rows before the first
    * real value fall back to the type default). The carry is a global
    * ordered window — the same single-ordered-stream cost CH pays in
    * its fill transform; keep WITH FILL for final result shaping, not
    * mid-pipeline. */
  def withFill(
      df: DataFrame,
      orderCol: String,
      from: Option[Column],
      to: Option[Column],
      step: Option[Column],
      interpolate: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val dt = df.schema(orderCol).dataType
    if (dt == DateType) {
      // date grid: fill over epoch-days, convert back — STEP is in days
      val filled = withFill(
        df.withColumn(orderCol, unix_date(col(orderCol))),
        orderCol,
        from.map(f => unix_date(f.cast(DateType))),
        to.map(t => unix_date(t.cast(DateType))),
        step, interpolate)
      return filled.withColumn(orderCol, date_from_unix_date(col(orderCol)))
    }
    require(dt.isInstanceOf[NumericType],
      s"WITH FILL supports numeric/date fill columns, got $dt")
    def const(c: Column): Double =
      spark.range(1).select(c.cast("double")).first().getDouble(0)
    val stepV = step.map(const).getOrElse(1.0)
    require(stepV > 0, "WITH FILL STEP must be positive")
    lazy val bounds = df
      .agg(min(col(orderCol)).cast("double"), max(col(orderCol)).cast("double"))
      .first()
    if (from.isEmpty && to.isEmpty && bounds.isNullAt(0)) return df // empty input
    val lo = from.map(const).getOrElse(bounds.getDouble(0))
    // FROM/TO is a half-open interval like CH; data-derived max is inclusive
    val n = to.map(t => math.ceil((const(t) - lo) / stepV).toLong)
      .getOrElse(math.floor((bounds.getDouble(1) - lo) / stepV).toLong + 1)
    if (n <= 0) return df
    val gridCol = (lit(lo) + col("id") * lit(stepV)).cast(dt)
    val grid = spark.range(0, n).select(gridCol.as(orderCol))
    val others = df.schema.fields.filter(_.name != orderCol)
    val unknown = interpolate.filterNot(c => others.exists(_.name == c))
    require(unknown.isEmpty, s"INTERPOLATE of unknown column(s): ${unknown.mkString(", ")}")
    val carry = org.apache.spark.sql.expressions.Window
      .orderBy(col(orderCol)).rowsBetween(Long.MinValue, 0)
    def default(dt: DataType): Column = dt match {
      case _: NumericType => lit(0).cast(dt)
      case StringType => lit("")
      case _ => lit(null).cast(dt)
    }
    val filled = others.map { f =>
      if (interpolate.contains(f.name))
        coalesce(
          last(col(f.name), ignoreNulls = true).over(carry),
          default(f.dataType)).as(f.name)
      else coalesce(col(f.name), default(f.dataType)).as(f.name)
    }
    grid.join(df, Seq(orderCol), "full_outer")
      .select(col(orderCol) +: filled.toIndexedSeq: _*)
      .orderBy(col(orderCol))
  }
}
