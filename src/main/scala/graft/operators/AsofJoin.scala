package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ASOF join — the one join class in SURVEY §2.4 with no Spark
  * built-in: for every left row, the single right row with the
  * greatest `rightTime ≤ leftTime` sharing the join key (ClickHouse
  * `ASOF JOIN`, backward direction).
  *
  * Implementation is the union + running-`last(ignoreNulls)` window
  * trick (SURVEY §2.4's suggested composition): tag both inputs, union
  * them, sort per key by (time, side) so a right row at the exact same
  * timestamp precedes the left row (inclusive ≤), and carry the most
  * recent right payload forward with an unbounded-preceding window.
  *
  * Scale shape: ONE shuffle (hash partition by key) + per-key sort —
  * the same cost as any keyed window; no range join, no cartesian, no
  * per-row probing. Skewed keys ride the same salting/AQE machinery as
  * every other keyed shuffle.
  */
object AsofJoin {

  /** Backward ASOF join.
    *
    * @param rightPayload right columns to carry (suffixed `_r` on name
    *   clash with left columns)
    * @param rightTieBreak deterministic winner among right rows with
    *   identical (key, time) — recommended whenever duplicates are
    *   possible
    * @param inner drop left rows with no preceding right row (CH ASOF
    *   JOIN default); false = LEFT ASOF (nulls)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: Option[String] = None,
      inner: Boolean = true): DataFrame = {
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))
    val leftRowType = StructType(left.schema.fields)

    val taggedLeft = left.select(
      col(key).as("_k"),
      col(leftTime).as("_t"),
      lit(1).as("_isLeft"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_lrow"),
      lit(null).cast(payloadType).as("_payload"),
      lit(null).cast("long").as("_tie"))
    val taggedRight = right.select(
      col(key).as("_k"),
      col(rightTime).as("_t"),
      lit(0).as("_isLeft"),
      lit(null).cast(leftRowType).as("_lrow"),
      struct(rightPayload.map(col).toIndexedSeq: _*).as("_payload"),
      rightTieBreak.map(col(_).cast("long")).getOrElse(lit(0L)).as("_tie"))

    // right rows sort before left rows at equal time (inclusive ≤);
    // among right ties the greatest tie-break wins (it is the last one
    // the running window sees)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_isLeft").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedLeft.unionByName(taggedRight)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_isLeft") === 1)

    val filtered = if (inner) matched.filter(col("_match").isNotNull) else matched
    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c))
    val rightCols = rightPayload.map { c =>
      val name = if (left.columns.contains(c)) s"${c}_r" else c
      col(s"_match.$c").as(name)
    }
    filtered.select(leftCols.toIndexedSeq ++ rightCols: _*)
  }
}
