package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted exact quantiles — CH `quantileExactWeighted` semantics
  * (nearest-rank over a weighted multiset: the smallest value whose
  * cumulative weight reaches q × total weight), expressed as the
  * distributed DataFrame shape rather than a custom aggregate: a
  * per-group value-ordered running weight, threshold filter, min.
  *
  * Deterministic under ties: whether equal values accumulate in any
  * intra-tie order, a value's run-END cumulative weight is fixed, so
  * the smallest value at-or-past the threshold is unique.
  *
  * Scale posture: one shuffle on the group columns; the window's
  * running sum is computed incrementally per group partition (no
  * whole-group materialization beyond Spark's window buffer). Groups
  * are analysis dimensions (flags, languages, sources) — a
  * pathologically hot group is ordinary group-skew. Zero or negative
  * weights are rejected: CH ignores zero-weight rows; here they would
  * shift nearest-rank boundaries silently. */
object Quantiles {

  def weightedQuantile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"q=$q must be in (0, 1]")
    val groups = groupCols.map(col)
    val byGroup = Window.partitionBy(groups: _*)
    val cum = byGroup.orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = df
      .select((groups :+ col(valueCol) :+ col(weightCol).cast("double").as("_w")): _*)
      // CH quantileExactWeighted skips NULL values; counting their
      // weights (NULLs sort first under asc) would shift the
      // nearest-rank threshold on groups containing NULLs (advisor r7)
      .filter(col(valueCol).isNotNull && col("_w") > 0)
      .withColumn("_cumw", sum(col("_w")).over(cum))
      // the total is the MAX of the same running sum, not an
      // independently-ordered window sum: with fractional weights the
      // two could differ by an ulp, and at q = 1.0 a total one ulp
      // above the final prefix sum would silently drop the group
      .withColumn("_totw", max(col("_cumw")).over(byGroup))
    marked
      .filter(col("_cumw") >= col("_totw") * q)
      .groupBy(groups: _*)
      .agg(min(col(valueCol)).as(s"wq_$valueCol"))
  }
}
