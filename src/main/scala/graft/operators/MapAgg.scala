package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CH `sumMap`-family semantics (sum values per key across rows,
  * returning sorted key/value arrays per group) as the distributed
  * shape, NOT a single aggregate expression: a collect-then-fold
  * aggregate would hold every input row's map in executor memory per
  * group, while CH's own sumMap state is bounded by DISTINCT keys.
  * Here the key becomes a grouping column — explode → two-level hash
  * aggregate (map-side combined) → per-group reassembly whose state is
  * exactly the distinct-key set. Two shuffles, both on keys, both
  * AQE-coalescible; survives any corpus size × bounded key domain
  * (the CH use case: pre-aggregated metric tables).
  */
object MapAgg {

  /** Per `groupCols` group: element-wise sum of `valsCol` by `keysCol`
    * (parallel arrays, CH sumMap argument shape). Returns one row per
    * group with `keys` (sorted ascending) and `vals` aligned. */
  def sumMap(
      df: DataFrame,
      groupCols: Seq[String],
      keysCol: String,
      valsCol: String): DataFrame = {
    require(groupCols.nonEmpty, "sumMap needs at least one group column")
    val g = groupCols.map(col)
    // arrays_zip, not map_from_arrays: a row may repeat a key (CH sums
    // duplicates; Spark's map constructor throws on them)
    val kv = df
      .select(g :+ col(keysCol).as("_ka") :+ col(valsCol).as("_va"): _*)
      .select(g :+ explode(arrays_zip(col("_ka"), col("_va"))).as("_e"): _*)
      .select(g :+ col("_e._ka").as("_k") :+ col("_e._va").as("_v"): _*)
    val perKey = kv.groupBy(g :+ col("_k"): _*).agg(sum(col("_v")).as("_s"))
    perKey.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("_k"), col("_s")))).as("_kv"))
      .select(
        g ++ Seq(
          transform(col("_kv"), e => e.getField("_k")).as("keys"),
          transform(col("_kv"), e => e.getField("_s")).as("vals")): _*)
  }
}
