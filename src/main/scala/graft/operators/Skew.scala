package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder-prompt scale rule: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join splitting (on in `Engine.session`) handles join
  * skew at runtime; these helpers cover the aggregation-skew case AQE
  * does not: a `groupBy(hotKey)` where one key holds a large fraction
  * of all rows ships that key's entire volume to one reducer. Salting
  * splits the hot key across `buckets` reducers with a two-phase
  * aggregation — the standard partial/final decomposition, expressed
  * declaratively so both phases stay codegen'd hash aggregates.
  */
object Skew {

  /** Two-phase salted count: phase 1 groups on (key, salt) — spreading
    * any hot key over `buckets` reducers — phase 2 merges the partial
    * counts per key. Correct for any key distribution; costs one extra
    * (tiny) shuffle of `buckets × |keys|` partial rows. */
  def saltedCount(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("_k"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy("_k")
      .agg(sum("_partial").cast("long").as("cnt"))

  /** Two-phase salted sum over `value`. Same decomposition; any
    * algebraic aggregate (sum/count/min/max) can ride this shape. */
  def saltedSum(df: DataFrame, key: Column, value: Column, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("_k"), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy("_k")
      .agg(sum("_partial").as("sum"))

  /** Salted join of a skewed fact side against a dimension: the fact's
    * join key gains a random salt in [0, buckets); the dimension is
    * replicated `buckets` times with every salt value, so each hot-key
    * shard joins locally. Use when the dimension is too big to
    * broadcast but the fact key distribution is pathological and AQE's
    * runtime splitting is unavailable (e.g. pre-3.2 clusters or
    * non-shuffle joins). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim,
        factKey === dimKey && saltedFact("_salt") === replicatedDim("_salt"))
      .drop("_salt")
  }
}
