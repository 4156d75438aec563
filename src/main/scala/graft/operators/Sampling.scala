package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and data-mixing operators for training-data
  * pipelines (builder-prompt family, beyond the reference's surface —
  * the reference delegates sampling to ClickHouse's `SAMPLE` clause,
  * `temporal/workflow_query_executor_test.go:49` queries fixed files).
  *
  * Everything is keyed on a content hash, NOT `rand()`: the same row
  * always lands on the same side of the cut, across runs, engines and
  * cluster sizes — re-running a 100 TB mixing job is reproducible, and
  * a train/test split never leaks when the corpus is re-partitioned.
  *
  * The hash is the first 6 hex digits of md5 (24 bits), compared
  * LEXICOGRAPHICALLY against a fixed-width lowercase hex threshold:
  * both Spark's `md5` and DuckDB's `md5` emit identical lowercase hex
  * over the same UTF-8 bytes, so the oracle reproduces the exact
  * sample with string comparison alone (no engine-specific hash, no
  * hex→int cast portability trap). 24 bits → fraction granularity
  * 2^-24 ≈ 6e-8, far below any mixing-weight precision that matters.
  *
  * Scale posture: the predicate is a scan-stage projection + filter —
  * zero shuffles, zero joins (mixture weights compile to a `CASE`
  * chain, never a join), codegen end-to-end.
  */
object Sampling {

  private val Space = 1 << 24 // 6 hex digits

  /** Fixed-width lowercase hex threshold for `fraction` of the 24-bit
    * hash space. fraction ≤ 0 keeps nothing; ≥ 1 keeps everything. */
  private[operators] def hexThreshold(fraction: Double): String = {
    val cut = math.min(Space.toLong, math.max(0L, math.round(fraction * Space)))
    // fraction 1 must keep EVERY bucket; a 7-char "1000000" would sort
    // BELOW "ffffff" lexicographically ('1' < 'f'), so use "g", which
    // sorts above every hex digit
    if (cut >= Space) "g" else f"$cut%06x"
  }

  /** 6-hex-digit bucket of a key column (lowercase, fixed width). */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 6)

  /** Keep a deterministic `fraction` of rows, keyed on `keyCol`'s
    * content. Same key → same verdict, independent of partitioning. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit(hexThreshold(fraction)))

  /** Deterministic train/test split: rows whose bucket falls below
    * `testFraction` go to test. Returns (train, test); the two are a
    * partition of `df` (no overlap, no loss) for any re-run. */
  def splitTrainTest(
      df: DataFrame, keyCol: String, testFraction: Double): (DataFrame, DataFrame) = {
    val cut = lit(hexThreshold(testFraction))
    (df.filter(hashBucket(col(keyCol)) >= cut),
      df.filter(hashBucket(col(keyCol)) < cut))
  }

  /** Data mixing: sample each group (domain / source / language) at its
    * own rate. `weights` maps group value → keep fraction; groups
    * absent from the map keep `defaultFraction`. The weights compile
    * to a literal CASE chain — a scan-stage filter, never a join, so
    * mixing a 100 TB corpus is one pass with zero shuffles. */
  def mixture(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weights: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val cut = weights.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (g, f)) => when(col(groupCol) === lit(g), lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < cut)
  }

  /** Stratified sampling with EXACT per-group quotas: keep the first
    * `n` rows of each group in content-hash order (full md5 of the
    * key, then the UNIQUE `idCol` as tie-break) — deterministic across
    * runs and partitionings, unlike fraction-based `sampleBy`, which
    * only hits quotas in expectation. Returns the kept rows.
    *
    * `idCol` must be unique per row: duplicate keys (exactly the rows
    * a dup-heavy corpus has) carry identical (md5, key) sort keys, so
    * without a unique tie-break WHICH duplicate crosses the quota
    * boundary would depend on partitioning.
    *
    * Scale posture: one shuffle on the group column; each window
    * ranks only its own group's rows, and `WindowGroupLimit` prunes
    * to n per group before the final sort state grows. Strata in a
    * mixing pipeline are languages/sources — thousands at most — so
    * per-group state, not group count, is the bound; a pathologically
    * hot stratum is the same skew problem as any group-by and gets
    * the same salting remedy. */
  def stratifiedSample(
      df: DataFrame, groupCol: String, keyCol: String, n: Int,
      idCol: String): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** Deterministic global shuffle for training order, sharded the way
    * real pipelines write it: each row lands in one of `shards`
    * buckets by content hash, and gets a dense position within its
    * shard in content-hash order. Reading shards 0..S-1 sequentially
    * (or round-robin) yields a reproducible pseudo-random order of
    * the whole corpus — same key → same (shard, position) on every
    * run, engine, and partitioning. Returns the input plus
    * (shard, pos) columns.
    *
    * The shard index is the integer value of the first two md5 hex
    * digits (0..255) mod `shards` — reproducible in any engine from
    * the hex string alone (e.g. strpos arithmetic over
    * "0123456789abcdef" in SQL) — so `shards` may be 1..256.
    *
    * Scale posture: this is THE scale-correct global shuffle — a
    * single global row_number would serialize the corpus through one
    * partition, while per-shard windows parallelize S-ways and bound
    * each window's state to corpus/S. At 100 TB, set shards ≥
    * cluster parallelism and write one file per shard. */
  def shuffleShards(
      df: DataFrame, keyCol: String, shards: Int, idCol: String): DataFrame = {
    require(shards >= 1 && shards <= 256, s"shards=$shards must be in 1..256")
    val hex = md5(col(keyCol).cast("string"))
    val shard = pmod(conv(substring(hex, 1, 2), 16, 10).cast("int"), lit(shards))
    // tie-break on the UNIQUE id, not the key: duplicate keys hash
    // identically, and their relative positions must not depend on
    // partitioning
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("shard", shard)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Pack documents into fixed token-budget training examples: within
    * each deterministic shard, rows are laid out in content-hash order
    * and assigned `pack = floor(running_tokens / budget)` — the
    * cumulative-fill packing used for approximate sequence packing at
    * corpus scale (exact bin-packing is sequentially dependent and
    * cannot be a window aggregate; cumulative fill is the standard
    * approximation — a document may straddle a budget boundary by at
    * most its own length, bounded by chunking long documents first,
    * e.g. [[graft.operators.TextAnalysis]] chunking).
    *
    * Deterministic and engine-portable (md5 order, same keying as
    * [[shuffleShards]]); one window shuffle per shard, no global sort.
    * Returns the input plus `shard`, `pack`, and `pack_tokens_before`
    * (the running token count before this row — the row's offset
    * inside its pack modulo budget). */
  def packByTokenBudget(
      df: DataFrame,
      keyCol: String,
      tokenCol: String,
      budget: Long,
      shards: Int,
      idCol: String): DataFrame = {
    require(budget >= 1, s"budget=$budget must be positive")
    require(shards >= 1 && shards <= 256, s"shards=$shards must be in 1..256")
    val hex = md5(col(keyCol).cast("string"))
    val shard = pmod(conv(substring(hex, 1, 2), 16, 10).cast("int"), lit(shards))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(idCol).asc)
    val running = sum(col(tokenCol).cast("long"))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("shard", shard)
      .withColumn("_cum", running)
      .withColumn("pack", floor((col("_cum") - col(tokenCol)) / lit(budget)))
      .withColumn("pack_tokens_before",
        (col("_cum") - col(tokenCol)) % lit(budget))
      .drop("_cum")
  }
}
