package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q2_group_sum experiment matrix (VERDICT r14 task #1: the last shape
  * with unclaimed headroom — 4.5× vs DuckDB at sf10; its 32-task
  * scan+partial-agg stage burns 10–16 CPU-seconds plus 1.2–3.5 s of GC
  * for a two-column parquet scan-and-sum whose wall is 0.42–0.58 s,
  * ~17 ns/row where DuckDB spends ~6).
  *
  * Attribution axes, each a RUNTIME SQL conf or a query-shape twin so
  * one session A/Bs them cleanly:
  *
  *   - keyless floor: `sum(l_quantity)` with no GROUP BY — the pure
  *     decode+sum cost, no hash map, no key materialization. The gap
  *     between this and the grouped shape IS the aggregation cost.
  *   - numeric-key twin: `GROUP BY l_linenumber` (7 int values) — same
  *     map shape without the per-row UTF8String key; the delta vs the
  *     string key is the string-key materialization cost.
  *   - vectorized agg map on/off: does the r14 default actually engage
  *     for a string-keyed group-by? (equal times = not engaging).
  *   - reader batch size 4k (default) vs 16k: per-batch overhead
  *     amortization on a 2-column scan.
  *   - AQE on/off and shuffle partitions 32 vs 8: the exchange carries
  *     ~3 keys per map task — reduce-side task count is pure overhead.
  *
  * Per-run GC deltas attribute the 1.2–3.5 s of collection: if the
  * keyless floor shows the same GC, it's parquet-decode churn (vector
  * allocation), not agg-map churn.
  *
  * Run with `Test/runMain graft.tools.Q2Matrix [base100 dir] [iters]`
  * on an otherwise idle box (bench protocol). */
object Q2Matrix {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse {
      val hits = Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_bench100x_") &&
          new java.io.File(f, "_DONE").exists())
      require(hits.nonEmpty, "no /tmp/graft_bench100x_* dir — run Bench first")
      hits.maxBy(_.lastModified).getPath
    }
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("q2matrix")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.files.minPartitionNum", "8")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the engine's r14 defaults
      .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = graft.core.Tables.load(spark, base, "lineitem")

    def gcMs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.stream.mapToLong(_.getCollectionTime).sum

    def time(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, gcMs - g0)
    }

    def report(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      time(mk) // warm this plan variant
      val rs = (1 to iters).map(_ => time(mk))
      val ts = rs.map(_._1).sorted
      println(f"[q2matrix] $name%-28s median=${ts(ts.size / 2)}%.3f " +
        f"min=${ts.head}%.3f max=${ts.last}%.3f " +
        s"gc_ms=${rs.map(_._2).mkString(",")} " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // query-shape twins under the engine defaults
    report("keyless_sum_floor", () =>
      li.agg(sum(col("l_quantity")).as("s")))
    report("groupby_int_l_linenumber", () =>
      li.groupBy("l_linenumber").agg(sum(col("l_quantity")).as("s")))
    report("q2_groupby_string", () =>
      li.groupBy("l_returnflag").agg(sum(col("l_quantity")).as("s")))
    report("groupby_2strings(q9_shape)", () =>
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("s")))

    // conf variants over the q2 shape
    val variants: Seq[(String, Map[String, String])] = Seq(
      "vecmap_off" -> Map(
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "false"),
      "twolevel_off" -> Map(
        "spark.sql.codegen.aggregate.map.twolevel.enabled" -> "false"),
      "batch16k" -> Map(
        "spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
      "batch16k+vecmap" -> Map(
        "spark.sql.parquet.columnarReaderBatchSize" -> "16384",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"),
      "aqe_off" -> Map(
        "spark.sql.adaptive.enabled" -> "false"),
      "aqe_off+sp8" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"),
      "maxpart128m" -> Map(
        "spark.sql.files.maxPartitionBytes" -> s"${128 * 1024 * 1024}"))
    variants.foreach { case (name, confs) =>
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try report(s"q2+$name", () =>
        li.groupBy("l_returnflag").agg(sum(col("l_quantity")).as("s")))
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // pruning proof through the dialect view: the scan must read ONLY
    // the two columns (ReadSchema), through ChSql the same as direct
    graft.core.Tables.load(spark, base, "lineitem")
      .createOrReplaceTempView("lineitem")
    val plan = graft.dialect.ChSql.sql(spark,
      "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem " +
        "GROUP BY l_returnflag").queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("no ReadSchema line")
    println(s"[q2matrix] dialect_read_schema: ${readSchema.trim.take(200)}")
    spark.stop()
  }
}
