package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q3_uniq_exact experiment matrix (VERDICT r13 task #3: the worst
  * clean-window shape, 8-11× vs DuckDB at sf10). The r13 decomposition
  * put the 0.34 s wall at: ~0.12 s partial-distinct stage (8 tasks,
  * 0.83 s summed CPU), ~0.05 s single-task final, ~0.04 s of small
  * stages, and ~0.12 s of inter-stage gaps. Candidate levers, each a
  * RUNTIME SQL conf so one session A/Bs them cleanly:
  *
  *   - AQE off: for a 3-stage sub-second query the adaptive
  *     re-planning barrier between shuffle stages is pure overhead;
  *   - vectorized first-level agg hash map
  *     (`spark.sql.codegen.aggregate.map.vectorized.enable`, default
  *     FALSE): the partial stage is a keyed hash-agg over a dense
  *     15k-key domain — the row-based first-level map costs ~55ns/row;
  *   - both together.
  *
  * Run with `Test/runMain graft.tools.Q3Matrix [base100 dir] [iters]`
  * on an otherwise idle box (bench protocol). */
object Q3Matrix {
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
      .appName("q3matrix")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.files.minPartitionNum", "8")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def orders = graft.core.Tables.load(spark, base, "orders")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "base(aqe,rowmap)" -> Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "false"),
      "aqe_off" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "false"),
      "vecmap_on" -> Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"),
      "aqe_off+vecmap" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"),
      // shuffle-partition floor: the exchange only carries ~15k keys
      // per map task — 32 reduce partitions is pure task overhead
      "aqe_off+vecmap+sp8" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true",
        "spark.sql.shuffle.partitions" -> "8"),
      "aqe_off+vecmap+sp1" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true",
        "spark.sql.shuffle.partitions" -> "1"))

    // floor reference: the same scan with a keyless count
    def scanOnly() = orders.select("o_custkey")
      .agg(count(col("o_custkey")).as("n"))

    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    scanOnly().write.format("noop").mode("overwrite").save() // JIT warm
    val floor = (1 to 5).map(_ => time(scanOnly)).sorted
    println(f"[q3matrix] scan_floor  median=${floor(floor.size / 2)}%.3f all=${floor.map(t => f"$t%.3f").mkString(",")}")

    variants.foreach { case (name, confs) =>
      val saved = confs.keys.map(k =>
        k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        def q() = orders.agg(countDistinct(col("o_custkey")).as("u"))
        time(q _) // warm this plan variant
        val ts = (1 to iters).map(_ => time(q _)).sorted
        println(f"[q3matrix] $name%-22s median=${ts(ts.size / 2)}%.3f " +
          f"min=${ts.head}%.3f max=${ts.last}%.3f " +
          s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
