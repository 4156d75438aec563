package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query floor attribution (VERDICT r15 task #2: q1 sf10 spends
  * 51–91 ms on a footer-metadata count DuckDB answers in 1–13 ms; the
  * floor is shared by every sub-second query through the doors).
  * Decomposes one q1-shaped query into its driver-side phases:
  *
  *   - `load`: `spark.read.parquet` — dir listing (FileStatusCache
  *     after the first) + schema inference (reads one footer).
  *   - `plan`: analysis + optimization, including the
  *     FooterAggregates sweep (cached after the first) — ends with the
  *     executedPlan materialized.
  *   - `exec`: the noop write — job submission + the LocalTableScan
  *     task for a footer-served count.
  *
  * Then A/Bs the repeat-query shapes: fresh-load per query (what Bench
  * does), reused DataFrame (plan re-derived, load skipped), and
  * explicit-schema read (inference skipped). Run with
  * `Test/runMain graft.tools.FloorProbe <base100 dir> [iters]`. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse {
      val hits = Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_bench100x_") &&
          new java.io.File(f, "_DONE").exists())
      require(hits.nonEmpty, "no /tmp/graft_bench100x_* dir — run Bench first")
      hits.maxBy(_.lastModified).getPath
    }
    val iters = args.lift(1).map(_.toInt).getOrElse(9)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("floorprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.files.minPartitionNum", "8")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"$base/lineitem.parquet"

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // warmup: caches (FileStatusCache, footer sweep, codegen)
    spark.read.parquet(path).agg(count(lit(1)).as("cnt"))
      .write.format("noop").mode("overwrite").save()

    val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
    val plans = scala.collection.mutable.ArrayBuffer.empty[Double]
    val execs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to iters).foreach { _ =>
      var df: org.apache.spark.sql.DataFrame = null
      loads += ms { df = spark.read.parquet(path) }
      var agg: org.apache.spark.sql.DataFrame = null
      plans += ms {
        agg = df.agg(count(lit(1)).as("cnt"))
        agg.queryExecution.executedPlan // force analyze+optimize+plan
      }
      execs += ms { agg.write.format("noop").mode("overwrite").save() }
    }
    println(f"[floorprobe] phase load   median=${med(loads.toSeq)}%.1f ms all=${loads.map(v => f"$v%.1f").mkString(",")}")
    println(f"[floorprobe] phase plan   median=${med(plans.toSeq)}%.1f ms all=${plans.map(v => f"$v%.1f").mkString(",")}")
    println(f"[floorprobe] phase exec   median=${med(execs.toSeq)}%.1f ms all=${execs.map(v => f"$v%.1f").mkString(",")}")

    // end-to-end shapes
    def endToEnd(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to iters).map(_ => ms {
        mk().write.format("noop").mode("overwrite").save()
      })
      println(f"[floorprobe] e2e $name%-22s median=${med(ts)}%.1f ms all=${ts.map(v => f"$v%.1f").mkString(",")}")
    }
    endToEnd("fresh_load", () =>
      spark.read.parquet(path).agg(count(lit(1)).as("cnt")))
    // the shipped fix: Tables.load rides the content-keyed schema cache
    endToEnd("cached_load(Tables)", () =>
      graft.core.Tables.load(spark, base, "lineitem")
        .agg(count(lit(1)).as("cnt")))
    val schema = spark.read.parquet(path).schema
    endToEnd("explicit_schema", () =>
      spark.read.schema(schema).parquet(path).agg(count(lit(1)).as("cnt")))
    val reused = spark.read.parquet(path)
    endToEnd("reused_df", () => reused.agg(count(lit(1)).as("cnt")))
    reused.createOrReplaceTempView("floor_li")
    endToEnd("temp_view_sql", () =>
      spark.sql("SELECT count(1) AS cnt FROM floor_li"))
    // the sum twin: same phases plus a REAL 32-task scan
    endToEnd("sum_fresh_load", () =>
      spark.read.parquet(path).agg(sum(col("l_quantity")).as("s")))
    spark.stop()
  }
}
