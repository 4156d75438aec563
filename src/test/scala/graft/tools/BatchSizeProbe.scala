package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reader-batch-size A/B across the four baseline shapes at the sf10
  * fixture (r15, follow-up to Q2Matrix: 16k batches cut q2 ~20% — is
  * that free for the other shapes, including the 16-column q4 scan
  * whose per-task vector memory grows 4×?). Run with
  * `Test/runMain graft.tools.BatchSizeProbe <base100 dir> [iters]`. */
object BatchSizeProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse {
      val hits = Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_bench100x_") &&
          new java.io.File(f, "_DONE").exists())
      require(hits.nonEmpty, "no /tmp/graft_bench100x_* dir — run Bench first")
      hits.maxBy(_.lastModified).getPath
    }
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("batchprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.sql.files.minPartitionNum", "8")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // registers the dialect functions (cityHash64 for q4)
    graft.dialect.ChSql.sql(spark, "SELECT 1 AS warm").collect()
    def li = graft.core.Tables.load(spark, base, "lineitem")
    def ord = graft.core.Tables.load(spark, base, "orders")
    def hashScan() = li.select(call_function("cityHash64",
        li.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(sum(pmod(col("h"), lit(1000000007L))).as("s"))

    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q1_scan_count" -> (() => li.agg(count(lit(1)).as("cnt"))),
      "q2_group_sum" -> (() =>
        li.groupBy("l_returnflag").agg(sum(col("l_quantity")).as("s"))),
      "q3_uniq_exact" -> (() =>
        ord.agg(countDistinct(col("o_custkey")).as("u"))),
      "q4_hash_scan" -> (() => hashScan()))

    def gcMs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.stream.mapToLong(_.getCollectionTime).sum
    def time(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, gcMs - g0)
    }

    Seq("4096", "8192", "16384").foreach { bs =>
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", bs)
      shapes.foreach { case (name, mk) =>
        time(mk) // warm
        val rs = (1 to iters).map(_ => time(mk))
        val ts = rs.map(_._1).sorted
        println(f"[batchprobe] bs=$bs%-6s $name%-14s median=${ts(ts.size / 2)}%.3f " +
          f"min=${ts.head}%.3f max=${ts.last}%.3f " +
          s"gc_ms=${rs.map(_._2).mkString(",")}")
      }
    }
    spark.stop()
  }
}
