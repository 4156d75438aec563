package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off experiment harness for the q2 sf10 gap (VERDICT r11 task
  * #7): times the group-by-sum over the 100× lineitem copy under
  * different reader/memory confs, with per-run GC deltas. Run with
  * `Test/runMain graft.tools.Q2Probe <base100 dir>`. */
object Q2Probe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_bench_100x")
    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map.empty,
      "batch16k" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
      "batch8k" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "8192"),
      "offheapVec" -> Map(
        "spark.sql.columnVector.offheap.enabled" -> "true",
        "spark.memory.offHeap.enabled" -> "true",
        "spark.memory.offHeap.size" -> "8g"),
      "batch16k+offheap" -> Map(
        "spark.sql.parquet.columnarReaderBatchSize" -> "16384",
        "spark.sql.columnVector.offheap.enabled" -> "true",
        "spark.memory.offHeap.enabled" -> "true",
        "spark.memory.offHeap.size" -> "8g"))
    variants.foreach { case (name, confs) =>
      val spark = SparkSession.builder()
        .master("local[32]")
        .appName(s"q2probe-$name")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
        .config("spark.sql.files.minPartitionNum", "8")
        .config("spark.ui.enabled", "false")
        .config(confs)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        def gcMs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .stream.mapToLong(_.getCollectionTime).sum
        def run(): (Double, Long) = {
          val g0 = gcMs
          val t0 = System.nanoTime()
          spark.read.parquet(s"$base/lineitem.parquet")
            .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
            .write.format("noop").mode("overwrite").save()
          ((System.nanoTime() - t0) / 1e9, gcMs - g0)
        }
        run() // warmup
        val rs = (1 to 3).map(_ => run())
        val med = rs.map(_._1).sorted.apply(1)
        println(f"[q2probe] $name%-18s median=${med}%.3f s  gc=${rs.map(_._2).mkString(",")} ms")
      } finally spark.stop()
    }
  }
}
