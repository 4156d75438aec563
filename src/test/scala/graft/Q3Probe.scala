package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exploratory decomposition of q3_uniq_exact (VERDICT r10 task #1):
  * per-stage wall/run/GC times and task counts for the exact-distinct
  * shape over the 10x orders copy. */
object Q3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench10x_b27a368985e3461a")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("Q3_PAGESIZE").foreach(v => builder.config("spark.buffer.pageSize", v))
    sys.env.get("Q3_VECMAP").foreach(v =>
      builder.config("spark.sql.codegen.aggregate.map.vectorized.enable", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long, Long, Long, Long)]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val jobStartTimes = scala.collection.mutable.Map.empty[Int, Long]
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime, m.executorDeserializeTime, m.jvmGCTime,
          m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.totalBytesRead))
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStartTimes(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs += ((e.jobId, jobStartTimes.getOrElse(e.jobId, 0L), e.time))
    }

    def orders = spark.read.parquet(s"$dir/orders.parquet")
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "uniq_exact" -> (() => orders.agg(countDistinct(col("o_custkey")).as("u"))),
      "uniq_coalesce8" -> (() => orders.coalesce(8)
        .agg(countDistinct(col("o_custkey")).as("u"))),
      "uniq_coalesce16" -> (() => orders.coalesce(16)
        .agg(countDistinct(col("o_custkey")).as("u"))),
      "scan_only" -> (() => orders.select("o_custkey").agg(count(col("o_custkey")).as("n"))),
      "scan_coalesce8" -> (() => orders.select("o_custkey").coalesce(8)
        .agg(count(col("o_custkey")).as("n"))),
      "uniq_big_6m" -> (() => spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(countDistinct(col("l_orderkey")).as("u"))),
      "uniq_big_6m_coalesce8" -> (() => spark.read.parquet(s"$dir/lineitem.parquet")
        .coalesce(8).agg(countDistinct(col("l_orderkey")).as("u"))))
    variants.foreach { case (name, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warmup
      (1 to 2).foreach { i =>
        stages.clear(); jobs.clear(); jobStartTimes.clear()
        spark.catalog.clearCache(); System.gc()
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // listener bus drain
        spark.sparkContext.removeSparkListener(l)
        println(f"[q3probe] $name iter $i wall=$wall%.3f s")
        stages.sortBy(_._1).foreach { case (id, nm, n, w, run, deser, gc, shuf) =>
          println(f"[q3probe]   stage $id%3d tasks=$n%3d wall=${w / 1000.0}%6.3f run=${run / 1000.0}%6.3f " +
            f"deser=${deser / 1000.0}%6.3f gc=${gc / 1000.0}%5.3f shufB=$shuf%9d  $nm")
        }
      }
    }
    spark.stop()
  }
}
