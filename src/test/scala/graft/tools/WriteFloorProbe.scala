package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the 1-row noop-write exec floor (ConstProbe r19: q1's
  * warm exec is ~16 ms for a footer-served count — the write job, not
  * the count). Phases timed separately, warm, median-of-N:
  *   - analyze+plan of the write (no execution)
  *   - executeCollect of the 1-row child (no write machinery)
  *   - full noop write (job submit + 1 task + V2 commit)
  *   - a bare empty-RDD job (sc.runJob floor)
  * Run: Test/runMain graft.tools.WriteFloorProbe [iters]
  */
object WriteFloorProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def report(name: String, xs: Seq[Double]): Unit =
      println(f"[writefloor] $name%-28s median=${med(xs)}%6.1f ms  all=${xs.map(x => f"$x%.1f").mkString(",")}")

    val one = spark.range(1).select(lit(42L).as("v"))
    // warm everything
    (1 to 3).foreach { _ =>
      one.write.format("noop").mode("overwrite").save()
      one.collect()
    }

    report("plan_only", (1 to iters).map(_ => ms {
      val df = spark.range(1).select(lit(42L).as("v"))
      df.queryExecution.executedPlan
    }))
    report("collect_1row", (1 to iters).map(_ => ms {
      spark.range(1).select(lit(42L).as("v")).collect()
    }))
    report("noop_write_1row", (1 to iters).map(_ => ms {
      spark.range(1).select(lit(42L).as("v"))
        .write.format("noop").mode("overwrite").save()
    }))
    // reuse the DataFrame: isolates per-call analysis from the write
    report("noop_write_reused_df", (1 to iters).map(_ => ms {
      one.write.format("noop").mode("overwrite").save()
    }))
    val rdd = spark.sparkContext.parallelize(Seq(1), 1)
    report("bare_runjob_1task", (1 to iters).map(_ => ms {
      spark.sparkContext.runJob(rdd, (it: Iterator[Int]) => it.size)
    }))
    // long tight loop: the true post-JIT floor
    val long = (1 to 300).map(_ => ms {
      spark.sparkContext.runJob(rdd, (it: Iterator[Int]) => it.size)
    })
    report("bare_runjob_1task_x300_tail", long.takeRight(50))
    val rdd8 = spark.sparkContext.parallelize(1 to 8, 8)
    val long8 = (1 to 100).map(_ => ms {
      spark.sparkContext.runJob(rdd8, (it: Iterator[Int]) => it.size)
    })
    report("bare_runjob_8task_x100_tail", long8.takeRight(30))
    spark.stop()
  }
}
