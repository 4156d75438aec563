package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .appName("planpeek")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.dialect.ChFunctions.register(spark)
    def ord = graft.core.Tables.load(spark, base, "orders")
    def li = graft.core.Tables.load(spark, base, "lineitem")
    val q3 = ord.agg(countDistinct(col("o_custkey")).as("u"))
    // the WRITE plan is what Bench times — capture it via the listener
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        seen.add(f + "\n" + qe.executedPlan.toString.take(1500))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    q3.write.format("noop").mode("overwrite").save()
    val q1 = li.agg(count(lit(1)).as("cnt"))
    q1.write.format("noop").mode("overwrite").save()
    Thread.sleep(1000)
    seen.forEach(s => println("[planpeek] ==== " + s.replace("\n", "\n[planpeek] ")))
    spark.stop()
  }
}
