package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanPeek2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("planpeek2").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.dialect.ChFunctions.register(spark)
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val df = li.select(call_function("cityHash64",
        li.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(sum(pmod(col("h"), lit(1000000007L))).as("s"))
    println("[peek2] OPTIMIZED:\n" + df.queryExecution.optimizedPlan.treeString.take(3000))
    spark.stop()
  }
}
