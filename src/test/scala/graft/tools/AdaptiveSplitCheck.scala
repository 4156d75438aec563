package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Correctness check for the r19 adaptive kernel-split sizing at the
  * one scale that exercises it (sf10 fixture: tables larger than the
  * session split cap but narrower than cores×cap): every kernel shape
  * must answer identically with the adaptive splits on, off, and with
  * the kernels killed entirely.
  * Run: Test/runMain graft.tools.AdaptiveSplitCheck
  */
object AdaptiveSplitCheck {
  def main(args: Array[String]): Unit = {
    val base = Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft_bench100x_") &&
        new java.io.File(f, "_DONE").exists())
      .maxBy(_.lastModified).getPath
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("adaptivecheck")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.minPartitionNum", "8")
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.dialect.ChFunctions.register(spark)

    def li = graft.core.Tables.load(spark, base, "lineitem")
    def ord = graft.core.Tables.load(spark, base, "orders")
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q2" -> (() => li.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))),
      "q3" -> (() => ord.agg(countDistinct(col("o_custkey")).as("u"))),
      "q3b" -> (() => ord.agg(countDistinct(col("o_custkey")).as("u"),
        countDistinct(col("o_orderkey")).as("u2"))),
      "q4" -> (() => {
        val t = li
        t.select(call_function("cityHash64", t.columns.map(col).toIndexedSeq: _*).as("h"))
          .agg(sum(pmod(col("h"), lit(1000000007L))).as("s"))
      }))
    var ok = true
    shapes.foreach { case (name, mk) =>
      def rows() = mk().collect().map(_.toString).sorted.toSeq
      val adaptive = rows()
      spark.conf.set("spark.graft.kernelScan.adaptiveSplits", "false")
      val fixed = rows()
      spark.conf.set("spark.graft.bitmapDistinct", "false")
      spark.conf.set("spark.graft.dictAgg", "false")
      spark.conf.set("spark.graft.hashScan", "false")
      val native = rows()
      spark.conf.unset("spark.graft.bitmapDistinct")
      spark.conf.unset("spark.graft.dictAgg")
      spark.conf.unset("spark.graft.hashScan")
      spark.conf.unset("spark.graft.kernelScan.adaptiveSplits")
      val good = adaptive == fixed && fixed == native
      ok &= good
      println(s"[adaptivecheck] $name adaptive==fixed=${adaptive == fixed} " +
        s"fixed==native=${fixed == native} -> ${if (good) "OK" else "MISMATCH"}")
      if (!good) {
        println(s"  adaptive: ${adaptive.take(3)}")
        println(s"  native:   ${native.take(3)}")
      }
    }
    println(s"[adaptivecheck] ${if (ok) "ALL OK" else "FAILURES"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
