package graft

import org.apache.spark.sql.SparkSession

/** Service process entry — the reference's `main.go:44-70` shape: start
  * the metrics/health/query HTTP surface, then block until SIGTERM.
  * `GRAFT_HTTP_PORT` (default 8080) mirrors the reference's `HTTP_PORT`
  * env (`http_server.go:31`). Optional arg 1 = testdata dir to
  * pre-register as views (so a fresh process can serve queries
  * immediately, like the reference's ATTACH-on-init flow).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-serve")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.foreach(dir => graft.core.Tables.registerViews(spark, dir))
    val port = sys.env.getOrElse("GRAFT_HTTP_PORT", "8080").toInt
    val bound = new graft.service.QueryServer(spark, port).start()
    System.err.println(s"[serve] listening on 127.0.0.1:$bound (GET /hc, POST /query, GET /metrics)")
    // block until signalled, like the reference's signal.Notify loop
    val latch = new java.util.concurrent.CountDownLatch(1)
    sys.addShutdownHook { latch.countDown() }
    latch.await()
  }
}
