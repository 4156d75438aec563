package graft.cluster

import org.apache.spark.SparkConf
import org.apache.spark.deploy.graft.StandaloneShim

/** The standalone Worker as its OWN PROCESS — the daemon a cloud-API
  * `SpawnNodes` boots on a fresh VM (reference `fly/fly.go:114-172`
  * creates machines whose entrypoint is exactly this: join the master,
  * offer cores, fork executors). [[ElasticPool.addProcessWorker]]
  * forks this main; killing the process (-9) is the honest node-death
  * drill [[graft.ElasticSmoke]] runs: the master loses the TCP link,
  * marks the worker DEAD, the lost executor's tasks re-run on
  * survivors, and the in-flight query still answers.
  *
  * Args: host cores memoryMb masterUrl workDir workerNumber
  */
object WorkerDaemon {
  def main(args: Array[String]): Unit = {
    require(args.length == 6,
      "usage: WorkerDaemon host cores memoryMb masterUrl workDir workerNumber")
    val Array(host, cores, memoryMb, masterUrl, workDir, workerNumber) = args
    val conf = new SparkConf(false)
    conf.set("spark.ui.enabled", "false")
    val handle = StandaloneShim.startWorker(host, cores.toInt, memoryMb.toInt,
      masterUrl, workDir, workerNumber.toInt, conf)
    println(s"[workerdaemon] up at ${handle.hostPort} (master $masterUrl)")
    handle.awaitTermination()
  }
}
