package org.apache.spark.deploy.graft

import org.apache.spark.SparkConf
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv

/** Bridge into Spark's standalone deploy endpoints (`private[deploy]`)
  * so [[graft.cluster.ElasticPool]] can run a REAL standalone master
  * and add/remove REAL workers (each forking executor JVMs) inside one
  * controlling process — the same machinery `local-cluster[n,c,m]`
  * uses (`LocalSparkCluster`), except the fleet is ELASTIC: workers
  * join and leave while an application is running. Same shim rationale
  * as [[org.apache.spark.sql.graft.FunctionShim]]: the deploy
  * endpoints (and `RpcEnv` itself) are package-private, the behavior
  * is public Spark — callers outside org.apache.spark only see the
  * opaque [[StandaloneShim.EndpointHandle]]. */
object StandaloneShim {

  /** Opaque lifecycle handle over a deploy endpoint's RpcEnv. */
  final class EndpointHandle private[StandaloneShim] (env: RpcEnv) {
    def shutdown(): Unit = env.shutdown()
    def hostPort: String = s"${env.address.host}:${env.address.port}"
    /** Block until the RpcEnv stops — the worker DAEMON main parks on
      * this so a forked worker process stays alive (r18). */
    def awaitTermination(): Unit = env.awaitTermination()
  }

  /** Start a standalone Master on an ephemeral port; returns its
    * handle and `spark://host:port` URL. */
  def startMaster(host: String, conf: SparkConf): (EndpointHandle, String) = {
    val (rpcEnv, _, _) = Master.startRpcEnvAndEndpoint(host, 0, 0, conf)
    (new EndpointHandle(rpcEnv),
      s"spark://${rpcEnv.address.host}:${rpcEnv.address.port}")
  }

  /** Start one standalone Worker (ephemeral ports) offering
    * `cores`/`memoryMb` to `masterUrl`; forks executor JVMs on demand. */
  def startWorker(
      host: String,
      cores: Int,
      memoryMb: Int,
      masterUrl: String,
      workDir: String,
      workerNumber: Int,
      conf: SparkConf): EndpointHandle =
    new EndpointHandle(Worker.startRpcEnvAndEndpoint(host, 0, 0, cores,
      memoryMb, Array(masterUrl), workDir, Some(workerNumber), conf, None))
}
