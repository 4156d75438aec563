package graft.cluster

import org.apache.spark.SparkConf
import org.apache.spark.deploy.graft.StandaloneShim

/** A RUNNABLE elastic standalone fleet — the live twin of the
  * reference's VM pool (SURVEY §2.7 O3; reference `fly/fly.go:114-172`
  * creates, queries, and destroys 30 fly.io machines in ~15 s;
  * `temporal/workflow_query_executor.go:118-163` spawns N nodes per
  * query and `:70-80` always tears them down).
  *
  * This is the piece that was stub-only for eight rounds: everything
  * BEHIND the [[ExecutorAllocator]] seam. It runs a REAL standalone
  * Master and N REAL Workers inside the controlling JVM (the exact
  * machinery of Spark's `local-cluster`, via
  * [[org.apache.spark.deploy.graft.StandaloneShim]]) — each worker
  * FORKS a separate executor JVM for a registered application — and,
  * unlike `local-cluster`, the fleet is elastic while an application
  * runs:
  *
  *   - [[addWorkers]] — O2 `SpawnNodes`: new workers register with the
  *     live master; the master immediately schedules executors for
  *     running apps on them (standalone spreads by default), so a
  *     session's capacity GROWS mid-query-stream with no restart.
  *   - [[removeWorker]] — O8 `DeleteNodes`: shutting the worker's
  *     RpcEnv drops its TCP link; the master's disassociation handler
  *     marks the worker DEAD at once (not the 60 s heartbeat path),
  *     kills its executors, and in-flight tasks re-run elsewhere —
  *     the partial-capacity tolerance the reference gets from
  *     `lo.FilterMap` over failed creates.
  *   - [[ExecutorAllocator.waitReady]] is the readiness barrier over
  *     this pool, now exercised against a real cluster manager rather
  *     than a fixed `local-cluster` (its `ensure()` maps to
  *     `requestTotalExecutors` on the standalone backend).
  *
  * 100 TB posture: on a real deployment the master is long-lived and
  * `addWorkers`/`removeWorker` become cloud-API calls that boot the
  * worker daemon on fresh VMs — the session-side contract (join →
  * schedule → ready; leave → fast-fail → re-run) is exactly what this
  * twin proves. Driven end-to-end by [[graft.ElasticSmoke]].
  */
class ElasticPool(host: String = "127.0.0.1") {

  private val conf = {
    val c = new SparkConf(false)
    c.set("spark.ui.enabled", "false")
    c.set("spark.deploy.recoveryMode", "NONE")
    // a removed worker must be forgotten, not re-listed as UNKNOWN
    c.set("spark.worker.cleanup.enabled", "false")
    c
  }

  private var masterEnv: StandaloneShim.EndpointHandle = _
  /** `spark://host:port` of the live master. */
  var masterUrl: String = _
  private val workers =
    scala.collection.mutable.LinkedHashMap.empty[Int, StandaloneShim.EndpointHandle]
  private var nextWorker = 0

  def start(): String = synchronized {
    require(masterEnv == null, "pool already started")
    val (env, url) = StandaloneShim.startMaster(host, conf)
    masterEnv = env
    masterUrl = url
    url
  }

  /** O2: join `n` fresh workers to the live master. Returns their ids
    * (usable with [[removeWorker]]). Each worker offers `cores` and
    * `memoryMb` and forks one executor JVM per registered app. */
  def addWorkers(n: Int, cores: Int, memoryMb: Int,
      workDirBase: String): Seq[Int] = synchronized {
    require(masterEnv != null, "pool not started")
    (0 until n).map { _ =>
      val id = nextWorker
      nextWorker += 1
      val wd = new java.io.File(s"$workDirBase/worker-$id")
      wd.mkdirs()
      workers(id) = StandaloneShim
        .startWorker(host, cores, memoryMb, masterUrl, wd.getAbsolutePath,
          // worker RPC names are indexed from the number we pass; keep
          // them unique across the pool's lifetime
          id, conf)
      id
    }
  }

  /** O8: remove one worker from the fleet. The RpcEnv shutdown closes
    * its transport — the master sees the disassociation immediately,
    * marks the worker DEAD, and the app's executors on it are lost
    * (tasks re-run on surviving workers). */
  def removeWorker(id: Int): Boolean = synchronized {
    workers.remove(id) match {
      case Some(env) =>
        env.shutdown()
        true
      case None => false
    }
  }

  def workerIds: Seq[Int] = synchronized(workers.keys.toSeq)

  // ---- out-of-process workers (r18; VERDICT r17 next #5) ----

  private val procWorkers =
    scala.collection.mutable.LinkedHashMap.empty[Int, HostProvider.NodeHandle]

  /** O2, the daemon variant: launch [[WorkerDaemon]] as its OWN JVM
    * through a [[HostProvider]] (r19 seam) — the process a cloud
    * `SpawnNodes` boots on a fresh VM. The default provider forks on
    * this host; a remote provider changes ONLY where the argv runs.
    * The worker registers with the live master exactly like the
    * in-JVM variant; unlike it, the node can DIE ungracefully
    * ([[killWorker9]]). */
  def addProcessWorker(cores: Int, memoryMb: Int, workDirBase: String,
      provider: HostProvider = HostProvider.LocalProcess): Int = synchronized {
    require(masterEnv != null, "pool not started")
    val id = nextWorker
    nextWorker += 1
    procWorkers(id) = provider.launch(
      workerLaunchSpec(id, cores, memoryMb, workDirBase))
    id
  }

  /** The fully-resolved daemon launch for worker `id` — argv, workdir,
    * env, log sink. Public so an out-of-tree provider (ssh/cloud) can
    * render it into its own bootstrap (user-data script, docker CMD). */
  def workerLaunchSpec(id: Int, cores: Int, memoryMb: Int,
      workDirBase: String): HostProvider.LaunchSpec = {
    require(masterUrl != null, "pool not started")
    val wd = new java.io.File(s"$workDirBase/worker-$id")
    wd.mkdirs()
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED")
    val cmd = Seq(javaBin, "-Xmx512m") ++ addOpens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.cluster.WorkerDaemon",
      host, cores.toString, memoryMb.toString, masterUrl,
      wd.getAbsolutePath, id.toString)
    HostProvider.LaunchSpec(
      command = cmd,
      workDir = wd.getAbsolutePath,
      env = sys.env.get("SPARK_SCALA_VERSION")
        .map(v => "SPARK_SCALA_VERSION" -> v).toMap,
      logFile = new java.io.File(wd, "daemon.out").getAbsolutePath)
  }

  /** O8, the crash variant: SIGKILL the worker's whole process tree —
    * daemon AND its forked executor JVMs, the way a dead VM takes
    * everything on it. No graceful disassociation is sent; the master
    * learns from the broken transport, and in-flight tasks of the lost
    * executors re-run on survivors (the reference's partial-capacity
    * tolerance, `workflow_query_executor.go:155-158`). */
  def killWorker9(id: Int): Boolean = synchronized {
    procWorkers.remove(id) match {
      case Some(h) => h.kill9(); true
      case None => false
    }
  }

  def stop(): Unit = synchronized {
    workers.values.foreach(_.shutdown())
    workers.clear()
    procWorkers.values.foreach(_.kill9())
    procWorkers.clear()
    if (masterEnv != null) { masterEnv.shutdown(); masterEnv = null }
  }
}
