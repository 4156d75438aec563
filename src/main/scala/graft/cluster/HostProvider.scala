package graft.cluster

/** Where worker-daemon processes RUN — the seam between the elastic
  * pool's lifecycle logic (join → schedule → ready; die → fast-fail →
  * re-run) and the machinery that places a daemon on a machine.
  *
  * The reference's O3 is a cloud REST API (`fly/fly.go:114-167`
  * creates fly.io machines whose entrypoint is the worker daemon);
  * this sandbox has exactly one machine, so the shipped providers are
  * [[HostProvider.LocalProcess]] (fork on this host — the honest
  * kill -9 drill) and [[HostProvider.CommandWrapped]] (prefix the
  * launch command — the shape `ssh host …`, `docker run …`, or a
  * cloud-init user-data script plugs into). Everything ABOVE the seam
  * — master registration, readiness, node-death re-run, teardown — is
  * identical for any provider, which is the point: a fly/EC2
  * integration implements `launch` and nothing else changes.
  */
trait HostProvider {
  def name: String

  /** Start the daemon described by `spec` on some host; returns a
    * handle owning its lifetime. Must not block on the daemon's own
    * startup (registration with the master IS the readiness signal —
    * [[ExecutorAllocator.waitReady]] owns that barrier). */
  def launch(spec: HostProvider.LaunchSpec): HostProvider.NodeHandle
}

object HostProvider {

  /** A fully-resolved daemon launch: argv, working directory, extra
    * environment, and where to write the daemon's stdout/stderr. */
  final case class LaunchSpec(
      command: Seq[String],
      workDir: String,
      env: Map[String, String],
      logFile: String)

  /** One placed node. `kill9` is UNGRACEFUL — the dead-VM semantics
    * (daemon and every executor JVM it forked die without a goodbye;
    * the master learns from the broken transport). */
  trait NodeHandle {
    def alive: Boolean
    def kill9(): Unit
  }

  private final class ProcessHandle9(p: Process) extends NodeHandle {
    def alive: Boolean = p.isAlive
    def kill9(): Unit = {
      // executor JVMs are CHILDREN of the daemon — SIGKILL on the
      // parent alone strands them (r18 lesson); take the whole tree
      p.toHandle.descendants().forEach(d => { d.destroyForcibly(); () })
      p.destroyForcibly()
      ()
    }
  }

  private def spawn(argv: Seq[String], spec: LaunchSpec): NodeHandle = {
    val pb = new ProcessBuilder(argv: _*)
    pb.redirectOutput(new java.io.File(spec.logFile))
    pb.redirectErrorStream(true)
    spec.env.foreach { case (k, v) => pb.environment().put(k, v) }
    new ProcessHandle9(pb.start())
  }

  /** Fork on THIS host — the sandbox's one real placement. */
  object LocalProcess extends HostProvider {
    val name = "local-process"
    def launch(spec: LaunchSpec): NodeHandle = spawn(spec.command, spec)
  }

  /** Run the daemon under a wrapper command (`prefix ++ command`) —
    * the integration shape for remote placement: `ssh -T host`,
    * `docker run --rm image`, or a cloud CLI that execs its trailing
    * argv on a fresh VM. The handle kills the WRAPPER's process tree;
    * for transports that proxy signals (ssh -t, docker run) that takes
    * the remote daemon with it, the same dead-VM semantics. */
  final case class CommandWrapped(prefix: Seq[String],
      override val name: String) extends HostProvider {
    def launch(spec: LaunchSpec): NodeHandle = spawn(prefix ++ spec.command, spec)
  }
}
