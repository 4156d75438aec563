package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

/** The r19 placement seam in isolation (the live fleet drill is
  * ElasticSmoke phase 6): argv/env/log plumbing and ungraceful
  * tree-kill semantics, no Spark involved. */
class HostProviderSpec extends AnyFunSuite {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_hp").toString

  test("LocalProcess runs the argv with the spec's env and log sink") {
    val dir = tmp()
    val spec = HostProvider.LaunchSpec(
      command = Seq("/bin/sh", "-c", "echo marker=$GRAFT_HP_MARK"),
      workDir = dir, env = Map("GRAFT_HP_MARK" -> "42"),
      logFile = s"$dir/out.log")
    val h = HostProvider.LocalProcess.launch(spec)
    val deadline = System.nanoTime() + 10e9.toLong
    while (h.alive && System.nanoTime() < deadline) Thread.sleep(50)
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(spec.logFile)), "UTF-8")
    assert(log.contains("marker=42"), log)
  }

  test("CommandWrapped prefixes the argv (env(1) as the ssh stand-in)") {
    val dir = tmp()
    val spec = HostProvider.LaunchSpec(
      command = Seq("/bin/sh", "-c", "echo wrapped-ran"),
      workDir = dir, env = Map.empty, logFile = s"$dir/out.log")
    val h = HostProvider.CommandWrapped(Seq("/usr/bin/env"), "env-wrap")
      .launch(spec)
    val deadline = System.nanoTime() + 10e9.toLong
    while (h.alive && System.nanoTime() < deadline) Thread.sleep(50)
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(spec.logFile)), "UTF-8")
    assert(log.contains("wrapped-ran"), log)
  }

  test("kill9 takes the process and its descendants (dead-VM semantics)") {
    val dir = tmp()
    // parent forks a child sleep; both must die with kill9
    val spec = HostProvider.LaunchSpec(
      command = Seq("/bin/sh", "-c", "sleep 300 & wait"),
      workDir = dir, env = Map.empty, logFile = s"$dir/out.log")
    val h = HostProvider.LocalProcess.launch(spec)
    assert(h.alive)
    h.kill9()
    val deadline = System.nanoTime() + 10e9.toLong
    while (h.alive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!h.alive)
  }
}
