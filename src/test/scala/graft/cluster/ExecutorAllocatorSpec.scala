package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

class ExecutorAllocatorSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("local mode: ensure is accepted, registered ≥ 1, release no-ops") {
    val alloc = new ExecutorAllocator(spark)
    assert(alloc.isLocal)
    assert(alloc.ensure(6)) // O2: request tolerated in local mode
    assert(alloc.registered >= 1)
    alloc.release() // O8: idempotent, must not throw
    alloc.release()
  }

  test("readiness barrier returns once minReady is met (O4)") {
    val alloc = new ExecutorAllocator(spark)
    val n = alloc.waitReady(minReady = 1, timeoutMs = 5000)
    assert(n >= 1)
  }

  test("readiness barrier fails loudly when capacity cannot arrive") {
    val alloc = new ExecutorAllocator(spark)
    val e = intercept[IllegalStateException] {
      alloc.waitReady(minReady = 99, timeoutMs = 600, pollMs = 100)
    }
    assert(e.getMessage.contains("99"))
  }
}
