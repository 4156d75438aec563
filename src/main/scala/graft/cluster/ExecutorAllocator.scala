package graft.cluster

import org.apache.spark.sql.SparkSession

/** Elastic executor sizing — the Spark-native rendition of the
  * reference's control plane (SURVEY §2.7):
  *
  *   - O2 `SpawnNodes` (reference
  *     `temporal/workflow_query_executor.go:118-163`): N parallel VM
  *     creates → here, a request to the cluster manager for N
  *     executors (`requestTotalExecutors`); in `local[*]` mode the
  *     "fleet" is the fixed in-process thread pool, so ensure() is a
  *     bounded no-op.
  *   - O4 readiness barrier (`:192-217`, `:242-265`): DNS + Keeper-join
  *     SQL poll → here, waiting until the driver sees ≥ minReady
  *     registered executors via `statusTracker`. The Keeper subsystem
  *     itself has no equivalent: the Spark driver IS the coordinator
  *     (O5), so coordinator election disappears by construction.
  *   - partial-capacity tolerance (`:155-158`, lo.FilterMap over failed
  *     creates): waitReady returns the count actually available once
  *     minReady is met, rather than failing the query when fewer than
  *     requested arrive.
  *   - O8 teardown (`:70-80`): `release()` hands executors back
  *     (dynamic-allocation clusters reclaim them; local mode no-op).
  *
  * At 100 TB this object is the seam where a real cluster manager
  * (K8s/YARN/standalone with dynamic allocation) plugs in — the query
  * path above it never changes.
  */
class ExecutorAllocator(spark: SparkSession) {

  private def sc = spark.sparkContext

  /** True when there is no remote cluster manager to size. */
  def isLocal: Boolean = sc.isLocal

  /** Registered executor count as the driver sees it right now
    * (local mode reports the driver itself — one entry). */
  def registered: Int = {
    val infos = sc.statusTracker.getExecutorInfos
    if (isLocal) infos.length else (infos.length - 1).max(0) // minus driver
  }

  /** O2: ask the cluster manager for `n` total executors. Local mode:
    * no-op (capacity is the local[N] thread pool). Returns whether the
    * request was accepted. */
  def ensure(n: Int): Boolean =
    if (isLocal) true
    else sc.requestTotalExecutors(n, 0, Map.empty)

  /** O4: block until at least `minReady` executors are registered or
    * the timeout lapses; returns the number registered. Mirrors the
    * reference's 500 ms poll loop (`workflow_query_executor.go:242-265`)
    * and its partial-capacity semantics: meeting `minReady` is enough,
    * the full `requested` count is not required. */
  def waitReady(minReady: Int, timeoutMs: Long = 60000, pollMs: Long = 500): Int = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var n = registered
    while (n < minReady && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      n = registered
    }
    if (n < minReady)
      throw new IllegalStateException(
        s"readiness barrier: only $n of $minReady executors registered after ${timeoutMs}ms")
    n
  }

  /** O8: release capacity back to the cluster manager. Idempotent;
    * local mode no-op (mirrors the deferred DeleteNodes that always
    * runs, `workflow_query_executor.go:70-80`). */
  def release(): Unit =
    if (!isLocal) sc.requestTotalExecutors(0, 0, Map.empty)
}
