package graft.service

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Live-query registry — CH's `system.processes` / `SHOW PROCESSLIST`
  * / `KILL QUERY` surface (the operational other half of
  * [[Governance]]: a deadline bounds a query a priori, a kill stops
  * one an operator is looking at). Every door registers its query
  * around the governed collect under the SAME job group the collect
  * runs in, so one `cancelJobGroup` is the kill handle regardless of
  * door or deadline mode. */
object Processes {

  final case class Proc(
      queryId: String,
      query: String,
      user: String,
      door: String,
      startedMs: Long,
      jobGroup: String,
      session: SparkSession,
      killed: AtomicBoolean = new AtomicBoolean(false))

  private val procs =
    scala.collection.concurrent.TrieMap.empty[String, Proc]

  /** Registration with the cap derived from the proc's OWN session —
    * so no caller can skirt `max_concurrent_queries` by picking the
    * shorter name (review r15, twice: the first delegation passed None
    * and enforced nothing). */
  def register(p: Proc): Proc =
    registerBounded(p, graft.service.Governance.concurrencyLimit(p.session))

  /** Atomic check-then-register against `max_concurrent_queries`
    * (review r15: a separate check raced — two concurrent requests
    * both measured 0 running and both registered past a cap of 1).
    * One lock guards the measure and the insert; CH's
    * TOO_MANY_SIMULTANEOUS_QUERIES shape on refusal. */
  def registerBounded(p: Proc, maxConcurrent: Option[Long]): Proc =
    synchronized {
      maxConcurrent.filter(_ > 0).foreach { max =>
        if (procs.size >= max) throw new IllegalArgumentException(
          s"Too many simultaneous queries: ${procs.size} already running, " +
            s"maximum $max (max_concurrent_queries). " +
            "TOO_MANY_SIMULTANEOUS_QUERIES")
      }
      procs(p.queryId) = p
      p
    }

  def unregister(queryId: String): Unit = { procs.remove(queryId); () }

  def all: Seq[Proc] = procs.values.toSeq.sortBy(_.startedMs)

  /** Cancel the query's job group. Returns the entry if it was live.
    * The victim's collect fails with Spark's cancellation error —
    * CH's QUERY_WAS_CANCELLED analog — and its own finally
    * unregisters it. */
  def kill(queryId: String): Option[Proc] =
    procs.get(queryId).map { p =>
      p.killed.set(true)
      // AndFutureJobs: the victim may be between jobs (a driver-merge
      // overflow fallback submits a second job) — the kill must land on
      // whatever the per-query group submits next, too
      p.session.sparkContext.cancelJobGroupAndFutureJobs(p.jobGroup)
      p
    }

  /** SYNC kill: wait (bounded) for the victim to unregister. */
  def killSync(queryId: String, timeoutMs: Long = 15000): Option[Proc] =
    kill(queryId).map { p =>
      val deadline = System.currentTimeMillis() + timeoutMs
      while (procs.contains(queryId) && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      p
    }
}
