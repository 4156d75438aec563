package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CH `KILL QUERY WHERE query_id = '<id>' [SYNC|ASYNC]` — the operator
  * verb over [[graft.service.Processes]] (system.processes / SHOW
  * PROCESSLIST name the victims). Result carries CH's columns
  * (kill_status, query_id, user, query); an absent id returns zero
  * rows, as CH does. Only the `query_id = '<literal>'` predicate is
  * supported — a broader WHERE over system.processes would kill by
  * pattern, which this driver-side registry has no need to guess at
  * (refused loudly). */
object KillSql {

  private val KillRe =
    ("""(?is)^\s*KILL\s+QUERY\s+WHERE\s+query_id\s*=\s*'([^']*)'""" +
      """\s*(SYNC|ASYNC)?\s*$""").r
  private val KillHeadRe = """(?is)^\s*KILL\s+QUERY\b.*$""".r

  def isKill(sql: String): Boolean = KillHeadRe.matches(sql)

  def run(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    sql match {
      case KillRe(id, mode) =>
        val sync = mode == null || mode.equalsIgnoreCase("SYNC") // CH default: SYNC
        val victim =
          if (sync) graft.service.Processes.killSync(id)
          else graft.service.Processes.kill(id)
        victim.map(p =>
            (if (sync) "finished" else "waiting", p.queryId, p.user, p.query))
          .toSeq
          .toDF("kill_status", "query_id", "user", "query")
      case other => throw new IllegalArgumentException(
        "KILL QUERY supports WHERE query_id = '<id>' [SYNC|ASYNC] — " +
          s"got: ${other.take(120)}")
    }
  }
}
