package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.service.Quotas

/** CH quota DDL (the access-entity subset this single-user engine
  * needs; reference analog: the quota machinery its delegated CH image
  * ships — the reference itself never sets quotas):
  *
  * {{{
  * CREATE [OR REPLACE] QUOTA [IF NOT EXISTS] q
  *   [KEYED BY user_name]
  *   FOR [RANDOMIZED] INTERVAL n {second|minute|hour|day|week}
  *   MAX queries = N [, errors = N] [, result_rows = N]
  *       [, read_rows = N] [, execution_time = N]
  *   [TO user[, …] | TO ALL]
  * DROP QUOTA [IF EXISTS] q
  * SHOW QUOTAS
  * }}}
  *
  * Enforcement lives in [[graft.service.Quotas]] (admission +
  * consumption around every QueryService execution); `system.quotas` /
  * `system.quota_usage` expose the registry. */
object QuotaSql {

  private val HeadRe =
    """(?is)^\s*(CREATE\s+(?:OR\s+REPLACE\s+)?QUOTA|DROP\s+QUOTA|SHOW\s+QUOTAS)\b.*$""".r

  def isQuota(sql: String): Boolean = HeadRe.matches(sql)

  private val CreateRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?QUOTA\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """`?([A-Za-z0-9_]+)`?\s*(?:KEYED\s+BY\s+user_name\s*)?""" +
      """FOR\s+(?:RANDOMIZED\s+)?INTERVAL\s+(\d+)\s+""" +
      """(second|minute|hour|day|week)s?\s+MAX\s+(.*?)""" +
      """(?:\s+TO\s+(.+?))?\s*;?\s*$""").r

  private val DropRe =
    """(?is)^\s*DROP\s+QUOTA\s+(IF\s+EXISTS\s+)?`?([A-Za-z0-9_]+)`?\s*;?\s*$""".r

  private val ShowRe = """(?is)^\s*SHOW\s+QUOTAS\s*;?\s*$""".r

  private val unitSec = Map(
    "second" -> 1L, "minute" -> 60L, "hour" -> 3600L,
    "day" -> 86400L, "week" -> 604800L)

  def run(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    sql match {
      case CreateRe(orReplace, ifNotExists, name, n, unit, maxList, toClause) =>
        var lim = Quotas.Limits()
        maxList.split(",").map(_.trim).filter(_.nonEmpty).foreach { item =>
          val kv = item.split("=", 2)
          require(kv.length == 2,
            s"CREATE QUOTA: malformed MAX entry '$item' (expected name = value)")
          val v = kv(1).trim
          kv(0).trim.toLowerCase match {
            case "queries" => lim = lim.copy(maxQueries = Some(v.toLong))
            case "errors" => lim = lim.copy(maxErrors = Some(v.toLong))
            case "result_rows" => lim = lim.copy(maxResultRows = Some(v.toLong))
            case "read_rows" => lim = lim.copy(maxReadRows = Some(v.toLong))
            case "execution_time" => lim = lim.copy(maxExecSec = Some(v.toDouble))
            case other => throw new IllegalArgumentException(
              s"CREATE QUOTA: unsupported MAX resource '$other' " +
                "(queries|errors|result_rows|read_rows|execution_time)")
          }
        }
        val users: Seq[String] = Option(toClause).map(_.trim) match {
          case None => Nil
          case Some(t) if t.equalsIgnoreCase("ALL") => Nil
          case Some(t) => t.split(",").map(_.trim.stripPrefix("`")
            .stripSuffix("`")).toSeq.filter(_.nonEmpty)
        }
        val created = Quotas.create(
          Quotas.Quota(name, n.toLong * unitSec(unit.toLowerCase), lim, users),
          orReplace = orReplace != null, ifNotExists = ifNotExists != null)
        Seq((name, if (created) "created" else "exists"))
          .toDF("quota", "status")
      case DropRe(ifExists, name) =>
        val dropped = Quotas.drop(name, ifExists = ifExists != null)
        Seq((name, if (dropped) "dropped" else "absent"))
          .toDF("quota", "status")
      case _ if ShowRe.matches(sql) =>
        Quotas.all.map(q => (q.name, q.intervalSec,
          if (q.users.isEmpty) "ALL" else q.users.mkString(",")))
          .toDF("name", "interval_seconds", "apply_to")
      case other => throw new IllegalArgumentException(
        "quota DDL supports CREATE [OR REPLACE] QUOTA [IF NOT EXISTS] name " +
          "[KEYED BY user_name] FOR [RANDOMIZED] INTERVAL n unit MAX " +
          "res = N[, …] [TO users|ALL] / DROP QUOTA [IF EXISTS] name / " +
          s"SHOW QUOTAS — got: ${other.take(120)}")
    }
  }
}
