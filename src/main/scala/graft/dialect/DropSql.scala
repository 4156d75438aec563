package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CH `DROP TABLE` / `DETACH TABLE` — the missing half of the
  * ATTACH/CTAS lifecycle (a user who can create and attach tables needs
  * to remove them without restarting the session).
  *
  *   - `DETACH TABLE [IF EXISTS] t` — remove the session view and the
  *     catalog entry; the DATA stays wherever it lives, and the result
  *     row reports the endpoint so an ATTACH brings the table back
  *     (CH's contract): ATTACHed tables replay their original
  *     statement, CTAS-created ones ATTACH against the reported
  *     warehouse path (parquet dirs and part trees both route).
  *   - `DROP TABLE [IF EXISTS] t [SYNC]` — detach AND, for tables THIS
  *     ENGINE materialized (CTAS into the warehouse — parquet or
  *     MergeTree trees), delete the storage and any registered
  *     projections over it. An ATTACHed external endpoint is never
  *     deleted — dropping a web-disk table in CH removes metadata only
  *     too (the static files are read-only); `SYNC` is accepted and
  *     meaningless here (deletion is already synchronous).
  *
  * A plain session view (no catalog entry) drops/detaches its view
  * only — the engine doesn't own its storage.
  */
object DropSql {

  private val DropRe =
    """(?is)^\s*DROP\s+(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([\w.`"]+)\s*(?:SYNC)?\s*$""".r
  private val DetachRe =
    """(?is)^\s*DETACH\s+(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([\w.`"]+)\s*$""".r

  def isDrop(sql: String): Boolean =
    DropRe.matches(sql) || DetachRe.matches(sql)

  def run(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val (kw, ifExists, rawName, drop) = sql match {
      case DropRe(k, ie, n) => (k.toUpperCase, ie != null, n, true)
      case DetachRe(k, ie, n) => (k.toUpperCase, ie != null, n, false)
      case other => throw new IllegalArgumentException(
        s"unparseable DROP/DETACH statement: $other")
    }
    val name = ProjectionSql.clean(rawName)
    // CH refuses the kind mismatch ('is a view' / 'is not a view'):
    // DROP VIEW on a table must not delete a CTAS table's owned
    // storage, and DROP TABLE on a view must not remove a view
    // (advisor r12). MATERIALIZED VIEWs accept both spellings, as CH
    // does. IF EXISTS does not soften a mismatch — the object exists,
    // it is just the wrong kind.
    val isView = graft.core.MatViews.lookupPlain(name).isDefined
    val isTable = graft.core.Catalog.all.exists(_.name.equalsIgnoreCase(name))
    val verb = if (drop) "DROP" else "DETACH"
    if (kw == "VIEW" && isTable && !isView)
      throw new IllegalArgumentException(
        s"$verb VIEW $name: '$name' is not a view (it is a table — use " +
          s"$verb TABLE)")
    if (kw == "TABLE" && isView)
      throw new IllegalArgumentException(
        s"$verb TABLE $name: '$name' is a view (use $verb VIEW)")
    // a MATERIALIZED VIEW drops/detaches its trigger registration; the
    // ENGINE form's backing table (`<mv>__inner`) is CTAS-owned and
    // falls with a DROP (CH drops its `.inner` table too) but survives
    // a DETACH
    // a plain CREATE VIEW drops its registry text alongside the session
    // view (the fall-through below removes the view itself)
    graft.core.MatViews.dropPlain(name)
    graft.core.MatViews.drop(name).foreach { mv =>
      if (spark.catalog.tableExists(mv.name))
        spark.catalog.dropTempView(mv.name)
      if (drop && mv.inner)
        run(spark, s"DROP TABLE IF EXISTS ${mv.target}")
      return Seq((mv.name, if (drop) "dropped" else "detached", mv.target))
        .toDF("table", "action", "endpoint")
    }
    // Spark temp views are case-insensitive while the catalog map is
    // exact — resolve the canonical entry name first, or a
    // case-variant DROP removes the view but orphans the entry and
    // its CTAS storage (review finding)
    val canonical = graft.core.Catalog.all
      .find(_.name.equalsIgnoreCase(name)).map(_.name).getOrElse(name)
    val entry = graft.core.Catalog.detach(canonical)
    val hadView = spark.catalog.tableExists(name)
    if (hadView) spark.catalog.dropTempView(name)
    if (entry.isEmpty && !hadView) {
      if (ifExists)
        return Seq((name, "not_found", "")).toDF("table", "action", "endpoint")
      throw new IllegalArgumentException(
        s"DROP/DETACH TABLE $name: no such table or session view")
    }
    // the result always names the storage the table pointed at —
    // DETACH of a CTAS-created table has no ATTACH statement to
    // replay, so the reported endpoint is what lets the user
    // re-register it (ATTACH works against both parquet dirs and
    // MergeTree trees) instead of orphaning the data (review finding)
    val endpoint = entry.flatMap(_.endpoint).getOrElse("")
    val (action, reportEndpoint) =
      if (!drop) ("detached", endpoint)
      else entry match {
        // CTAS-materialized (ownsStorage: this engine wrote the
        // warehouse path): DROP owns the storage — delete it and any
        // projections registered over either identity of it
        case Some(t) if t.ownsStorage && t.endpoint.isDefined =>
          val path = t.endpoint.get
          // another live catalog entry (a later ATTACH of the same
          // tree) may still alias this storage — deleting it would
          // leave that entry pointing at nothing, so DROP degrades to
          // detach-only and says so (advisor r11). Path-identity
          // compare, `file:` renderings normalized, same rule as
          // Catalog.partitionByForEndpoint.
          def norm(p: String): String =
            try graft.sources.mergetree.MergeTree.localPath(p)
            catch { case _: Exception => p }
          val aliased = graft.core.Catalog.all.exists(o =>
            o.name != t.name && o.endpoint.exists(e => norm(e) == norm(path)))
          if (aliased)
            return Seq((name, "detached_storage_aliased", path))
              .toDF("table", "action", "endpoint")
          val keys = Seq(
            graft.plans.AggProjections.sourceKey(spark, path),
            graft.plans.AggProjections.mergeTreeKey(path))
          keys.foreach { k =>
            graft.plans.AggProjections.lookup(k).map(_.name)
              .foreach(graft.plans.AggProjections.dropByKey(spark, k, _))
          }
          val hp = new org.apache.hadoop.fs.Path(path)
          val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
          if (fs.exists(hp)) fs.delete(hp, true)
          ("dropped", "") // storage deleted — nothing left to point at
        // ATTACHed external endpoint: metadata removed, data untouched
        // (CH's own posture for read-only disks); plain views likewise
        case _ => ("dropped", endpoint)
      }
    Seq((name, action, reportEndpoint)).toDF("table", "action", "endpoint")
  }
}
