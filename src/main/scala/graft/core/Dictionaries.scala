package graft.core

import scala.collection.concurrent.TrieMap

/** CH dictionary registry — `CREATE DICTIONARY` declares a keyed
  * lookup over a source table; `dictGet`-family calls rewrite to
  * correlated scalar subqueries against that source (Catalyst turns
  * them into joins, broadcast when the dictionary is small — the
  * Spark-native rendition of CH's in-memory HASHED layout).
  *
  * Supported subset: a SINGLE key column (`PRIMARY KEY k`), attributes
  * with optional `DEFAULT <literal>`, and
  * `SOURCE(CLICKHOUSE(TABLE 'name'))` — the source is a session table
  * or view. LAYOUT(...) and LIFETIME(...) are accepted and recorded as
  * no-ops: Spark plans the lookup per query, so layout/refresh are not
  * this engine's concern (documented divergence). Other SOURCE kinds
  * refuse with guidance to ATTACH/CREATE the data as a table first. */
object Dictionaries {

  case class Attr(name: String, chType: String, default: Option[String])
  case class Dict(
      name: String,
      key: String,
      attrs: Seq[Attr],
      sourceTable: String,
      statement: String)

  private val dicts = TrieMap.empty[String, Dict]

  def register(d: Dict): Unit = dicts(d.name) = d
  def lookup(name: String): Option[Dict] =
    dicts.get(name).orElse(dicts.values.find(_.name.equalsIgnoreCase(name)))
  def drop(name: String): Option[Dict] =
    lookup(name).flatMap(d => dicts.remove(d.name))
  def all: Seq[Dict] = dicts.values.toSeq.sortBy(_.name)

  /** RENAME/EXCHANGE TABLE follow-through for dictionary sources. */
  def retarget(from: String, to: String): Unit =
    dicts.values.toSeq.foreach { d =>
      if (d.sourceTable.equalsIgnoreCase(from))
        dicts(d.name) = d.copy(sourceTable = to)
    }
}
