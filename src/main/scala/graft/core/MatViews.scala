package graft.core

import scala.collection.concurrent.TrieMap

/** Materialized-view registry — CH's INSERT-TRIGGER semantics: a
  * materialized view runs its SELECT over EACH INSERTED BATCH of its
  * source table and appends the result to its target table (never a
  * retroactive view over the source — CH's own model, including its
  * consequences: pre-existing rows are only captured by POPULATE /
  * an explicit backfill INSERT).
  *
  * The registry is JVM-global like [[Catalog]]'s table map, so views
  * survive across HTTP requests within a service lifetime.
  *
  * Trigger scope: statement INSERTs (`INSERT … SELECT`, `INSERT …
  * VALUES`) fire views; the streaming MergeTree sink appends parts
  * below the statement layer and does NOT — route a stream through a
  * `foreachBatch` INSERT when its views must fire (documented
  * limitation, mirroring CH's own Kafka-engine-to-MV wiring being an
  * explicit choice). */
object MatViews {

  /** `inner` marks the ENGINE-form view that owns its backing table
    * (`<name>__inner`) — DROP removes that table too, like CH drops
    * its `.inner.<uuid>` table. */
  case class MatView(
      name: String,
      source: String,
      target: String,
      select: String,
      inner: Boolean)

  private val views = TrieMap.empty[String, MatView]

  def register(v: MatView): Unit = views(v.name) = v
  def lookup(name: String): Option[MatView] =
    views.get(name).orElse(views.values.find(_.name.equalsIgnoreCase(name)))
  def drop(name: String): Option[MatView] =
    lookup(name).flatMap(v => views.remove(v.name))
  def all: Seq[MatView] = views.values.toSeq.sortBy(_.name)

  /** Views triggered by an insert into `table`. */
  def onSource(table: String): Seq[MatView] =
    views.values.filter(_.source.equalsIgnoreCase(table)).toSeq.sortBy(_.name)

  /** RENAME/EXCHANGE TABLE follow-through: re-point source/target
    * references so triggers keep firing after a table moves names.
    * (The view's SELECT text keeps the old spelling for SHOW CREATE;
    * the trigger substitutes by the SOURCE field, so renaming the
    * source also updates the substitution token via this hook.) */
  def retarget(from: String, to: String): Unit =
    views.values.toSeq.foreach { v =>
      val ns = if (v.source.equalsIgnoreCase(from)) to else v.source
      val nt = if (v.target.equalsIgnoreCase(from)) to else v.target
      if (ns != v.source || nt != v.target) {
        val sel =
          if (ns != v.source)
            v.select.replaceAll(
              "(?i)\\b(FROM|JOIN)\\s+" +
                java.util.regex.Pattern.quote(v.source) + "\\b",
              "$1 " + to)
          else v.select
        views(v.name) = v.copy(source = ns, target = nt, select = sel)
      }
    }

  // chained views (an MV whose target feeds another MV) cascade through
  // the same INSERT path; the depth cap turns an accidental cycle into
  // a loud error instead of a stack overflow
  private val depth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }

  def cascade[A](mvName: String)(f: => A): A = {
    val d = depth.get()
    require(d < 10,
      s"materialized-view cascade deeper than 10 at '$mvName' — " +
        "is there a cycle in the view graph?")
    depth.set(d + 1)
    try f finally depth.set(d)
  }

  // ---- plain (non-materialized) views ----
  // CH `CREATE VIEW v AS SELECT …`: a lazy named query. The session
  // temp view holds the LOGICAL PLAN (re-planned per query, so new
  // parts of an underlying MergeTree table stay visible); this
  // registry holds the original text for SHOW CREATE and
  // cross-request replay.

  private val plain = TrieMap.empty[String, String]

  def registerPlain(name: String, select: String): Unit = plain(name) = select
  def lookupPlain(name: String): Option[(String, String)] =
    plain.get(name).map((name, _)).orElse(
      plain.find { case (n, _) => n.equalsIgnoreCase(name) })
  def dropPlain(name: String): Option[String] =
    lookupPlain(name).flatMap { case (n, _) => plain.remove(n) }
  def allPlain: Seq[(String, String)] = plain.toSeq.sortBy(_._1)
}
