package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-INTERNAL persisted intermediates (advisor r7:
  * tfidf/bm25/lexicalCosinePairs/crossCorpusDupPairs persisted frames
  * they never exposed, so repeated calls in a long-lived session
  * accumulated cache entries indefinitely). Every internal persist
  * routes through [[persist]]; a long-lived session (the service shell,
  * a notebook) calls [[releaseAll]] between pipeline runs to drop them
  * in one sweep.
  *
  * NOT tracked here: state frames an operator RETURNS to the caller
  * ([[Dedup.minHashState]]) — those are caller-owned handles, released
  * by the caller's own `unpersist()`; and persists that the operator
  * itself unpersists before returning ([[Dedup.componentLabels]]).
  */
object OpCache {

  private val tracked = scala.collection.mutable.Set.empty[DataFrame]

  /** Persist MEMORY_AND_DISK and remember the handle for [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += df
    df
  }

  /** Unpersist every tracked intermediate (non-blocking) and forget the
    * handles. Safe while queries over them run: Spark recomputes evicted
    * blocks from lineage. Per-frame failures are swallowed: a frame
    * whose originating SparkContext has STOPPED has no block manager to
    * release (unpersist NPEs on the dead driver endpoint) — r15 finding
    * from MultiJvmSmoke, where the doors' idle sweep hit state tracked
    * under an earlier, stopped session and failed the in-flight
    * request. Releasing a dead frame is a no-op, never an error. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () })
    tracked.clear()
  }

  def trackedCount: Int = synchronized(tracked.size)
}
