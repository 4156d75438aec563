package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Backup-staged in-place directory replacement — the one crash-safety
  * protocol shared by table compaction, mutations, and projection
  * refresh (review finding: two hand-copies of this delicate dance had
  * already drifted). `write` materializes the replacement into a
  * sibling temp dir while the original stays readable; then the
  * original is staged aside, the replacement promoted, the backup
  * dropped — a failure at any step leaves either the original or the
  * backup intact, never neither. Ends with a file-status cache refresh
  * so the session never holds a listing of renamed-away files. */
object FsSwap {

  def replace(spark: SparkSession, target: String, tag: String)(
      write: Path => Unit): Unit = {
    val dst = new Path(target)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(dst.getParent, s".${dst.getName}.${tag}_tmp")
    fs.delete(tmp, true)
    write(tmp)
    val bak = new Path(dst.getParent, s".${dst.getName}.${tag}_bak")
    fs.delete(bak, true)
    require(fs.rename(dst, bak), s"$tag: could not stage $target aside")
    if (!fs.rename(tmp, dst)) {
      fs.rename(bak, dst) // restore; tmp still holds the replacement
      throw new IllegalStateException(
        s"$tag: promote failed for $target; original restored")
    }
    fs.delete(bak, true)
    spark.catalog.refreshByPath(target)
  }
}
