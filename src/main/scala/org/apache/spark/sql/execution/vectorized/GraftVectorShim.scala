package org.apache.spark.sql.execution.vectorized

/** Same-package accessor for [[WritableColumnVector]]'s protected
  * `dictionary` field — the graft columnar kernels use the parquet
  * dictionary DIRECTLY (hash or decode each distinct entry once per
  * column chunk instead of once per row). Spark exposes
  * `hasDictionary()` and `getDictionaryIds()` publicly but not the
  * dictionary itself; this shim is the smallest possible bridge (one
  * field read, no behavior).
  */
object GraftVectorShim {
  def dictionaryOf(v: WritableColumnVector): Dictionary = v.dictionary
}
