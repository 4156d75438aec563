package graft.sources.mergetree

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar batch assembly for the MergeTree scan (VERDICT r9 task #1):
  * the reader factory decodes a split's columns and hands them here to
  * become an [[ColumnarBatch]] of primitive-typed
  * [[OnHeapColumnVector]]s, instead of the previous per-row boxed
  * `GenericInternalRow` emission.
  *
  * Why it matters at scale: the reference's entire published baseline is
  * MergeTree scans (`README.md:58`: 2.22 B rows/s on `sum(commits) GROUP
  * BY event_type`), and a row-at-a-time boxed reader makes every
  * downstream operator pay allocation + unboxing per row. With a
  * columnar scan, Spark plans the `ColumnarToRow` transition inside
  * whole-stage codegen and reads primitive vector slots — the same
  * asymmetry the vectorized parquet reader enjoys.
  *
  * Coverage: every Spark type [[graft.types.ChSchemaParser]] produces
  * for the supported MergeTree subset — atomic numerics, Boolean,
  * String, Date, Timestamp, and single-level Arrays of those (via the
  * vector's child-array storage). A projection containing anything else
  * falls back to the row reader, decided scan-wide so Spark never sees
  * mixed row/columnar partitions.
  */
private[mergetree] object ColumnarFill {

  def supported(schema: StructType): Boolean =
    schema.fields.forall { f =>
      f.dataType match {
        case ArrayType(et, _) => atomic(et)
        case dt => atomic(dt)
      }
    }

  private def atomic(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** Build one batch from per-column decoded values (the Catalyst
    * representations [[ColumnCodec]] produces: boxed primitives,
    * UTF8String, ArrayData). The boxed intermediate is paid once here;
    * everything downstream reads primitive slots. (Plain scalar
    * columns skip this path entirely — [[ColumnCodec.scalarsInto]]
    * decodes straight into the vector, no boxing at all.) */
  def batch(schema: StructType, cols: Array[Array[Any]], n: Int): ColumnarBatch = {
    val vectors = schema.fields.zipWithIndex.map { case (f, i) =>
      val v = new OnHeapColumnVector(n, f.dataType)
      fillColumn(v, f.dataType, cols(i), n)
      v
    }
    new ColumnarBatch(vectors.toArray[ColumnVector], n)
  }

  def fillColumn(
      v: OnHeapColumnVector, dt: DataType, vals: Array[Any], n: Int): Unit =
    dt match {
      case ArrayType(et, _) => fillArray(v, et, vals, n)
      case other => fillAtomic(v, other, vals, n)
    }

  private def fillAtomic(
      v: OnHeapColumnVector, dt: DataType, vals: Array[Any], n: Int): Unit = {
    var i = 0
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putLong(i, x.asInstanceOf[Long])
          i += 1
        }
      case IntegerType | DateType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putInt(i, x.asInstanceOf[Int])
          i += 1
        }
      case ShortType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putShort(i, x.asInstanceOf[Short])
          i += 1
        }
      case ByteType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putByte(i, x.asInstanceOf[Byte])
          i += 1
        }
      case DoubleType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putDouble(i, x.asInstanceOf[Double])
          i += 1
        }
      case FloatType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putFloat(i, x.asInstanceOf[Float])
          i += 1
        }
      case BooleanType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i) else v.putBoolean(i, x.asInstanceOf[Boolean])
          i += 1
        }
      case StringType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i)
          else {
            val b = x.asInstanceOf[UTF8String].getBytes
            v.putByteArray(i, b, 0, b.length)
          }
          i += 1
        }
      case dt: org.apache.spark.sql.types.DecimalType =>
        while (i < n) {
          val x = vals(i)
          if (x == null) v.putNull(i)
          else v.putDecimal(i,
            x.asInstanceOf[org.apache.spark.sql.types.Decimal], dt.precision)
          i += 1
        }
      case other =>
        throw new IllegalStateException(s"non-columnar atomic type $other")
    }
  }

  /** Single-level arrays: elements flatten into the vector's child
    * storage, per-row (offset, length) recorded via putArray. Array
    * values in this subset are never null (Nullable(Array) refuses at
    * parse), but the guard keeps the fill total. */
  private def fillArray(
      v: OnHeapColumnVector, et: DataType, vals: Array[Any], n: Int): Unit = {
    var total = 0
    var i = 0
    while (i < n) {
      val x = vals(i)
      if (x != null) total += x.asInstanceOf[ArrayData].numElements()
      i += 1
    }
    val child = v.arrayData()
    child.reserve(total)
    var off = 0
    i = 0
    while (i < n) {
      vals(i) match {
        case null => v.putNull(i)
        case a: ArrayData =>
          val len = a.numElements()
          var j = 0
          while (j < len) {
            putChild(child, et, off + j, a.get(j, et))
            j += 1
          }
          v.putArray(i, off, len)
          off += len
        case other =>
          throw new IllegalStateException(s"array column value: $other")
      }
      i += 1
    }
  }

  private def putChild(
      child: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      et: DataType, idx: Int, x: Any): Unit =
    if (x == null) child.putNull(idx)
    else et match {
      case LongType | TimestampType | TimestampNTZType =>
        child.putLong(idx, x.asInstanceOf[Long])
      case IntegerType | DateType => child.putInt(idx, x.asInstanceOf[Int])
      case ShortType => child.putShort(idx, x.asInstanceOf[Short])
      case ByteType => child.putByte(idx, x.asInstanceOf[Byte])
      case DoubleType => child.putDouble(idx, x.asInstanceOf[Double])
      case FloatType => child.putFloat(idx, x.asInstanceOf[Float])
      case BooleanType => child.putBoolean(idx, x.asInstanceOf[Boolean])
      case StringType =>
        val b = x.asInstanceOf[UTF8String].getBytes
        child.putByteArray(idx, b, 0, b.length)
      case other =>
        throw new IllegalStateException(s"non-columnar array element type $other")
    }
}
