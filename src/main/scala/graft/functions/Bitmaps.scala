package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64Bitmap

/** CH's bitmap function family (`groupBitmap`, `bitmapBuild`,
  * `bitmapAnd(…)Cardinality`, …) over Roaring64 — the segment/funnel
  * analytics surface (reference: the whole function namespace is
  * delegated CH surface, `workflow_query_executor.go:313`).
  *
  * Bitmap VALUES travel as `binary` columns in the portable Roaring64
  * serialization (the same codec [[graft.plans.BitmapDistinct]] uses
  * for its distinct-count partials), so states can be written to
  * parquet, shuffled, and merged later — the `-State`/`-Merge` flow CH
  * users run for incremental audience counts. The aggregates are
  * native `TypedImperativeAggregate`s (ObjectHashAggregate, map-side
  * partials, no UDFs); the scalar ops are eval'd expressions over the
  * blobs (never a hot scan path — they run on already-aggregated
  * rows).
  *
  * 100 TB posture: one bitmap per group rides partial aggregation, so
  * the shuffle carries compressed Roaring blobs, not raw ids — the
  * standard big-segment pattern. Values are treated as unsigned-ish
  * longs (CH's UInt domain); negatives are accepted and ordered by
  * Roaring64's unsigned comparison. */
object Bitmaps {

  def serialize(bm: Roaring64Bitmap): Array[Byte] =
    graft.plans.BitmapDistinct.serialize(bm)

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    graft.plans.BitmapDistinct.deserialize(bytes)

  private[functions] def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"bitmap functions take integer values, got ${other.getClass.getSimpleName}")
  }
}

/** `groupBitmap(x)` / `groupBitmapState(x)` / `groupBitmapMerge(blob)`:
  * build (or merge) a Roaring bitmap of the group's values.
  * `mode` 0 = values in, cardinality out; 1 = values in, blob out
  * (-State); 2 = blobs in, cardinality out (-Merge); 3 = blobs in,
  * blob out (-MergeState). */
case class GroupBitmapAgg(
    child: Expression,
    mode: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Roaring64Bitmap]
    with UnaryLike[Expression] {

  private def valuesIn: Boolean = mode == 0 || mode == 1
  private def blobOut: Boolean = mode == 1 || mode == 3

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) {
      if (valuesIn) buffer.addLong(Bitmaps.toLong(v))
      else buffer.or(Bitmaps.deserialize(v.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def merge(buffer: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64Bitmap): Any =
    if (blobOut) Bitmaps.serialize(buffer) else buffer.getLongCardinality

  override def serialize(buffer: Roaring64Bitmap): Array[Byte] =
    Bitmaps.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): Roaring64Bitmap =
    Bitmaps.deserialize(storageFormat)

  override def dataType: DataType = if (blobOut) BinaryType else LongType
  override def nullable: Boolean = false
  override def prettyName: String = mode match {
    case 0 => "groupBitmap"
    case 1 => "groupBitmapState"
    case 2 => "groupBitmapMerge"
    case _ => "groupBitmapMergeState"
  }
  override def withNewMutableAggBufferOffset(n: Int): GroupBitmapAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GroupBitmapAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): GroupBitmapAgg =
    copy(child = newChild)
}

/** `bitmapBuild(array)` → blob. */
case class BitmapBuild(child: Expression)
    extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val bm = new Roaring64Bitmap()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = et match {
          case LongType => arr.getLong(i)
          case IntegerType => arr.getInt(i).toLong
          case ShortType => arr.getShort(i).toLong
          case ByteType => arr.getByte(i).toLong
          case other => throw new IllegalArgumentException(
            s"bitmapBuild takes integer arrays, got $other")
        }
        bm.addLong(x)
      }
      i += 1
    }
    Bitmaps.serialize(bm)
  }
  override def prettyName: String = "bitmapBuild"
  override protected def withNewChildInternal(c: Expression): BitmapBuild = copy(child = c)
}

/** Unary blob ops: 0=cardinality, 1=min, 2=max, 3=toArray. */
case class BitmapUnary(child: Expression, op: Int)
    extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType =
    if (op == 3) ArrayType(LongType, containsNull = false) else LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bm = Bitmaps.deserialize(v.asInstanceOf[Array[Byte]])
    op match {
      case 0 => bm.getLongCardinality
      case 1 => if (bm.isEmpty) null else bm.first()
      case 2 => if (bm.isEmpty) null else bm.last()
      case _ => new GenericArrayData(bm.toArray)
    }
  }
  override def prettyName: String = op match {
    case 0 => "bitmapCardinality"
    case 1 => "bitmapMin"
    case 2 => "bitmapMax"
    case _ => "bitmapToArray"
  }
  override protected def withNewChildInternal(c: Expression): BitmapUnary = copy(child = c)
}

/** Binary blob ops. `op`: 0=and 1=or 2=xor 3=andnot; `cardinality`
  * evaluates to the result's count instead of the blob. */
case class BitmapBinary(left: Expression, right: Expression, op: Int,
    cardinality: Boolean)
    extends Expression with BinaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = if (cardinality) LongType else BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val a = Bitmaps.deserialize(l.asInstanceOf[Array[Byte]])
    val b = Bitmaps.deserialize(r.asInstanceOf[Array[Byte]])
    op match {
      case 0 => a.and(b)
      case 1 => a.or(b)
      case 2 => a.xor(b)
      case _ => a.andNot(b)
    }
    if (cardinality) a.getLongCardinality else Bitmaps.serialize(a)
  }
  override def prettyName: String = {
    val base = op match {
      case 0 => "bitmapAnd"; case 1 => "bitmapOr"
      case 2 => "bitmapXor"; case _ => "bitmapAndnot"
    }
    if (cardinality) base + "Cardinality" else base
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BitmapBinary = copy(left = l, right = r)
}

/** `groupBitmapAnd/Or/Xor(blob)` (+`-State`): combine already-built
  * bitmap states across rows — CH's cross-segment rollup aggregates
  * (AND = ids present in EVERY segment, XOR = ids in an odd number).
  * AND's identity is the universe, so the accumulator tracks whether a
  * blob has been seen yet instead of starting from the empty bitmap
  * (empty is OR/XOR's identity but AND's absorbing element); the
  * partial serialization carries that seen flag. NULL blobs are
  * skipped like CH skips NULL aggregate inputs. `op` 0=and 1=or 2=xor;
  * `blobOut` is the `-State` spelling. */
case class GroupBitmapCombineAgg(
    child: Expression,
    op: Int,
    blobOut: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GroupBitmapCombineAgg.Acc]
    with UnaryLike[Expression] {
  import GroupBitmapCombineAgg.Acc

  override def createAggregationBuffer(): Acc = new Acc(new Roaring64Bitmap(), false)

  private def combine(into: Roaring64Bitmap, from: Roaring64Bitmap): Unit =
    op match {
      case 0 => into.and(from)
      case 1 => into.or(from)
      case _ => into.xor(from)
    }

  override def update(buffer: Acc, input: InternalRow): Acc = {
    val v = child.eval(input)
    if (v != null) {
      val bm = Bitmaps.deserialize(v.asInstanceOf[Array[Byte]])
      if (!buffer.seen) { buffer.bm = bm; buffer.seen = true }
      else combine(buffer.bm, bm)
    }
    buffer
  }

  override def merge(buffer: Acc, other: Acc): Acc = {
    if (other.seen) {
      if (!buffer.seen) { buffer.bm = other.bm; buffer.seen = true }
      else combine(buffer.bm, other.bm)
    }
    buffer
  }

  override def eval(buffer: Acc): Any =
    if (blobOut) Bitmaps.serialize(buffer.bm)
    else buffer.bm.getLongCardinality

  override def serialize(buffer: Acc): Array[Byte] = {
    val blob = Bitmaps.serialize(buffer.bm)
    val out = new Array[Byte](blob.length + 1)
    out(0) = if (buffer.seen) 1 else 0
    System.arraycopy(blob, 0, out, 1, blob.length)
    out
  }
  override def deserialize(storageFormat: Array[Byte]): Acc =
    new Acc(
      Bitmaps.deserialize(java.util.Arrays.copyOfRange(
        storageFormat, 1, storageFormat.length)),
      storageFormat(0) == 1)

  override def dataType: DataType = if (blobOut) BinaryType else LongType
  override def nullable: Boolean = false
  override def prettyName: String = {
    val base = op match {
      case 0 => "groupBitmapAnd"; case 1 => "groupBitmapOr"
      case _ => "groupBitmapXor"
    }
    if (blobOut) base + "State" else base
  }
  override def withNewMutableAggBufferOffset(n: Int): GroupBitmapCombineAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GroupBitmapCombineAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): GroupBitmapCombineAgg =
    copy(child = c)
}

object GroupBitmapCombineAgg {
  /** Mutable combine state: the bitmap plus whether any input blob has
    * been folded in yet (AND's identity problem — see the class doc). */
  final class Acc(var bm: Roaring64Bitmap, var seen: Boolean)
}

/** The CH subset trio over a blob — all honoring UInt64 (unsigned)
  * ordering, which is Roaring64's own iteration order:
  * `bitmapSubsetInRange(bm, start, end)` keeps values in [start, end);
  * `bitmapSubsetLimit(bm, start, card)` keeps the first `card` values
  * ≥ start; `subBitmap(bm, offset, card)` skips `offset` values and
  * keeps the next `card` (rank-addressed, CH ≥ 22). `kind` 0/1/2 in
  * that order. Blobs on aggregated rows only — never a scan hot path. */
case class BitmapSubset(first: Expression, second: Expression,
    third: Expression, kind: Int)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val b = first.eval(input)
    val p1 = second.eval(input)
    val p2 = third.eval(input)
    if (b == null || p1 == null || p2 == null) return null
    val bm = Bitmaps.deserialize(b.asInstanceOf[Array[Byte]])
    val a = Bitmaps.toLong(p1)
    val c = Bitmaps.toLong(p2)
    val out = new Roaring64Bitmap()
    val it = bm.getLongIterator
    var taken = 0L
    var skipped = 0L
    var done = false
    while (it.hasNext && !done) {
      val v = it.next()
      kind match {
        case 0 => // [start, end) unsigned
          if (java.lang.Long.compareUnsigned(v, c) >= 0) done = true
          else if (java.lang.Long.compareUnsigned(v, a) >= 0) out.addLong(v)
        case 1 => // values >= start, up to card
          if (taken >= c) done = true
          else if (java.lang.Long.compareUnsigned(v, a) >= 0) {
            out.addLong(v); taken += 1
          }
        case _ => // rank window [offset, offset + card)
          if (taken >= c) done = true
          else if (skipped < a) skipped += 1
          else { out.addLong(v); taken += 1 }
      }
    }
    Bitmaps.serialize(out)
  }
  override def prettyName: String = kind match {
    case 0 => "bitmapSubsetInRange"
    case 1 => "bitmapSubsetLimit"
    case _ => "subBitmap"
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BitmapSubset =
    copy(first = cs(0), second = cs(1), third = cs(2))
}

/** `bitmapTransform(bm, from_arr, to_arr)`: values present in the
  * bitmap AND in `from` move to the pairwise `to` value; everything
  * else stays. CH applies the mapping on the ORIGINAL membership (a
  * value is "present" per the input bitmap, not the evolving one), so
  * membership is tested up front. */
case class BitmapTransform(first: Expression, second: Expression,
    third: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  private def longs(v: Any, dt: DataType): Array[Long] = {
    val arr = v.asInstanceOf[ArrayData]
    val et = dt.asInstanceOf[ArrayType].elementType
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = et match {
        case LongType => arr.getLong(i)
        case IntegerType => arr.getInt(i).toLong
        case ShortType => arr.getShort(i).toLong
        case ByteType => arr.getByte(i).toLong
        case other => throw new IllegalArgumentException(
          s"bitmapTransform takes integer arrays, got $other")
      }
      i += 1
    }
    out
  }
  override def eval(input: InternalRow): Any = {
    val b = first.eval(input)
    val f = second.eval(input)
    val t = third.eval(input)
    if (b == null || f == null || t == null) return null
    val bm = Bitmaps.deserialize(b.asInstanceOf[Array[Byte]])
    val from = longs(f, second.dataType)
    val to = longs(t, third.dataType)
    require(from.length == to.length,
      s"bitmapTransform arrays must align: ${from.length} vs ${to.length}")
    // membership on the ORIGINAL bitmap, then apply removes + adds
    val present = from.indices.filter(i => bm.contains(from(i)))
    present.foreach(i => bm.removeLong(from(i)))
    present.foreach(i => bm.addLong(to(i)))
    Bitmaps.serialize(bm)
  }
  override def prettyName: String = "bitmapTransform"
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BitmapTransform =
    copy(first = cs(0), second = cs(1), third = cs(2))
}

/** `bitmapContains(blob, value)`. */
case class BitmapContains(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    Bitmaps.deserialize(l.asInstanceOf[Array[Byte]]).contains(Bitmaps.toLong(r))
  }
  override def prettyName: String = "bitmapContains"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BitmapContains = copy(left = l, right = r)
}

/** `bitmapHasAny(a, b)` / `bitmapHasAll(a, b)` (all = b ⊆ a). */
case class BitmapHas(left: Expression, right: Expression, all: Boolean)
    extends Expression with BinaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val a = Bitmaps.deserialize(l.asInstanceOf[Array[Byte]])
    val b = Bitmaps.deserialize(r.asInstanceOf[Array[Byte]])
    if (all) { b.andNot(a); b.isEmpty }
    else { a.and(b); !a.isEmpty }
  }
  override def prettyName: String = if (all) "bitmapHasAll" else "bitmapHasAny"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BitmapHas = copy(left = l, right = r)
}
