package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types.DataType

/** HLL++ register state for the DictAgg kernel's `uniq()` op (r18,
  * VERDICT r17 stretch #8): per-slot register words driven by Spark's
  * OWN [[HyperLogLogPlusPlusHelper]] — the same xxHash64(seed 42),
  * the same dense 6-bit registers, the same bias correction — so the
  * kernel's estimate is BIT-IDENTICAL to the native
  * `HyperLogLogPlusPlus` aggregate it replaces, and the dialect's
  * `uniq()` keeps CH's documented ~2% accuracy class (the rewrite
  * only engages at the default rsd 0.05).
  *
  * The helper reads/writes registers through an [[InternalRow]]; the
  * kernel stores one bare `Array[Long]` per (spec, slot) and adapts it
  * with [[HllRegisters.LongBufRow]] — no boxing, no per-slot row
  * objects. */
private[graft] object HllRegisters {

  /** The dialect `uniq()` spelling's rsd (Spark's HLL++ default). */
  val Rsd = 0.05

  /** One precision's register algebra (r19 — VERDICT r18 stretch #8
    * generalizes the kernel past the default rsd so the dialect's
    * `uniqCombined`/`uniqCombined64` precision class rides it too).
    * Instances are process-local (see [[forRsd]]); specs ship the
    * bare `Double` and executors re-resolve. */
  final class Hll private[HllRegisters] (val rsd: Double) {
    val helper = new HyperLogLogPlusPlusHelper(rsd)
    val numWords: Int = helper.numWords

    def update(regs: Array[Long], value: Any, dt: DataType): Unit =
      helper.update(new LongBufRow(regs), 0, value, dt)

    def merge(into: Array[Long], from: Array[Long]): Unit =
      helper.merge(new LongBufRow(into), new LongBufRow(from), 0, 0)

    def cardinality(regs: Array[Long]): Long =
      helper.query(new LongBufRow(regs), 0)

    def serialize(regs: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(regs.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(regs)
      bb.array()
    }

    def deserialize(blob: Array[Byte]): Array[Long] = {
      require(blob.length == numWords * 8,
        s"HLL blob of ${blob.length} bytes (expected ${numWords * 8})")
      val out = new Array[Long](numWords)
      java.nio.ByteBuffer.wrap(blob)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
      out
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Double, Hll]()

  /** The helper for one rsd, cached per-process (helper construction
    * allocates the register window math once; executors hit this on
    * first batch, driver on merge). */
  def forRsd(rsd: Double): Hll =
    cache.computeIfAbsent(java.lang.Double.valueOf(rsd), d => new Hll(d))

  val default: Hll = forRsd(Rsd)

  /** Spark's own precision formula (`HyperLogLogPlusPlusHelper`). */
  def precisionOf(rsd: Double): Int =
    math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt

  /** The kernel engages where the helper's bias-correction tables are
    * defined: HLL++ paper appendix data covers p 4..18. Outside that
    * the native plan (which has the same bound) stands. */
  def supported(rsd: Double): Boolean = {
    val p = precisionOf(rsd)
    p >= 4 && p <= 18
  }

  /** The rsd whose helper lands exactly at HLL precision `p` (the
    * dialect's parametric `uniqCombined(p)(x)` spelling). The 1e-9
    * nudge keeps `ceil` from tipping to p+1 on floating error. */
  def rsdForPrecision(p: Int): Double =
    1.106d / math.pow(2.0d, p / 2.0d) * (1 + 1e-9)

  /** A bare long array as the register window the HLL helper expects —
    * only getLong/setLong are ever called. */
  private[plans] final class LongBufRow(arr: Array[Long]) extends InternalRow {
    override def numFields: Int = arr.length
    override def getLong(i: Int): Long = arr(i)
    override def setLong(i: Int, v: Long): Unit = arr(i) = v
    override def update(i: Int, v: Any): Unit =
      arr(i) = v.asInstanceOf[java.lang.Long].longValue()
    override def setNullAt(i: Int): Unit =
      throw new UnsupportedOperationException("HLL registers are never null")
    override def copy(): InternalRow = new LongBufRow(arr.clone())
    override def isNullAt(i: Int): Boolean = false
    private def nope = throw new UnsupportedOperationException(
      "HLL register window carries longs only")
    override def getBoolean(i: Int): Boolean = nope
    override def getByte(i: Int): Byte = nope
    override def getShort(i: Int): Short = nope
    override def getInt(i: Int): Int = nope
    override def getFloat(i: Int): Float = nope
    override def getDouble(i: Int): Double = nope
    override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal = nope
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String = nope
    override def getBinary(i: Int): Array[Byte] = nope
    override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal = nope
    override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal = nope
    override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval = nope
    override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal = nope
    override def getStruct(i: Int, n: Int): InternalRow = nope
    override def getArray(i: Int): org.apache.spark.sql.catalyst.util.ArrayData = nope
    override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData = nope
    override def get(i: Int, dt: DataType): AnyRef = nope
  }
}
