package graft.tools

import org.apache.spark.sql.execution.vectorized.{Dictionary, OnHeapColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.plans.{BitmapDistinct, HashScan}

/** CPU microbench of the r19 dictionary lanes: runs
  * [[HashScan.partial]] / [[BitmapDistinct.partial]] over synthetic
  * in-memory ColumnarBatches (no IO, no scheduler) with the lane ON
  * and OFF — the per-row kernel cost isolated from this box's bimodal
  * IO windows. Shapes mimic the bench lineitem/orders columns.
  *
  * Run: Test/runMain graft.tools.DictKernelBench [rows] [iters]
  */
object DictKernelBench {

  private final class TestDict(longs: Array[Long], ints: Array[Int],
      doubles: Array[Double], bins: Array[Array[Byte]]) extends Dictionary {
    override def decodeToInt(id: Int): Int = ints(id)
    override def decodeToLong(id: Int): Long = longs(id)
    override def decodeToFloat(id: Int): Float = ints(id).toFloat
    override def decodeToDouble(id: Int): Double = doubles(id)
    override def decodeToBinary(id: Int): Array[Byte] = bins(id)
  }

  private def dict(card: Int): TestDict = new TestDict(
    Array.tabulate(card)(i => i * 7919L),
    Array.tabulate(card)(i => i * 13),
    Array.tabulate(card)(i => i * 0.37),
    Array.tabulate(card)(i => s"val-$i".getBytes("UTF-8")))

  /** A dictionary-coded vector of `n` rows cycling `card` ids. */
  private def dictVec(dt: DataType, n: Int, card: Int): OnHeapColumnVector = {
    val v = new OnHeapColumnVector(n, dt)
    val ids = v.reserveDictionaryIds(n)
    v.setDictionary(dict(card))
    var i = 0
    while (i < n) { ids.putInt(i, i % card); i += 1 }
    v
  }

  /** A plain (decoded) vector with the same values the dict vector
    * would decode to. */
  private def plainVec(dt: DataType, n: Int, card: Int): OnHeapColumnVector = {
    val v = new OnHeapColumnVector(n, dt)
    val d = dict(card)
    var i = 0
    dt match {
      case LongType => while (i < n) { v.putLong(i, d.decodeToLong(i % card)); i += 1 }
      case IntegerType | DateType => while (i < n) { v.putInt(i, d.decodeToInt(i % card)); i += 1 }
      case DoubleType => while (i < n) { v.putDouble(i, d.decodeToDouble(i % card)); i += 1 }
      case StringType => while (i < n) {
        val b = d.decodeToBinary(i % card); v.putByteArray(i, b, 0, b.length); i += 1 }
      case other => throw new IllegalArgumentException(other.toString)
    }
    v
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(1 << 20)
    val iters = args.lift(1).map(_.toInt).getOrElse(9)
    val batchRows = 16384
    val nBatches = rows / batchRows

    // lineitem-like: long, int, double, double, string(3), string(2),
    // date — dict-coded where the bench files are (9/11 columns there)
    val types: Array[DataType] = Array(LongType, IntegerType, DoubleType,
      DoubleType, StringType, StringType, DateType)
    val cards = Array(0 /*plain*/, 211, 50, 0 /*plain*/, 3, 2, 2526)

    def mkBatch(dictCoded: Boolean): ColumnarBatch = {
      val vecs: Array[ColumnVector] = types.zip(cards).map { case (dt, card) =>
        if (dictCoded && card > 0) dictVec(dt, batchRows, card)
        else plainVec(dt, batchRows, math.max(card, 1023))
      }
      val b = new ColumnarBatch(vecs)
      b.setNumRows(batchRows)
      b
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // ---- HashScan ----
    val spec = HashScan.HashSpec(types.indices.toArray,
      types.map(HashScan.typeTag), 1000000007L)
    def runHash(batch: ColumnarBatch): Unit = {
      val it = Iterator.fill(nBatches)(batch)
      HashScan.partial(it, Array(spec))
    }
    for (coded <- Seq(true, false)) {
      val batch = mkBatch(coded)
      for (lane <- Seq(true, false)) {
        HashScan.dictLaneEnabled = lane
        runHash(batch); runHash(batch) // warm
        val ts = (1 to iters).map(_ => ms(runHash(batch)))
        val nsRow = med(ts) * 1e6 / rows
        println(f"[dictkernel] hash coded=$coded lane=$lane med=${med(ts)}%.1f ms " +
          f"(${nsRow}%.2f ns/row) all=${ts.map(t => f"$t%.0f").mkString(",")}")
      }
    }
    HashScan.dictLaneEnabled = true

    // ---- BitmapDistinct (q3 shape: one long key, dense domain) ----
    val card = 15000
    val dense = Array(BitmapDistinct.DenseCol(0L, ((card * 7919L) / 64 + 1).toInt))
    def runBd(batch: ColumnarBatch): Unit = {
      val it = Iterator.fill(nBatches)(batch)
      BitmapDistinct.partial(it, Array(0), Array(true), dense)
    }
    for (coded <- Seq(true, false)) {
      val vec = if (coded) dictVec(LongType, batchRows, card)
        else plainVec(LongType, batchRows, card)
      val batch = new ColumnarBatch(Array[ColumnVector](vec))
      batch.setNumRows(batchRows)
      for (lane <- Seq(true, false)) {
        BitmapDistinct.dictLaneEnabled = lane
        runBd(batch); runBd(batch)
        val ts = (1 to iters).map(_ => ms(runBd(batch)))
        val nsRow = med(ts) * 1e6 / rows
        println(f"[dictkernel] distinct coded=$coded lane=$lane med=${med(ts)}%.1f ms " +
          f"(${nsRow}%.2f ns/row) all=${ts.map(t => f"$t%.0f").mkString(",")}")
      }
    }
    BitmapDistinct.dictLaneEnabled = true
  }
}
