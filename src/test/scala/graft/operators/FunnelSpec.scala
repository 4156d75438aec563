package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def ev(rows: (Long, Long, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toSeq.toDF("uid", "t", "e")
      .select(col("uid"), col("t").cast("timestamp").as("ts"), col("e"))
  }

  private def funnel(df: org.apache.spark.sql.DataFrame, w: Long) =
    Funnel.windowFunnel(df, "uid", "ts", w,
        Seq(col("e") === "a", col("e") === "b", col("e") === "c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap

  test("windowFunnel completes a chain inside the window") {
    val lv = funnel(ev((1L, 0L, "a"), (1L, 5L, "b"), (1L, 9L, "c")), w = 10)
    assert(lv == Map(1L -> 3))
  }

  test("windowFunnel window measures from the chain start") {
    // c at t=11 is outside [0, 10] from the chain's a@0
    val lv = funnel(ev((1L, 0L, "a"), (1L, 5L, "b"), (1L, 11L, "c")), w = 10)
    assert(lv == Map(1L -> 2))
  }

  test("windowFunnel restarts on a later cond1 (latest start wins)") {
    // a@0 b@20 cannot chain (20 > 0+10), but a@15 b@20 c@24 can
    val lv = funnel(
      ev((1L, 0L, "a"), (1L, 15L, "a"), (1L, 20L, "b"), (1L, 24L, "c")), w = 10)
    assert(lv == Map(1L -> 3))
    // and a restart does NOT destroy an already-earned deeper chain
    val lv2 = funnel(
      ev((2L, 0L, "a"), (2L, 3L, "b"), (2L, 5L, "a"), (2L, 8L, "c")), w = 10)
    assert(lv2 == Map(2L -> 3)) // chain a@0 b@3 c@8
  }

  test("windowFunnel: out-of-order conditions do not chain") {
    // b@0 precedes every a (no level-1 chain to extend) and c@9 needs
    // level 2 first — only a@5 lands, so the chain stops at level 1
    val lv = funnel(ev((1L, 0L, "b"), (1L, 5L, "a"), (1L, 9L, "c")), w = 10)
    assert(lv == Map(1L -> 1))
  }

  test("windowFunnel same-timestamp events chain in condition order") {
    val lv = funnel(ev((1L, 5L, "a"), (1L, 5L, "b"), (1L, 5L, "c")), w = 10)
    assert(lv == Map(1L -> 3))
  }

  test("windowFunnel: matching no cond1 at all is level 0") {
    val lv = funnel(ev((1L, 0L, "b"), (1L, 1L, "c")), w = 10)
    assert(lv == Map(1L -> 0))
  }

  test("sequenceMatchOrdered is ordered existence, window-free") {
    val df = ev(
      (1L, 0L, "a"), (1L, 1000000L, "b"), (1L, 99999999L, "c"), // far apart → still matches
      (2L, 0L, "c"), (2L, 1L, "b"), (2L, 2L, "a")) // wrong order
    val m = Funnel.sequenceMatchOrdered(df, "uid", "ts",
        Seq(col("e") === "a", col("e") === "b", col("e") === "c"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(m == Map(1L -> true, 2L -> false))
  }

  test("retentionCounts gates later conditions on cond1") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "signup"), (1L, "click"),
      (2L, "signup"), (2L, "purchase"),
      (3L, "click"), (3L, "purchase") // no signup → contributes nothing
    ).toDF("uid", "e")
    val r = Funnel.retentionCounts(df, "uid",
        Seq(col("e") === "signup", col("e") === "click", col("e") === "purchase"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }
}
