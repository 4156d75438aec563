package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward asof picks the latest right row at or before left time") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:30"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 50.0)).toDF("sym", "t", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),
      (1L, ts("2024-01-01 10:00:20"), 100.5),
      (1L, ts("2024-01-01 10:00:30"), 100.9), // equal-time: inclusive match
      (2L, ts("2024-01-01 10:00:15"), 49.0)). // AFTER the only trade → no match
      toDF("sym", "qt", "bid")

    val out = AsofJoin.asofBackward(trades, quotes, "sym", "t", "qt",
        rightPayload = Seq("qt", "bid"))
      .orderBy("sym", "t").collect()
    assert(out.length == 2) // sym 2 has no preceding quote → dropped (inner)
    assert(out(0).getAs[Double]("bid") == 99.0)
    assert(out(1).getAs[Double]("bid") == 100.9) // equal timestamp matches
  }

  test("left asof keeps unmatched rows with nulls") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:01"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 00:00:02"), "late")).toDF("k", "rt", "v")
    val out = AsofJoin.asofBackward(l, r, "k", "t", "rt", Seq("v"), inner = false)
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("v")))
  }

  test("tie-break picks the greatest right id among equal timestamps") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:01:00"))).toDF("k", "t")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:30"), 10L, "a"),
      (1L, ts("2024-01-01 00:00:30"), 20L, "b")).toDF("k", "rt", "rid", "v")
    val out = AsofJoin.asofBackward(l, r, "k", "t", "rt", Seq("rid", "v"),
      rightTieBreak = Some("rid")).collect()
    assert(out.head.getAs[String]("v") == "b")
  }

  test("plan is one keyed shuffle + window — no range or cartesian join") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:01"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "rt", "v")
    val plan = AsofJoin.asofBackward(l, r, "k", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }
}
