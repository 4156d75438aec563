package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MapAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sumMap sums per key across rows, keys sorted, duplicates in one row sum") {
    val df = Seq(
      ("g1", Seq("a", "b"), Seq(1L, 10L)),
      ("g1", Seq("b", "a", "a"), Seq(5L, 2L, 3L)), // dup key in one row
      ("g2", Seq("z"), Seq(7L)))
      .toDF("g", "k", "v")
    val out = MapAgg.sumMap(df, Seq("g"), "k", "v")
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[Long](2)))
    assert(out(0) == (("g1", Seq("a", "b"), Seq(6L, 15L))))
    assert(out(1) == (("g2", Seq("z"), Seq(7L))))
  }

  test("sumMap keeps per-group state bounded by distinct keys (two hash aggs, no collect of rows)") {
    val df = Seq(("g", Seq("k"), Seq(1L))).toDF("g", "k", "v")
    val plan = MapAgg.sumMap(df, Seq("g"), "k", "v").queryExecution.executedPlan.toString
    // the row-level collect would show a single aggregate over raw maps;
    // the distributed shape has two HashAggregate pairs (per-key, then per-group)
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(plan).size >= 3, plan)
  }
}
