package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("weightedQuantile: nearest-rank over the weighted multiset, hand-computed") {
    val spark2 = spark
    import spark2.implicits._
    // group g: values 1(w3), 2(w1), 3(w1) → total 5, median rank 2.5 →
    // value 1 (cumw 3 ≥ 2.5); group h: 10(w1), 20(w1) → 10 at q=0.5,
    // 20 at q=0.9
    val df = Seq(
      ("g", 1.0, 3L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("h", 10.0, 1L), ("h", 20.0, 1L)
    ).toDF("grp", "v", "w")
    def wq(q: Double) = Quantiles.weightedQuantile(df, Seq("grp"), "v", "w", q)
      .as[(String, Double)].collect().toMap
    assert(wq(0.5) == Map("g" -> 1.0, "h" -> 10.0))
    assert(wq(0.9) == Map("g" -> 3.0, "h" -> 20.0))
    assert(wq(1.0) == Map("g" -> 3.0, "h" -> 20.0))
    // heavy weight dominates: raising one weight moves the median to it
    val heavy = Seq(("g", 1.0, 1L), ("g", 5.0, 10L)).toDF("grp", "v", "w")
    assert(Quantiles.weightedQuantile(heavy, Seq("grp"), "v", "w", 0.5)
      .as[(String, Double)].collect().toMap == Map("g" -> 5.0))
  }

  test("weightedQuantile: value ties accumulate deterministically; zero weights drop") {
    val spark2 = spark
    import spark2.implicits._
    // three tied rows of value 2 (total weight 3 of 6): threshold 3 is
    // crossed at the tie's run end regardless of intra-tie order
    val df = Seq(
      ("g", 1.0, 3L), ("g", 2.0, 1L), ("g", 2.0, 1L), ("g", 2.0, 1L)
    ).toDF("grp", "v", "w")
    assert(Quantiles.weightedQuantile(df, Seq("grp"), "v", "w", 0.5)
      .as[(String, Double)].collect().toMap == Map("g" -> 1.0))
    assert(Quantiles.weightedQuantile(df, Seq("grp"), "v", "w", 0.75)
      .as[(String, Double)].collect().toMap == Map("g" -> 2.0))
    // a zero-weight row cannot shift the boundary (CH ignores them)
    val withZero = df.union(Seq(("g", 0.5, 0L)).toDF("grp", "v", "w"))
    assert(Quantiles.weightedQuantile(withZero, Seq("grp"), "v", "w", 0.5)
      .as[(String, Double)].collect().toMap == Map("g" -> 1.0))
  }

  test("weightedQuantile: NULL values are skipped, their weights excluded (CH parity)") {
    val spark2 = spark
    import spark2.implicits._
    // NULLs sort first under asc — counting their weight (100) would
    // shift the threshold to the end of the run and return 3.0
    val df = Seq(
      ("g", Some(1.0), 3L), ("g", None, 100L), ("g", Some(2.0), 1L), ("g", Some(3.0), 1L)
    ).toDF("grp", "v", "w")
    assert(Quantiles.weightedQuantile(df, Seq("grp"), "v", "w", 0.5)
      .as[(String, Double)].collect().toMap == Map("g" -> 1.0))
    // a group that is ALL NULL disappears (no quantile to report)
    val allNull = Seq(("n", Option.empty[Double], 5L)).toDF("grp", "v", "w")
    assert(Quantiles.weightedQuantile(allNull, Seq("grp"), "v", "w", 0.5).count() == 0L)
  }
}
