package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The aggregate-combinator grammar: composed spellings resolve without
  * individual registrations, statics and builtins always win, and
  * non-grammar names never match. */
class CombinatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def one(sql: String): Seq[Any] =
    ChSql.sql(spark, sql).collect().head.toSeq

  test("grammar parses composed spellings and rejects non-grammar names") {
    assert(Combinators.builderFor("sumArrayIf").isDefined)
    assert(Combinators.builderFor("avgArrayIf").isDefined)
    assert(Combinators.builderFor("sumDistinctIf").isDefined)
    assert(Combinators.builderFor("uniqExactArrayIf").isDefined)
    assert(Combinators.builderFor("countOrNull").isDefined)
    assert(Combinators.builderFor("maxArrayIfOrNull").isDefined)
    // bare bases are the static registry's business
    assert(Combinators.builderFor("sum").isEmpty)
    assert(Combinators.builderFor("uniqExact").isEmpty)
    // residue that is not a suffix chain never matches
    assert(Combinators.builderFor("summary").isEmpty)
    assert(Combinators.builderFor("countSubstrings").isEmpty)
    assert(Combinators.builderFor("minSampleSize").isEmpty)
    // Array/Merge only directly after the base
    assert(Combinators.builderFor("sumIfArray").isEmpty)
    assert(Combinators.builderFor("sumIfMerge").isEmpty)
    // -Distinct after a lifting combinator would dedupe per-row reduced
    // values, not the argument — refused rather than silently wrong
    assert(Combinators.builderFor("sumArrayDistinct").isEmpty)
    assert(Combinators.builderFor("countArrayDistinct").isEmpty)
    assert(Combinators.builderFor("sumForEachDistinct").isEmpty)
    assert(Combinators.builderFor("sumMapDistinctIf").isEmpty)
  }

  test("sumArrayIf / avgArrayIf / countArrayIf aggregate elements of matching rows") {
    val r = one(
      """SELECT sumArrayIf(a, c) AS s, avgArrayIf(a, c) AS a, countArrayIf(a, c) AS n
        |FROM VALUES (array(1L, 2L), true), (array(10L, 20L), false),
        |            (array(3L, 4L), true) AS t(a, c)""".stripMargin)
    assert(r == Seq(10L, 2.5d, 4L))
  }

  test("fractional arrays fold without an analysis error (typed zero)") {
    val r = one(
      "SELECT sumArrayIf(a, c) AS s FROM VALUES (array(1.5d, 2.5d), true) AS t(a, c)")
    assert(r == Seq(4.0d))
  }

  test("sumDistinctIf sums distinct matching values") {
    val r = one(
      """SELECT sumDistinctIf(x, c) AS sd
        |FROM VALUES (5L, true), (5L, true), (7L, true), (9L, false) AS t(x, c)""".stripMargin)
    assert(r == Seq(12L))
  }

  test("uniqExactArrayIf counts distinct elements across matching rows") {
    val r = one(
      """SELECT uniqExactArrayIf(a, c) AS u
        |FROM VALUES (array(1L, 2L), true), (array(2L, 3L), true),
        |            (array(9L, 9L), false) AS t(a, c)""".stripMargin)
    assert(r == Seq(3L))
  }

  test("ForEach aggregates per array position, padding ragged rows") {
    val r = one(
      """SELECT array_join(sumForEach(a), ',') AS s,
        |       array_join(minForEach(a), ',') AS mn,
        |       array_join(maxForEach(a), ',') AS mx,
        |       array_join(countForEach(a), ',') AS n
        |FROM VALUES (array(1L, 2L, 3L)), (array(10L, 20L)) AS t(a)""".stripMargin)
    assert(r == Seq("11,22,3", "1,2,3", "10,20,3", "2,2,1"))
  }

  test("ForEach composes with If (condition-gated rows)") {
    val r = one(
      """SELECT array_join(sumForEachIf(a, c), ',') AS s
        |FROM VALUES (array(1L, 2L), true), (array(10L, 20L), false),
        |            (array(100L, 200L), true) AS t(a, c)""".stripMargin)
    assert(r == Seq("101,202"))
  }

  test("Map combinator: keyed reduce with sorted keys, If-gated rows") {
    val r = one(
      """SELECT avgMap(k, v).keys AS ks, avgMap(k, v).values AS vs,
        |       countMap(k, v).values AS cs,
        |       sumMapIf(k, v, c).values AS sif
        |FROM VALUES (array('b', 'a'), array(2L, 10L), true),
        |            (array('a', 'b'), array(20L, 4L), true),
        |            (array('a'), array(999L), false) AS t(k, v, c)""".stripMargin)
    assert(r(0).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b"))
    // 'a' averages (10, 20, 999) — only the -If form excludes row 3
    assert(r(1).asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(343.0, 3.0))
    assert(r(2).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(3L, 2L))
    assert(r(3).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(30L, 6L))
  }

  test("countOrNull / uniqExactOrNull contract empty sets to NULL") {
    val r = one(
      """SELECT (SELECT countOrNull() FROM VALUES (1) AS t(x) WHERE x < 0) AS c0,
        |       (SELECT countOrNull() FROM VALUES (1), (2) AS t(x)) AS c2,
        |       (SELECT uniqExactOrNull(x) FROM VALUES (1) AS t(x) WHERE x < 0) AS u0""".stripMargin)
    assert(r == Seq(null, 2L, null))
  }

  test("-OrDefault zeros empty sets; -SimpleState is the plain value (r19b)") {
    val r = one(
      """SELECT (SELECT sumOrDefault(x) FROM VALUES (1L) AS t(x) WHERE x < 0) AS s0,
        |       (SELECT sumOrDefault(x) FROM VALUES (1L), (2L) AS t(x)) AS s2,
        |       (SELECT maxOrDefault(x) FROM VALUES (1.5D) AS t(x) WHERE x < 0) AS m0,
        |       (SELECT sumSimpleState(x) FROM VALUES (3L), (4L) AS t(x)) AS ss""".stripMargin)
    assert(r == Seq(0L, 3L, 0.0, 7L))
  }

  test("-Resample buckets the aggregate by key ranges in one pass (r19b)") {
    val r = one(
      """SELECT sumResample(0, 30, 10)(v, k) AS s,
        |       countResample(0, 30, 10)(k) AS c,
        |       maxResample(0, 30, 10)(v, k) AS m
        |FROM VALUES (1L, 5), (2L, 5), (10L, 15), (100L, 25), (7L, 99)
        |  AS t(v, k)""".stripMargin)
    assert(r(0).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(3L, 10L, 100L))
    assert(r(1).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(2L, 1L, 1L))
    assert(r(2).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(2L, 10L, 100L))
    // out-of-range keys (99) fall outside every bucket; a partial last
    // bucket clips at end
    val p = one(
      """SELECT countResample(0, 25, 10)(k)
        |FROM VALUES (5), (15), (24), (25) AS t(k)""".stripMargin)
    assert(p(0).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(1L, 1L, 1L),
      "k=25 is outside the clipped [20, 25) bucket")
  }

  test("dynamic registration never shadows builtins or static names") {
    // a builtin name is skipped even if the grammar could parse it
    ChSql.registerCombinators(spark, "SELECT sum(x) FROM t")
    // static countIf keeps its registration (2 args would throw in the
    // dynamic kernel only if it had replaced the static one-arg form)
    val r = one(
      "SELECT countIf(x > 1) AS n FROM VALUES (1L), (2L), (3L) AS t(x)")
    assert(r == Seq(2L))
  }
}
