package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CH's bitmap function family (r19): groupBitmap aggregates, blob
  * algebra, and the -State→parquet→-Merge incremental flow. */
class BitmapFunctionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def prep(): Unit = {
    graft.core.Tables.registerViews(spark, dir)
    ChFunctions.register(spark)
  }

  test("groupBitmap == count(DISTINCT) on integers, grouped and global") {
    prep()
    val got = ChSql.sql(spark,
      """SELECT o_orderstatus AS s, groupBitmap(o_custkey) AS u
        |FROM orders GROUP BY s ORDER BY s""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ChSql.sql(spark,
      """SELECT o_orderstatus AS s, count(DISTINCT o_custkey) AS u
        |FROM orders GROUP BY s ORDER BY s""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    val g = ChSql.sql(spark,
      "SELECT groupBitmap(o_custkey) AS u FROM orders").collect()(0).getLong(0)
    assert(g == ChSql.sql(spark,
      "SELECT count(DISTINCT o_custkey) AS u FROM orders").collect()(0).getLong(0))
  }

  test("bitmap blob algebra: build, and/or/xor/andnot, contains, hasAny/All, min/max") {
    prep()
    val r = ChSql.sql(spark,
      """SELECT
        |  bitmapCardinality(bitmapBuild(array(1, 2, 3, 3))) AS card,
        |  bitmapAndCardinality(bitmapBuild(array(1, 2, 3)), bitmapBuild(array(2, 3, 4))) AS andc,
        |  bitmapOrCardinality(bitmapBuild(array(1, 2)), bitmapBuild(array(2, 3))) AS orc,
        |  bitmapXorCardinality(bitmapBuild(array(1, 2)), bitmapBuild(array(2, 3))) AS xorc,
        |  bitmapAndnotCardinality(bitmapBuild(array(1, 2, 3)), bitmapBuild(array(3))) AS anc,
        |  bitmapContains(bitmapBuild(array(7, 9)), 9) AS has9,
        |  bitmapHasAny(bitmapBuild(array(1, 2)), bitmapBuild(array(2, 5))) AS anyc,
        |  bitmapHasAll(bitmapBuild(array(1, 2, 3)), bitmapBuild(array(2, 3))) AS allc,
        |  bitmapHasAll(bitmapBuild(array(1, 2)), bitmapBuild(array(2, 3))) AS allx,
        |  bitmapMin(bitmapBuild(array(5, 9, 2))) AS mn,
        |  bitmapMax(bitmapBuild(array(5, 9, 2))) AS mx,
        |  bitmapToArray(bitmapAnd(bitmapBuild(array(1, 2, 3)), bitmapBuild(array(2, 3, 4)))) AS arr
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == 2L)
    assert(r.getLong(4) == 2L)
    assert(r.getBoolean(5))
    assert(r.getBoolean(6))
    assert(r.getBoolean(7))
    assert(!r.getBoolean(8))
    assert(r.getLong(9) == 2L && r.getLong(10) == 9L)
    assert(r.getSeq[Long](11) == Seq(2L, 3L))
  }

  test("State -> parquet -> Merge: incremental audience counting round-trips") {
    prep()
    val out = java.nio.file.Files.createTempDirectory("graft_bmstate").toString
    // per-status partial states persisted (the incremental half)
    ChSql.sql(spark,
      """SELECT o_orderstatus AS s, groupBitmapState(o_custkey) AS st
        |FROM orders GROUP BY s""".stripMargin)
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out).createOrReplaceTempView("bm_states")
    // merged across partials == direct distinct over the union
    val merged = ChSql.sql(spark,
      "SELECT groupBitmapMerge(st) AS u FROM bm_states").collect()(0).getLong(0)
    val direct = ChSql.sql(spark,
      "SELECT count(DISTINCT o_custkey) AS u FROM orders").collect()(0).getLong(0)
    assert(merged == direct)
    // MergeState re-emits a blob that keeps merging
    val re = ChSql.sql(spark,
      "SELECT bitmapCardinality(groupBitmapMergeState(st)) AS u FROM bm_states")
      .collect()(0).getLong(0)
    assert(re == direct)
  }

  test("null discipline: null arrays and blobs stay null; empty bitmap min/max are null") {
    prep()
    val r = ChSql.sql(spark,
      """SELECT bitmapBuild(CAST(NULL AS ARRAY<BIGINT>)) AS nb,
        |       bitmapCardinality(CAST(NULL AS BINARY)) AS nc,
        |       bitmapMin(bitmapBuild(array())) AS mn
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
