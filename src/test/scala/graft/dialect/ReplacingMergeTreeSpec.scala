package graft.dialect

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** ENGINE = ReplacingMergeTree(ver): FINAL's real dedup semantics —
  * raw multiversion rows without the modifier, one-row-per-key highest
  * version with it, physical collapse via OPTIMIZE FINAL, and the
  * deterministic-engine refusal for the versionless form. */
class ReplacingMergeTreeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def fresh(): Unit = {
    import spark.implicits._
    Seq((1L, "a", 0L, 10.0), (2L, "b", 0L, 20.0), (3L, "c", 0L, 30.0))
      .toDF("id", "k", "ver", "v").createOrReplaceTempView("rsrc")
    Seq((1L, "a2", 1L, 11.0), (3L, "c2", 2L, 33.0))
      .toDF("id", "k", "ver", "v").createOrReplaceTempView("rupd")
  }

  test("FINAL dedups by sorting key on the highest version; raw reads stay multiversion") {
    fresh()
    val wh = Files.createTempDirectory("graft_repl").toString
    spark.conf.set(ChWrites.WarehouseConf, wh)
    try {
      ChSql.sql(spark,
        "CREATE TABLE repl_t ENGINE = ReplacingMergeTree(ver) ORDER BY (id) AS " +
          "SELECT id, k, ver, v FROM rsrc").collect()
      ChSql.sql(spark,
        "INSERT INTO repl_t SELECT id, k, ver, v FROM rupd").collect()
      // WITHOUT FINAL: all five version rows are visible (CH contract)
      assert(ChSql.sql(spark, "SELECT count() AS n FROM repl_t")
        .collect().head.getLong(0) == 5L)
      // WITH FINAL: one row per id, the highest ver
      val fin = ChSql.sql(spark,
        "SELECT id, k, v FROM repl_t FINAL ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(fin == Seq((1L, "a2", 11.0), (2L, "b", 20.0), (3L, "c2", 33.0)))
      // FINAL composes with aggregation
      assert(ChSql.sql(spark,
        "SELECT CAST(round(sum(v)) AS BIGINT) AS s FROM repl_t FINAL")
        .collect().head.getLong(0) == 64L)
      // OPTIMIZE FINAL physically collapses the versions
      ChSql.sql(spark, "OPTIMIZE TABLE repl_t FINAL").collect()
      assert(ChSql.sql(spark, "SELECT count() AS n FROM repl_t")
        .collect().head.getLong(0) == 3L)
      assert(ChSql.sql(spark,
        "SELECT CAST(round(sum(v)) AS BIGINT) AS s FROM repl_t")
        .collect().head.getLong(0) == 64L)
      // SHOW CREATE renders the declared engine
      val create = ShowSql.run(spark, "SHOW CREATE TABLE repl_t")
        .collect().head.getString(0)
      assert(create.contains("ReplacingMergeTree(ver)"), create)
      ChSql.sql(spark, "DROP TABLE repl_t").collect()
    } finally spark.conf.unset(ChWrites.WarehouseConf)
  }

  test("an independently ATTACHed Replacing tree carries the engine; versionless FINAL refuses") {
    fresh()
    val wh = Files.createTempDirectory("graft_repl2").toString
    spark.conf.set(ChWrites.WarehouseConf, wh)
    try {
      ChSql.sql(spark,
        "CREATE TABLE repl_src ENGINE = ReplacingMergeTree(ver) ORDER BY (id) AS " +
          "SELECT id, k, ver, v FROM rsrc").collect()
      ChSql.sql(spark,
        "INSERT INTO repl_src SELECT id, k, ver, v FROM rupd").collect()
      graft.core.Catalog.attach(spark,
        s"""ATTACH TABLE repl_back (`id` Int64, `k` String, `ver` Int64, `v` Float64)
           |ENGINE = ReplacingMergeTree(ver) ORDER BY (id)
           |SETTINGS disk = disk(type = web, endpoint = '$wh/repl_src')""".stripMargin)
      assert(ChSql.sql(spark, "SELECT count() AS n FROM repl_back FINAL")
        .collect().head.getLong(0) == 3L)
      // versionless Replacing: FINAL refuses with guidance (CH keeps an
      // order-of-merges-dependent row; a deterministic engine won't fake it)
      graft.core.Catalog.attach(spark,
        s"""ATTACH TABLE repl_nover (`id` Int64, `k` String, `ver` Int64, `v` Float64)
           |ENGINE = ReplacingMergeTree ORDER BY (id)
           |SETTINGS disk = disk(type = web, endpoint = '$wh/repl_src')""".stripMargin)
      val e = intercept[IllegalArgumentException] {
        ChSql.sql(spark, "SELECT count() AS n FROM repl_nover FINAL").collect()
      }
      assert(e.getMessage.contains("version column"), e.getMessage)
      Seq("repl_back", "repl_nover").foreach { n =>
        graft.core.Catalog.detach(n); spark.catalog.dropTempView(n)
      }
      ChSql.sql(spark, "DROP TABLE repl_src").collect()
    } finally spark.conf.unset(ChWrites.WarehouseConf)
  }
}
