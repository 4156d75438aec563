package graft.dialect

import org.scalatest.funsuite.AnyFunSuite

/** CH dictionaries: CREATE DICTIONARY over a session table, the
  * dictGet family rewritten to correlated scalar subqueries (broadcast
  * joins under the hood), declared/type defaults on miss, dictHas,
  * dictGetOrDefault/OrNull, and DROP DICTIONARY. */
class DictionarySpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def fresh(): Unit = {
    import spark.implicits._
    Seq((1L, "FR", 3.14), (2L, "DE", 2.72), (3L, "US", 1.41))
      .toDF("cid", "code", "rate").createOrReplaceTempView("dict_src")
    Seq((10L, 1L), (11L, 2L), (12L, 9L))
      .toDF("oid", "cid").createOrReplaceTempView("dict_facts")
  }

  test("dictGet family: hit, miss defaults, typed spellings, dictHas, OrDefault/OrNull") {
    fresh()
    ChSql.sql(spark,
      """CREATE DICTIONARY country_dict (
        |  cid UInt64, code String DEFAULT '??', rate Float64
        |) PRIMARY KEY cid
        |SOURCE(CLICKHOUSE(TABLE 'dict_src'))
        |LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 300)""".stripMargin).collect()
    try {
      val rows = ChSql.sql(spark,
        """SELECT oid,
          |  dictGet('country_dict', 'code', cid) AS code,
          |  dictGetString('country_dict', 'code', cid) AS code2,
          |  CAST(round(dictGet('country_dict', 'rate', cid) * 100) AS BIGINT) AS rate_c,
          |  dictHas('country_dict', cid) AS has,
          |  dictGetOrDefault('country_dict', 'code', cid, 'zz') AS ord
          |FROM dict_facts ORDER BY oid""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getInt(4), r.getString(5))).toSeq
      assert(rows == Seq(
        (10L, "FR", "FR", 314L, 1, "FR"),
        (11L, "DE", "DE", 272L, 1, "DE"),
        // miss: declared DEFAULT for code, type default 0 for rate
        (12L, "??", "??", 0L, 0, "zz")), rows.mkString("; "))
      // OrNull: NULL on miss
      val nulls = ChSql.sql(spark,
        "SELECT dictGetOrNull('country_dict', 'code', cid) AS c " +
          "FROM dict_facts ORDER BY oid")
        .collect().map(r => if (r.isNullAt(0)) "NULL" else r.getString(0)).toSeq
      assert(nulls == Seq("FR", "DE", "NULL"), nulls.mkString(", "))
      // nested key expressions and dictGet inside aggregates work
      assert(ChSql.sql(spark,
        "SELECT count() AS n FROM dict_facts " +
          "WHERE dictHas('country_dict', cid) = 1")
        .collect().head.getLong(0) == 2L)
      // introspection: system.dictionaries lists the live registry
      val sys = ChSql.sql(spark,
        "SELECT name, key, source FROM system.dictionaries " +
          "WHERE name = 'country_dict'").collect().head
      assert((sys.getString(0), sys.getString(1), sys.getString(2)) ==
        (("country_dict", "cid", "dict_src")), sys.toString)
      // unknown dictionary / attribute refuse loudly
      val e = intercept[IllegalArgumentException] {
        ChSql.sql(spark, "SELECT dictGet('nope', 'x', 1) AS v").collect()
      }
      assert(e.getMessage.contains("no such dictionary"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        ChSql.sql(spark,
          "SELECT dictGet('country_dict', 'nope', 1) AS v").collect()
      }
      assert(e2.getMessage.contains("no such attribute"), e2.getMessage)
    } finally ChSql.sql(spark, "DROP DICTIONARY country_dict").collect()
    // dropped: the name refuses afterwards
    val e3 = intercept[IllegalArgumentException] {
      ChSql.sql(spark, "SELECT dictGet('country_dict', 'code', 1) AS v").collect()
    }
    assert(e3.getMessage.contains("no such dictionary"), e3.getMessage)
  }

  test("guardrails: unsupported SOURCE kinds, missing source table, duplicate keys") {
    fresh()
    val e = intercept[IllegalArgumentException] {
      ChSql.sql(spark,
        "CREATE DICTIONARY bad_d (k UInt64, v String) PRIMARY KEY k " +
          "SOURCE(FILE(PATH '/tmp/x.csv'))").collect()
    }
    assert(e.getMessage.contains("SOURCE(FILE"), e.getMessage)
    // a duplicate key in the source fails the probing query LOUDLY
    import spark.implicits._
    Seq((1L, "a"), (1L, "b")).toDF("k", "v").createOrReplaceTempView("dup_src")
    ChSql.sql(spark,
      "CREATE DICTIONARY dup_d (k UInt64, v String) PRIMARY KEY k " +
        "SOURCE(CLICKHOUSE(TABLE 'dup_src'))").collect()
    try {
      val err = intercept[Exception] {
        ChSql.sql(spark, "SELECT dictGet('dup_d', 'v', 1) AS v").collect()
      }
      assert(err.getMessage.toLowerCase.contains("more than one row"),
        err.getMessage)
    } finally ChSql.sql(spark, "DROP DICTIONARY dup_d").collect()
  }
}
