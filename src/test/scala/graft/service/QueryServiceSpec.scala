package graft.service

import org.scalatest.funsuite.AnyFunSuite

class QueryServiceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("execute returns the Cols+Rows(+types) envelope (O7 parity)") {
    val svc = new QueryService(spark)
    val res = svc.execute(QueryService.QueryRequest(
      "SELECT count() AS cnt FROM s3('/root/testdata/sf0.001/nation.parquet', 'Parquet')"))
    assert(res.cols == Seq("cnt"))
    assert(res.types == Seq("bigint"))
    assert(res.rows == Seq(Seq(25L)))
  }

  test("init SET is visible to the main query (O6 parity)") {
    val svc = new QueryService(spark)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      svc.execute(QueryService.QueryRequest(
        query = "SELECT 1 AS one",
        initQueries = Seq("SET spark.sql.shuffle.partitions=7")))
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("macros substitute in both init and main queries (C4)") {
    val svc = new QueryService(spark)
    val res = svc.execute(QueryService.QueryRequest(
      query = "SELECT '{cluster}' AS c",
      macros = Map("cluster" -> "mycluster")))
    assert(res.rows == Seq(Seq("mycluster")))
  }

  test("per-query SETTINGS are extracted and recorded (C2)") {
    val svc = new QueryService(spark)
    val res = svc.execute(QueryService.QueryRequest(
      "SELECT 1 AS one SETTINGS max_parallel_replicas=10"))
    assert(res.settings == Map("max_parallel_replicas" -> "10"))
    assert(res.rows == Seq(Seq(1)))
  }

  test("warm path executes without init (O9 parity)") {
    val svc = new QueryService(spark)
    val res = svc.executeOnCurrent("SELECT 2 AS two")
    assert(res.rows == Seq(Seq(2)))
  }

  test("uniq aliases resolve through the registered dialect functions") {
    val svc = new QueryService(spark)
    val res = svc.executeOnCurrent(
      "SELECT uniqExact(n_regionkey) AS u FROM s3('/root/testdata/sf0.001/nation.parquet', 'Parquet')")
    assert(res.rows == Seq(Seq(5L)))
  }

  test("uniq (HLL++) approximates within 5% of exact — SURVEY §5 property") {
    val svc = new QueryService(spark)
    val rows = svc.executeOnCurrent(
      """SELECT uniq(o_custkey) AS approx, uniqExact(o_custkey) AS exact
        |FROM s3('/root/testdata/sf0.001/orders.parquet', 'Parquet')""".stripMargin).rows
    val (approx, exact) = (rows.head(0).asInstanceOf[Long], rows.head(1).asInstanceOf[Long])
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"uniq=$approx vs exact=$exact drifts beyond 5%")
  }
}
