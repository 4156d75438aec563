package graft.service

import org.scalatest.funsuite.AnyFunSuite

import graft.service.QueryService.QueryRequest

/** The live-query surface: system.processes / SHOW PROCESSLIST list
  * running queries across doors, KILL QUERY stops one by id, and the
  * session survives the kill. */
class ProcessesSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private val slowSql =
    "SELECT max(cityHash64(toString(number))) AS h FROM numbers(20000000000)"

  test("system.processes and SHOW PROCESSLIST list a live query; KILL QUERY stops it") {
    val svc = new QueryService(spark)
    @volatile var failure: Throwable = null
    val runner = new Thread(() => {
      try { svc.execute(QueryRequest(slowSql)); () }
      catch { case e: Throwable => failure = e }
    }, "processes-victim")
    runner.setDaemon(true)
    runner.start()
    // wait for the victim to register
    val deadline = System.currentTimeMillis() + 20000
    while (Processes.all.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(Processes.all.nonEmpty, "victim never registered")
    val qid = Processes.all.head.queryId

    // visible through the SQL surfaces while running
    val viaSystem = graft.dialect.ChSql.sql(spark,
      "SELECT query_id, door FROM system.processes")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(viaSystem.exists(_._1 == qid), viaSystem.mkString(", "))
    val viaShow = graft.dialect.ChSql.sql(spark, "SHOW PROCESSLIST")
      .collect().map(_.getString(0)).toSeq
    assert(viaShow.contains(qid), viaShow.mkString(", "))

    // KILL QUERY ... SYNC waits for the victim to go away
    val killed = graft.dialect.ChSql.sql(spark,
      s"KILL QUERY WHERE query_id = '$qid' SYNC")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(killed == Seq(("finished", qid)), killed.mkString(", "))
    runner.join(20000)
    assert(!runner.isAlive, "victim still running after SYNC kill")
    assert(failure != null, "victim must fail with the cancellation error")
    assert(Processes.all.isEmpty, "victim must unregister")

    // the registry empties and an absent id returns zero rows (CH's shape)
    val gone = graft.dialect.ChSql.sql(spark,
      s"KILL QUERY WHERE query_id = '$qid'").collect()
    assert(gone.isEmpty)
    // the session survives
    assert(graft.dialect.ChSql.sql(spark, "SELECT 1 AS ok")
      .collect()(0).getInt(0) == 1)
  }

  test("KILL QUERY refuses non-id predicates loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.dialect.ChSql.sql(spark,
        "KILL QUERY WHERE user = 'default'").collect()
    }
    assert(e.getMessage.contains("query_id"), e.getMessage)
  }
}
