package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

/** Single-user credential check on both doors (VERDICT r13 "what's
  * missing" #4): CH's AUTHENTICATION_FAILED shapes — Exception frame
  * code 516 instead of ServerHello on the native door, HTTP 403 with
  * the code-516 text on the HTTP door. Unconfigured servers keep the
  * accept-anything sandbox posture (covered by every other spec). */
class AuthSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private val client = HttpClient.newHttpClient()

  test("native door: bad credentials answer code 516, good ones work") {
    val srv = new graft.service.native.NativeServer(spark,
      auth = Some(("alice", "s3cret")))
    val port = srv.start()
    try {
      val e = intercept[graft.service.native.NativeClient.ServerSideException] {
        new graft.service.native.NativeClient("127.0.0.1", port,
          user = "alice", password = "wrong")
      }
      assert(e.code == graft.service.native.NativeProtocol.ErrAuthFailed)
      assert(e.getMessage.contains("Authentication failed"), e.getMessage)
      val e2 = intercept[graft.service.native.NativeClient.ServerSideException] {
        new graft.service.native.NativeClient("127.0.0.1", port,
          user = "mallory", password = "s3cret")
      }
      assert(e2.code == 516)
      val ok = new graft.service.native.NativeClient("127.0.0.1", port,
        user = "alice", password = "s3cret")
      try {
        val r = ok.query("SELECT 1 AS x")
        assert(r.rows == Seq(Seq(1)))
      } finally ok.close()
    } finally srv.stop()
  }

  test("HTTP door: 403 code 516 without credentials; all three CH spellings work") {
    val srv = new QueryServer(spark, auth = Some(("alice", "s3cret")))
    val port = srv.start()
    def send(b: HttpRequest.Builder): HttpResponse[String] =
      client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    def post(path: String, body: String,
        hdrs: (String, String)*): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
      hdrs.foreach { case (k, v) => b = b.header(k, v) }
      send(b)
    }
    try {
      // no credentials → refused on both query routes
      val r1 = post("/", "SELECT 1")
      assert(r1.statusCode() == 403 && r1.body().contains("516"), r1.body())
      val r2 = post("/query", """{"query": "SELECT 1 AS x"}""")
      assert(r2.statusCode() == 403 && r2.body().contains("516"), r2.body())
      // wrong password → refused
      assert(post("/", "SELECT 1",
        "X-ClickHouse-User" -> "alice",
        "X-ClickHouse-Key" -> "nope").statusCode() == 403)
      // CH spelling 1: X-ClickHouse-User / X-ClickHouse-Key
      val h = post("/?default_format=CSV", "SELECT 41 + 1",
        "X-ClickHouse-User" -> "alice", "X-ClickHouse-Key" -> "s3cret")
      assert(h.statusCode() == 200 && h.body() == "42\n", h.body())
      // CH spelling 2: ?user= & ?password=
      val q = post("/?default_format=CSV&user=alice&password=s3cret",
        "SELECT 2 + 2")
      assert(q.statusCode() == 200 && q.body() == "4\n", q.body())
      // CH spelling 3: HTTP Basic
      val basic = java.util.Base64.getEncoder
        .encodeToString("alice:s3cret".getBytes("UTF-8"))
      val b = post("/query", """{"query": "SELECT 1 AS x"}""",
        "Authorization" -> s"Basic $basic")
      assert(b.statusCode() == 200, b.body())
      // health/metrics handles stay open, as CH's /ping does
      val hc = send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/hc")).GET())
      assert(hc.statusCode() == 200 && hc.body() == "ok")
      val ping = send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/ping")).GET())
      assert(ping.statusCode() == 200)
    } finally srv.stop(0)
  }
}
