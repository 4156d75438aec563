package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

/** CH's HTTP sessions (`?session_id=`): SET state persists across
  * requests on the same id, a session admits one request at a time
  * (code 373 SESSION_IS_LOCKED), `session_check=1` refuses unknown ids
  * (code 372), and idle sessions expire after `session_timeout`
  * (default 60 s). Without a session_id every request stays isolated
  * in its own fresh session — the posture every other spec pins. */
class HttpSessionSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private lazy val port = new QueryServer(spark).start()
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("SET persists across requests on the same session_id, isolated from others") {
    val set = post("/?session_id=sess_a",
      "SET spark.sql.shuffle.partitions = 7")
    assert(set.statusCode() == 200, set.body())
    val sameSess = post("/?session_id=sess_a&default_format=CSV",
      "SET spark.sql.shuffle.partitions")
    assert(sameSess.body().contains("7"), sameSess.body())
    // another session id sees the default
    val otherSess = post("/?session_id=sess_b&default_format=CSV",
      "SET spark.sql.shuffle.partitions")
    assert(!otherSess.body().contains("\t7"), otherSess.body())
    // a session-less request is isolated too
    val isolated = post("/?default_format=CSV",
      "SET spark.sql.shuffle.partitions")
    assert(!isolated.body().contains("\t7"), isolated.body())
  }

  test("session_check=1 refuses an unknown id with code 372") {
    val r = post("/?session_id=never_created&session_check=1", "SELECT 1")
    assert(r.statusCode() == 400, r.body())
    assert(r.body().contains("372"), r.body())
    // ...and accepts an existing one
    post("/?session_id=sess_c", "SELECT 1")
    val ok = post("/?session_id=sess_c&session_check=1&default_format=CSV",
      "SELECT 1")
    assert(ok.statusCode() == 200, ok.body())
  }

  test("a session admits one request at a time: code 373 for the concurrent caller") {
    // two concurrent callers on one session id: EXACTLY the overlap
    // must produce a 373 on one side — either the poller hits the
    // holder's lock, or (if a poll acquired first) the heavy request
    // itself is the one refused. Polling keeps the overlap guaranteed
    // regardless of JVM warmness (a fixed sleep raced both ways).
    @volatile var holderResp: HttpResponse[String] = null
    val slow = new Thread(() => {
      holderResp = post("/?session_id=sess_lock&default_format=CSV",
        "SELECT count() FROM (SELECT a.number FROM numbers(3000000) a, " +
          "numbers(300) b)")
    }, "sess-lock-holder")
    slow.start()
    var saw373 = false
    val deadline = System.nanoTime() + 60e9.toLong
    while (!saw373 && slow.isAlive && System.nanoTime() < deadline) {
      val b = post("/?session_id=sess_lock", "SELECT 1")
      if (b.statusCode() == 500 && b.body().contains("373")) saw373 = true
    }
    slow.join(120000)
    assert(!slow.isAlive)
    val holder373 = holderResp != null && holderResp.statusCode() == 500 &&
      holderResp.body().contains("373")
    assert(saw373 || holder373,
      s"no side observed SESSION_IS_LOCKED (holder: ${Option(holderResp)
        .map(_.statusCode())})")
    // released after A finishes
    val after = post("/?session_id=sess_lock&default_format=CSV", "SELECT 1")
    assert(after.statusCode() == 200, after.body())
  }

  test("idle sessions expire after session_timeout") {
    assert(post("/?session_id=sess_ttl&session_timeout=1",
      "SET spark.sql.shuffle.partitions = 9").statusCode() == 200)
    Thread.sleep(1500)
    val gone = post("/?session_id=sess_ttl&session_check=1", "SELECT 1")
    assert(gone.statusCode() == 400 && gone.body().contains("372"),
      s"${gone.statusCode()}: ${gone.body()}")
  }
}
