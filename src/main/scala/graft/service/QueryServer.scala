package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

/** The reference's service shell re-expressed over [[QueryService]]:
  * its process entry wires an HTTP server whose only technical route is
  * `GET /hc` (reference `http_server/http_server.go:50,83-85`,
  * `main.go:59`) plus an internal metrics server exposing Prometheus
  * text (`observability/internal_http.go:22`, started at
  * `main.go:44-50`). Here one embedded JDK server carries all three
  * surfaces — no framework, no new dependency:
  *
  *   - `GET /hc` → `200 ok` (byte-for-byte the reference's health reply)
  *   - `POST /query` → the full request envelope: JSON
  *     `{"query": …, "init_queries": […], "macros": {…}}` through
  *     [[QueryService.execute]] → `{"cols", "types", "rows",
  *     "settings"}` — the `QueryExecutorInput`/`Output` wire shape
  *     (`temporal/workflow_query_executor.go:30-39`) with types added
  *   - `GET /metrics` → Prometheus text exposition of query
  *     counts/errors/latency, the internal-server contract
  *
  * Error posture: malformed JSON and analysis-time failures are the
  * caller's fault → 400 with the message; anything else → 500. Both
  * count into `graft_query_errors_total`.
  *
  * Scale posture: the server is a driver-side control surface — one
  * JVM, request handling on a small pool; the heavy lifting stays in
  * Spark jobs. This mirrors the reference, where the HTTP pod is a thin
  * door in front of the warehouse.
  */
class QueryServer(spark: SparkSession, port: Int = 0) {

  private val mapper = new ObjectMapper()

  private val queriesTotal = new LongAdder
  private val errorsTotal = new LongAdder
  private val querySecondsTotal = new DoubleAdder2
  private val started = new AtomicLong(0L)

  private var server: HttpServer = _

  /** Bind and serve; returns the bound port (ephemeral when `port=0`). */
  def start(): Int = synchronized {
    require(server == null, "already started")
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/hc", handler { _ => (200, "text/plain", "ok") })
    server.createContext("/metrics", handler { _ => (200, "text/plain", metricsText()) })
    server.createContext("/query", handler { ex =>
      if (ex.getRequestMethod != "POST") (405, "text/plain", "POST only")
      else {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val t0 = System.nanoTime()
        try {
          val req = parseRequest(body)
          // per-request session isolation (the reference gives each
          // workflow its own CH session, `workflow_query_executor.go:302`):
          // newSession() shares the SparkContext and cached data but
          // carries its OWN SQLConf, temp views, and function registry,
          // so one request's SETs / ATTACHes never leak into another
          // running concurrently on this 4-thread pool
          val res = new QueryService(spark.newSession()).execute(req)
          queriesTotal.increment()
          querySecondsTotal.add((System.nanoTime() - t0) / 1e9)
          (200, "application/json", renderResult(res))
        } catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            errorsTotal.increment()
            (400, "application/json", errorJson(s"malformed request JSON: ${e.getMessage}"))
          case e @ (_: org.apache.spark.sql.AnalysisException |
                    _: IllegalArgumentException |
                    _: org.apache.spark.sql.catalyst.parser.ParseException) =>
            errorsTotal.increment()
            (400, "application/json", errorJson(e.getMessage))
          case e: Exception =>
            errorsTotal.increment()
            (500, "application/json", errorJson(e.toString))
        }
      }
    })
    // small fixed pool: control-plane requests only; Spark owns the cores
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-query-server"); t.setDaemon(true); t
    }))
    started.set(System.currentTimeMillis())
    // as StaticHttp: start from a daemon thread so the dispatcher
    // inherits daemon status and a finished main can exit the JVM
    val starter = new Thread(() => server.start(), "graft-query-server-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  // ---- request/response wire format ----

  private def parseRequest(body: String): QueryService.QueryRequest = {
    val root = mapper.readTree(body)
    val query = Option(root.get("query")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException("missing required field: query"))
    val init = Option(root.get("init_queries")).map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Nil)
    val macros = Option(root.get("macros"))
      .map(m => m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(graft.dialect.ChSql.defaultMacros)
    QueryService.QueryRequest(query, init, macros)
  }

  private def renderResult(r: QueryService.QueryResult): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"cols\":")
    jsonArr(sb, r.cols.map(jsonStr))
    sb.append(",\"types\":")
    jsonArr(sb, r.types.map(jsonStr))
    sb.append(",\"rows\":[")
    var first = true
    r.rows.foreach { row =>
      if (!first) sb.append(','); first = false
      jsonArr(sb, row.map(jsonVal))
    }
    sb.append("],\"settings\":{")
    sb.append(r.settings.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }.mkString(","))
    sb.append("}}")
    sb.toString
  }

  private def jsonArr(sb: StringBuilder, items: Seq[String]): Unit = {
    sb.append('[')
    var first = true
    items.foreach { i => if (!first) sb.append(','); first = false; sb.append(i) }
    sb.append(']')
  }

  /** Cell rendering: JSON-native types stay native; temporal/binary/
    * array/struct values render as strings — the reference's envelope is
    * `[][]any` through Go's encoder (`workflow_query_executor.go:336`),
    * which stringifies the same classes via driver text protocol. */
  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case f: Float =>
      if (f.isNaN || f.isInfinite) jsonStr(f.toString) else f.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) jsonStr(d.toString) else d.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case s: Seq[_] => { val sb = new StringBuilder; jsonArr(sb, s.map(jsonVal)); sb.toString }
    case b: Array[Byte] => jsonStr(java.util.Base64.getEncoder.encodeToString(b))
    case other => jsonStr(other.toString)
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  private def errorJson(msg: String): String = s"""{"error":${jsonStr(Option(msg).getOrElse("unknown"))}}"""

  private def metricsText(): String = {
    val up = (System.currentTimeMillis() - started.get()) / 1000.0
    s"""# TYPE graft_queries_total counter
       |graft_queries_total ${queriesTotal.sum()}
       |# TYPE graft_query_errors_total counter
       |graft_query_errors_total ${errorsTotal.sum()}
       |# TYPE graft_query_seconds_total counter
       |graft_query_seconds_total ${querySecondsTotal.sum()}
       |# TYPE graft_uptime_seconds gauge
       |graft_uptime_seconds $up
       |""".stripMargin
  }

  private def handler(f: HttpExchange => (Int, String, String)): HttpHandler =
    (ex: HttpExchange) => {
      val (code, ctype, body) =
        try f(ex)
        catch { case e: Exception => (500, "application/json", errorJson(e.toString)) }
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
}

/** `DoubleAdder`-shaped accumulator on a LongAdder of nano-scaled
  * fixed-point values (java.util.concurrent.atomic.DoubleAdder exists,
  * but fixed-point keeps metrics deterministic under concurrent adds). */
private final class DoubleAdder2 {
  private val micros = new LongAdder
  def add(seconds: Double): Unit = micros.add(Math.round(seconds * 1e6))
  def sum(): Double = micros.sum() / 1e6
}
