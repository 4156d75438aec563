package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal read-only static file server over a directory — stands in
  * for the public object-store endpoints the reference queries
  * (`s3('https://…/house_{0,1}.parquet')`,
  * `temporal/workflow_query_executor_test.go:49`) so the http data
  * paths ([[HttpParquet]], [[Sources.urlCsv]]) can be exercised
  * end-to-end with zero egress. One instance per directory, ephemeral
  * port, daemon thread; lives for the JVM. */
object StaticHttp {

  private val servers = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Serve `dir` (read-only) on 127.0.0.1; returns the bound port.
    * Idempotent per directory. */
  def serve(dir: String): Int = servers.getOrElseUpdate(dir, {
    val root = new java.io.File(dir).getCanonicalFile
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val f = new java.io.File(root, ex.getRequestURI.getPath).getCanonicalFile
        // canonical-path containment: no ../ escape from the served dir.
        // Component-wise Path.startsWith — a string-prefix test would let
        // a sibling like /data2 pass when serving /data.
        if (!f.toPath.startsWith(root.toPath) || !f.isFile) {
          ex.sendResponseHeaders(404, -1)
        } else {
          // stream at constant memory: multi-GB fixtures must not be
          // buffered whole on the dispatch thread
          ex.sendResponseHeaders(200, f.length())
          java.nio.file.Files.copy(f.toPath, ex.getResponseBody)
        }
        ex.close()
      }
    })
    server.setExecutor(null) // serve on the dispatch thread
    // start() spawns the (non-daemon) HTTP-Dispatcher thread, which
    // inherits daemon status from its creator — start from a daemon
    // thread so a finished main (Verify/Bench) can actually exit the JVM
    val starter = new Thread(() => server.start(), "static-http-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    server.getAddress.getPort
  })
}
