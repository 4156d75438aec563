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
        // canonical-path containment: no ../ escape from the served dir
        if (!f.getPath.startsWith(root.getPath) || !f.isFile) {
          ex.sendResponseHeaders(404, -1)
        } else {
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        }
        ex.close()
      }
    })
    server.setExecutor(null) // serve on the dispatch thread
    server.start()
    server.getAddress.getPort
  })
}
