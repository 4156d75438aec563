package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.service.native.{NativeBlock, NativeClient}

/** `remote('host:port', db.table)` — the CH table function that reads
  * another server's table over the NATIVE TCP protocol (reference
  * surface: `workflow_query_executor.go:313` delegates the whole SQL
  * string, `remote(...)` spellings included, to ClickHouse; this
  * engine implements the function itself on top of its own
  * [[NativeClient]]).
  *
  * Topology: ONE Spark partition per address — each partition opens
  * its own native-protocol connection ON THE EXECUTOR and streams that
  * server's rows, so a sharded spelling
  * (`remote('node{1..4}:9000', db.t)`) scans all four shards in
  * parallel across the cluster, the way CH's Distributed engine fans
  * out. The driver opens exactly one short probe connection
  * (`SELECT * FROM t LIMIT 0`) for the schema.
  *
  * Types surface through [[NativeBlock.sparkTypeOf]] — the same
  * mapping the native door's INSERT path uses, unsigned
  * reinterpretations documented there. Every address is expected to
  * return the same schema (the probe's schema binds the scan; a
  * mismatched shard fails its task loudly at row conversion).
  *
  * 100 TB posture: per-address streams are independent (no shuffle);
  * parallelism equals the address count, which is the honest limit of
  * `remote()` — a single remote server is one stream by protocol. The
  * per-task materialization is one server's result set, the same
  * volume a CH initiator buffers per connection. */
object RemoteNative {

  private val Range = """\{(\d+)\.\.(\d+)\}""".r

  /** Expand `h1:9000,h2:9000` lists and one `{n..m}` numeric range
    * (CH's shard spelling). */
  def expandAddresses(spec: String): Seq[(String, Int)] =
    spec.split(',').map(_.trim).filter(_.nonEmpty).toSeq.flatMap { one =>
      val expanded = Range.findFirstMatchIn(one) match {
        case Some(m) =>
          val (lo, hi) = (m.group(1).toInt, m.group(2).toInt)
          require(hi >= lo && hi - lo < 1024,
            s"remote(): bad address range in '$one'")
          (lo to hi).map(i =>
            one.substring(0, m.start) + i + one.substring(m.end))
        case None => Seq(one)
      }
      expanded.map(splitHostPort)
    }

  /** Split one address into (host, port). Handles bracketed IPv6
    * (`[::1]:9440`, `[2001:db8::1]`) and falls back to the default
    * port 9000 when there is no port — including a bare IPv6 literal
    * (`::1`), whose last hextet must NOT be read as a port. */
  private[sources] def splitHostPort(a: String): (String, Int) =
    if (a.startsWith("[")) {
      val close = a.indexOf(']')
      require(close > 0, s"remote(): unterminated '[' in address '$a'")
      val host = a.substring(1, close)
      val rest = a.substring(close + 1)
      if (rest.isEmpty) (host, 9000)
      else {
        require(rest.head == ':', s"remote(): bad address '$a'")
        (host, rest.tail.toInt)
      }
    } else {
      val i = a.lastIndexOf(':')
      val tail = if (i < 0) "" else a.substring(i + 1)
      // a second colon means an unbracketed IPv6 literal with no port;
      // a non-numeric tail is not a port either
      if (i < 0 || a.indexOf(':') != i || !tail.forall(_.isDigit) || tail.isEmpty)
        (a, 9000)
      else (a.substring(0, i), tail.toInt)
    }

  /** Back-quote an identifier; the `default` database prefix is
    * dropped (this engine's catalog, like CH's default database, is
    * addressed bare). */
  private def qualified(db: String, table: String): String = {
    def q(s: String) = "`" + s.replace("`", "``") + "`"
    if (db.isEmpty || db == "default") q(table) else s"${q(db)}.${q(table)}"
  }

  def read(spark: SparkSession, addrSpec: String, db: String, table: String,
      user: String = "default", password: String = "",
      /** `remoteSecure()`: TLS per connection; the truststore comes
        * from `spark.graft.tls.truststore`/`.truststorePassword`
        * (captured at plan time, loaded on each executor — a shared
        * filesystem path, like any deployment credential). */
      secure: Boolean = false): DataFrame = {
    val addrs = expandAddresses(addrSpec)
    require(addrs.nonEmpty, s"remote(): no addresses in '$addrSpec'")
    val target = qualified(db, table)
    val trust: Option[(String, String)] =
      if (!secure) None
      else Some((
        spark.conf.getOption(graft.service.Tls.TruststoreConf).getOrElse(
          throw new IllegalArgumentException(
            s"remoteSecure() needs ${graft.service.Tls.TruststoreConf} set")),
        spark.conf.getOption(graft.service.Tls.TruststorePasswordConf)
          .getOrElse("")))
    def ctx(): Option[javax.net.ssl.SSLContext] =
      trust.map { case (p, pw) => graft.service.Tls.clientContext(p, pw) }

    // schema probe: one short driver-side connection to the first address
    val (h0, p0) = addrs.head
    val probe = new NativeClient(h0, p0, user = user, password = password,
      tls = ctx())
    val schema =
      try {
        val r = probe.query(s"SELECT * FROM $target LIMIT 0")
        StructType(r.cols.zip(r.types).map { case (n, t) =>
          StructField(n, NativeBlock.sparkTypeOf(NativeBlock.parseType(t)),
            nullable = true)
        })
      } finally probe.close()

    val rdd = spark.sparkContext
      .parallelize(addrs, addrs.size)
      .mapPartitions { it =>
        it.flatMap { case (h, p) =>
          // STREAMING read: at most one decoded block on this executor's
          // heap, never a shard's whole result; the connection closes
          // when the task completes (early exit included — a LIMIT that
          // stops consuming must not leak the socket)
          val c = new NativeClient(h, p, user = user, password = password,
            tls = trust.map { case (tp, tpw) =>
              graft.service.Tls.clientContext(tp, tpw) })
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => c.close()))
          c.queryStream(s"SELECT * FROM $target").map(Row.fromSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
