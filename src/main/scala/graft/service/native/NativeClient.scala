package graft.service.native

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetSocketAddress, Socket}

import NativeProtocol._
import NativeWire._

/** Minimal native-protocol client — the in-repo loopback proof that
  * [[NativeServer]] speaks the wire the reference's clickhouse-go
  * v2.10.1 control plane dials (no client jar exists in this sandbox,
  * so the protocol is proven the way the hash ports were: golden byte
  * frames + this client replaying the reference's init-then-query flow
  * — `temporal/workflow_query_executor.go:302-313` — over a real
  * socket). Speaks revision [[NativeProtocol.ServerRevision]] with
  * optional LZ4 compression, mirroring clickhouse-go's encoder layout
  * field for field. */
final class NativeClient(
    host: String, port: Int,
    database: String = "default",
    user: String = "default",
    password: String = "",
    compression: Boolean = true,
    /** TLS context for a SECURE door (9440/`remoteSecure`, r18): the
      * socket wraps in SSL before the Hello; no trust-all mode — the
      * context's truststore decides (see [[graft.service.Tls]]). */
    tls: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {

  /** `dataBlocks` counts the NON-EMPTY Data frames — the streaming
    * proof surface: a server that materialized-then-chunked and one
    * that streams both send >1 block for big results, but specs pair
    * this with a job-count spy to pin the incremental fetch. */
  final case class Result(
      cols: Seq[String], types: Seq[String], rows: Seq[Seq[Any]],
      progressRows: Long, dataBlocks: Int = 0)

  private val sock = tls match {
    case Some(ctx) =>
      val s = ctx.getSocketFactory.createSocket()
      s.connect(new InetSocketAddress(host, port), 5000)
      val ssl = s.asInstanceOf[javax.net.ssl.SSLSocket]
      // verify the presented hostname against the certificate — the
      // half of TLS a bare SSLSocket silently skips
      val params = ssl.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(params)
      ssl.startHandshake()
      ssl
    case None => new Socket()
  }
  sock.setTcpNoDelay(true)
  if (tls.isEmpty) sock.connect(new InetSocketAddress(host, port), 5000)
  private val in = new BufferedInputStream(sock.getInputStream)
  private val out = new BufferedOutputStream(sock.getOutputStream)

  /** Negotiated revision after the handshake. */
  val revision: Long = hello()

  var serverName: String = _
  var serverTimezone: String = _
  var serverDisplayName: String = _

  private def hello(): Long = {
    val b = new WireOut
    b.writeVarUInt(ClientHello)
    b.writeString("graft-native-client")
    b.writeVarUInt(1); b.writeVarUInt(0)
    b.writeVarUInt(ServerRevision)
    b.writeString(database)
    b.writeString(user)
    b.writeString(password)
    out.write(b.bytes); out.flush()

    val packet = NativeWire.readVarUInt(in)
    if (packet == ServerException) throw readException()
    require(packet == ServerHello,
      s"expected ServerHello(0), got packet $packet")
    serverName = NativeWire.readString(in)
    NativeWire.readVarUInt(in) // major
    NativeWire.readVarUInt(in) // minor
    val serverRev = NativeWire.readVarUInt(in)
    val negotiated = math.min(serverRev, ServerRevision)
    if (serverRev >= MinRevisionWithServerTimezone)
      serverTimezone = NativeWire.readString(in)
    if (serverRev >= MinRevisionWithServerDisplayName)
      serverDisplayName = NativeWire.readString(in)
    if (serverRev >= MinRevisionWithVersionPatch)
      NativeWire.readVarUInt(in)
    // addendum (quota key), from 54458 on
    if (negotiated >= MinProtocolWithAddendum) {
      val a = new WireOut
      a.writeString("")
      out.write(a.bytes); out.flush()
    }
    negotiated
  }

  def ping(): Unit = {
    NativeWire.writeVarUInt(out, ClientPing); out.flush()
    val packet = NativeWire.readVarUInt(in)
    require(packet == ServerPong, s"expected Pong(4), got packet $packet")
  }

  /** Run a statement, drain to EndOfStream — `conn.Exec`'s shape. */
  def exec(sql: String, settings: Map[String, String] = Map.empty): Unit = {
    query(sql, settings); ()
  }

  /** Run a query, return header + rows — `conn.Query`'s shape. */
  def query(sql: String,
      settings: Map[String, String] = Map.empty,
      params: Map[String, String] = Map.empty,
      queryId: String = ""): Result = {
    sendQuery(sql, settings, params, queryId)
    sendBlock(Nil, 0) // end of external data
    readResult()
  }

  /** STREAMING query: rows surface block by block as the server sends
    * them — the caller holds at most ONE decoded block, never the full
    * result (the `remote()` scan's 100 TB posture: a shard's stream is
    * bounded by the server's BlockRows framing, not its table size).
    * The iterator must be drained to EndOfStream (or the connection
    * closed) before the connection is reused. */
  def queryStream(sql: String,
      settings: Map[String, String] = Map.empty): Iterator[Seq[Any]] = {
    sendQuery(sql, settings)
    sendBlock(Nil, 0)
    new Iterator[Seq[Any]] {
      private var block: NativeBlock.DecodedBlock = _
      private var i = 0
      private var done = false
      private def advance(): Unit = {
        while (!done && (block == null || i >= block.rows)) {
          NativeWire.readVarUInt(in) match {
            case ServerData =>
              NativeWire.readString(in) // table name
              val src: ByteSource =
                if (compression) new FrameIn(in) else new StreamIn(in)
              block = NativeBlock.readBlock(src, revision)
              i = 0
            case ServerProgress => readProgress()
            case ServerProfileInfo => readProfileInfo()
            case ServerEndOfStream => done = true
            case ServerException => throw readException()
            case ServerTotals | ServerExtremes =>
              NativeWire.readString(in)
              val src: ByteSource =
                if (compression) new FrameIn(in) else new StreamIn(in)
              NativeBlock.readBlock(src, revision)
            case other => throw new IllegalStateException(
              s"unexpected server packet $other")
          }
        }
      }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): Seq[Any] = {
        if (!hasNext) throw new NoSuchElementException("stream drained")
        val r = block.cols.map(_.values(i))
        i += 1
        r
      }
    }
  }

  /** Fire a query without waiting — pair with [[cancel]] and
    * [[awaitResult]] (clickhouse-go's ctx-cancellation shape). */
  def queryAsync(sql: String,
      settings: Map[String, String] = Map.empty): Unit = {
    sendQuery(sql, settings)
    sendBlock(Nil, 0)
  }

  /** The Cancel packet — the server stops the running query's jobs and
    * answers EndOfStream. */
  def cancel(): Unit = {
    NativeWire.writeVarUInt(out, ClientCancel); out.flush()
  }

  def awaitResult(): Result = readResult()

  /** Query with an external temporary table shipped as a named Data
    * block before the end-of-external-data marker (CH's external-data
    * feature — the server registers it for this query's session). */
  def queryWithExternal(sql: String, tableName: String,
      cols: Seq[NativeBlock.Col]): Result = {
    sendQuery(sql, Map.empty)
    sendBlock(cols, cols.headOption.map(_.values.size).getOrElse(0), tableName)
    sendBlock(Nil, 0)
    readResult()
  }

  /** Native batch insert: opener + typed columns, like PrepareBatch.
    * Returns the server-sent header (the target's columns + types). */
  def insert(opener: String,
      blocks: Seq[Seq[NativeBlock.Col]]): Seq[(String, String)] =
    insertStream(opener, blocks.iterator)

  /** [[insert]] over a LAZY block iterator: blocks are built and sent
    * one at a time, so a caller streaming a large partition holds one
    * block on the heap, never the payload (`remote()` write-side
    * federation rides this from each executor task). */
  def insertStream(opener: String,
      blocks: Iterator[Seq[NativeBlock.Col]]): Seq[(String, String)] = {
    sendQuery(opener, Map.empty)
    // server answers the target header block first
    val packet = NativeWire.readVarUInt(in)
    if (packet == ServerException) throw readException()
    require(packet == ServerData, s"expected header Data(1), got $packet")
    NativeWire.readString(in) // table name
    val src: ByteSource =
      if (compression) new FrameIn(in) else new StreamIn(in)
    val header = NativeBlock.readBlock(src, revision)
    blocks.foreach { cols =>
      sendBlock(cols, cols.headOption.map(_.values.size).getOrElse(0))
    }
    sendBlock(Nil, 0)
    var done = false
    while (!done) {
      NativeWire.readVarUInt(in) match {
        case ServerEndOfStream => done = true
        case ServerProgress => readProgress()
        case ServerException => throw readException()
        case other => throw new IllegalStateException(
          s"unexpected packet $other during insert close")
      }
    }
    header.cols.map(c => (c.name, NativeBlock.renderType(c.t)))
  }

  /** Open an INSERT, stream `blocks`, then CANCEL instead of sending
    * the end-of-data marker — the mid-load abort path (clickhouse-go's
    * ctx cancellation during a batch send). Returns when the server
    * answers EndOfStream. */
  def insertCancelled(opener: String,
      blocks: Seq[Seq[NativeBlock.Col]]): Unit = {
    sendQuery(opener, Map.empty)
    val packet = NativeWire.readVarUInt(in)
    if (packet == ServerException) throw readException()
    require(packet == ServerData, s"expected header Data(1), got $packet")
    NativeWire.readString(in)
    val src: ByteSource =
      if (compression) new FrameIn(in) else new StreamIn(in)
    NativeBlock.readBlock(src, revision)
    blocks.foreach { cols =>
      sendBlock(cols, cols.headOption.map(_.values.size).getOrElse(0))
    }
    cancel()
    var done = false
    while (!done) {
      NativeWire.readVarUInt(in) match {
        case ServerEndOfStream => done = true
        case ServerProgress => readProgress()
        case ServerException => throw readException()
        case other => throw new IllegalStateException(
          s"unexpected packet $other after insert cancel")
      }
    }
  }

  /** Send just the Query frame — test harness hook for exercising the
    * external-data phase (blocks/cancel) step by step. */
  private[service] def sendQueryRaw(sql: String): Unit =
    sendQuery(sql, Map.empty)

  private def sendQuery(sql: String, settings: Map[String, String],
      params: Map[String, String] = Map.empty,
      queryId: String = ""): Unit = {
    val b = new WireOut
    b.writeVarUInt(ClientQuery)
    b.writeString(queryId) // empty = server-assigned
    if (revision >= MinRevisionWithClientInfo) {
      b.writeByte(1) // initial query
      b.writeString("") // initial user
      b.writeString("") // initial query id
      b.writeString("[::1]:0") // initial address
      if (revision >= MinProtocolWithInitialQueryStartTime)
        b.writeLongLE(0L)
      b.writeByte(1) // interface: TCP
      b.writeString("graft") // os user
      b.writeString("localhost") // hostname
      b.writeString("graft-native-client")
      b.writeVarUInt(1); b.writeVarUInt(0) // client version
      b.writeVarUInt(ServerRevision)
      if (revision >= MinRevisionWithQuotaKeyInClientInfo) b.writeString("")
      if (revision >= MinProtocolWithDistributedDepth) b.writeVarUInt(0)
      if (revision >= MinRevisionWithVersionPatch) b.writeVarUInt(0)
      if (revision >= MinRevisionWithOpenTelemetry) b.writeByte(0)
      if (revision >= MinRevisionWithParallelReplicas) {
        b.writeVarUInt(0); b.writeVarUInt(0); b.writeVarUInt(0)
      }
    }
    settings.foreach { case (k, v) =>
      b.writeString(k)
      b.writeVarUInt(0) // flags
      b.writeString(v)
    }
    b.writeString("") // end of settings
    if (revision >= MinRevisionWithInterserverSecret) b.writeString("")
    b.writeVarUInt(StageComplete)
    b.writeVarUInt(if (compression) 1L else 0L)
    b.writeString(sql)
    if (revision >= MinProtocolWithParameters) {
      params.foreach { case (k, v) =>
        b.writeString(k)
        b.writeVarUInt(0x02) // custom-serialized (string) flag
        b.writeString(v)
      }
      b.writeString("")
    }
    out.write(b.bytes); out.flush()
  }

  def sendBlock(cols: Seq[NativeBlock.Col], rows: Int,
      tableName: String = ""): Unit = {
    val b = new WireOut
    b.writeVarUInt(ClientData)
    b.writeString(tableName)
    val body = new WireOut
    NativeBlock.writeBlock(body, cols, rows, revision)
    out.write(b.bytes)
    if (compression) out.write(NativeWire.lz4Frame(body.bytes))
    else out.write(body.bytes)
    out.flush()
  }

  private def readResult(): Result = {
    var cols: Seq[String] = Nil
    var types: Seq[String] = Nil
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    var progressRows = 0L
    var dataBlocks = 0
    var done = false
    while (!done) {
      val packet = NativeWire.readVarUInt(in)
      packet match {
        case ServerData =>
          NativeWire.readString(in) // table name
          val src: ByteSource =
            if (compression) new FrameIn(in) else new StreamIn(in)
          val block = NativeBlock.readBlock(src, revision)
          if (cols.isEmpty && block.cols.nonEmpty) {
            cols = block.cols.map(_.name)
            types = block.cols.map(c => NativeBlock.renderType(c.t))
          }
          if (block.rows > 0) dataBlocks += 1
          var i = 0
          while (i < block.rows) {
            rows += block.cols.map(_.values(i))
            i += 1
          }
        case ServerProgress => progressRows += readProgress() // wire carries DELTAS (r16)
        case ServerProfileInfo => readProfileInfo()
        case ServerEndOfStream => done = true
        case ServerException => throw readException()
        case ServerTotals | ServerExtremes =>
          NativeWire.readString(in)
          val src: ByteSource =
            if (compression) new FrameIn(in) else new StreamIn(in)
          NativeBlock.readBlock(src, revision)
        case other => throw new IllegalStateException(
          s"unexpected server packet $other")
      }
    }
    Result(cols, types, rows.toSeq, progressRows, dataBlocks)
  }

  private def readProgress(): Long = {
    val src = new StreamIn(in)
    val rows = src.readVarUInt()
    src.readVarUInt() // bytes
    src.readVarUInt() // total rows
    if (revision >= MinRevisionWithClientWriteInfo) {
      src.readVarUInt(); src.readVarUInt()
    }
    if (revision >= MinProtocolWithServerQueryTime) src.readVarUInt()
    rows
  }

  private def readProfileInfo(): Unit = {
    val src = new StreamIn(in)
    src.readVarUInt(); src.readVarUInt(); src.readVarUInt()
    src.readByte(); src.readVarUInt(); src.readByte()
  }

  private def readException(): NativeClient.ServerSideException = {
    val src = new StreamIn(in)
    val code = src.readIntLE()
    val name = src.readString()
    val message = src.readString()
    val stack = src.readString()
    val nested = src.readByte()
    require(nested == 0, "nested exceptions not expected from this server")
    new NativeClient.ServerSideException(code, name, message, stack)
  }

  override def close(): Unit = {
    try out.flush() catch { case scala.util.control.NonFatal(_) => () }
    sock.close()
  }
}

object NativeClient {
  /** The server's Exception frame, decoded: code + name + message +
    * stack trace (CH's wire shape). */
  final class ServerSideException(
      val code: Int, val name: String, message: String,
      val stackTrace: String) extends RuntimeException(message)
}
