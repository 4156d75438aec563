package graft.service.native

/** Packet ids and revision feature gates of ClickHouse's native TCP
  * protocol — public protocol constants (ClickHouse
  * `Core/ProtocolDefines.h` / `Core/Protocol.h`; clickhouse-go
  * `lib/proto/const.go`, the client library the reference pins at
  * v2.10.1 in its go.mod).
  *
  * The server advertises the highest revision both sides speak:
  * `min(client hello revision, [[ServerRevision]])` — every
  * revision-gated field below is then keyed on that one negotiated
  * number on both sides of this implementation, which is the
  * fixed point of CH's own asymmetric gating (server gates its hello
  * tail on the client's revision, clients gate on the server's). */
object NativeProtocol {

  /** The revision clickhouse-go v2.10.x speaks
    * (DBMS_TCP_PROTOCOL_VERSION at that release). */
  val ServerRevision = 54460L

  // client → server packet ids
  val ClientHello = 0L
  val ClientQuery = 1L
  val ClientData = 2L
  val ClientCancel = 3L
  val ClientPing = 4L

  // server → client packet ids
  val ServerHello = 0L
  val ServerData = 1L
  val ServerException = 2L
  val ServerProgress = 3L
  val ServerPong = 4L
  val ServerEndOfStream = 5L
  val ServerProfileInfo = 6L
  val ServerTotals = 7L
  val ServerExtremes = 8L

  // query processing stage
  val StageComplete = 2L

  // revision feature gates (DBMS_MIN_* in ProtocolDefines.h)
  val MinRevisionWithClientInfo = 54032L
  val MinRevisionWithServerTimezone = 54058L
  val MinRevisionWithQuotaKeyInClientInfo = 54060L
  val MinRevisionWithServerDisplayName = 54372L
  val MinRevisionWithVersionPatch = 54401L
  val MinRevisionWithClientWriteInfo = 54420L
  val MinRevisionWithSettingsSerializedAsStrings = 54429L
  val MinRevisionWithInterserverSecret = 54441L
  val MinRevisionWithOpenTelemetry = 54442L
  val MinProtocolWithDistributedDepth = 54448L
  val MinProtocolWithInitialQueryStartTime = 54449L
  val MinRevisionWithParallelReplicas = 54453L
  val MinRevisionWithCustomSerialization = 54454L
  val MinProtocolWithAddendum = 54458L
  val MinProtocolWithParameters = 54459L
  val MinProtocolWithServerQueryTime = 54460L

  /** CH's TIMEOUT_EXCEEDED error code — the shape a deadline kill
    * reports (public error-code table, `ErrorCodes.cpp`). */
  val ErrTimeoutExceeded = 159
  /** Generic server-side failure (CH UNKNOWN_EXCEPTION=1002 /
    * analysis errors vary; one stable code keeps clients simple). */
  val ErrGeneric = 1002
  /** CH's AUTHENTICATION_FAILED (`ErrorCodes.cpp`) — sent instead of
    * ServerHello when configured credentials don't match. */
  val ErrAuthFailed = 516
}
