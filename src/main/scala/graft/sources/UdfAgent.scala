package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}

import graft.sources.UdfProto._

/** Agent-SIDE library — the counterpart of the reference's
  * `udf/agent/agent.go` (and its Python twin): implement [[Handler]],
  * call [[UdfAgent.run]] from a `main`, and the process is a
  * wire-compatible UDF agent any reference server — or this library's
  * [[UdfProto]] runner — can drive over stdin/stdout. The loop reads
  * varint-framed `Request` messages, dispatches, and writes `Response`
  * messages; keepalives echo automatically (agent.go answers them in its
  * read loop without involving the handler).
  *
  * STREAM-edge agents implement [[Handler.point]]; BATCH-edge agents
  * additionally override [[Handler.info]] to declare BATCH edges and
  * [[Handler.beginBatch]]/[[Handler.endBatch]] for the batch lifecycle
  * (batch points between the markers still arrive via `point`). Stateful
  * agents may override [[Handler.snapshot]]/[[Handler.restore]] — the
  * server half drives the RPC pair via `restoreSnapshot`/`onSnapshot`
  * on the UdfProto runners.
  *
  * A handler that throws ends the loop with an `ErrorResponse` carrying
  * the message — the reference's contract for surfacing agent failure
  * (the server terminates the process on receipt, udf.proto:133-137).
  */
object UdfAgent {

  /** EdgeType (udf.proto:46-49). */
  val Stream = UdfProto.EdgeStream
  val Batch = UdfProto.EdgeBatch

  /** Response emitter handed to batch lifecycle callbacks: a batch
    * handler replies with its own BeginBatch/Point/EndBatch frames (or
    * plain points for a BATCH→STREAM agent). */
  trait Emit {
    def point(p: ProtoPoint): Unit
    def beginBatch(b: ProtoBeginBatch): Unit
    def endBatch(e: ProtoEndBatch): Unit
  }

  trait Handler {
    /** (wants, provides) — default STREAM→STREAM. */
    def info(): (Int, Int) = (Stream, Stream)
    /** Declared option signatures (InfoResponse.options: name → expected
      * OptVal.typeId per arg, udf.proto OptionInfo). Declaring them buys
      * define-time validation on the server half (unknown name / arg
      * count / arg type fail the handshake with the reference's
      * pipeline/udf.go errors); the empty default keeps options
      * unvalidated. */
    def declaredOptions(): Map[String, Seq[Int]] = Map.empty
    /** Left(error) fails init. */
    def init(options: Seq[(String, Seq[OptVal])], taskId: String,
        nodeId: String): Either[String, Unit] = Right(())
    /** One point in; emit 0..N points out. */
    def point(p: ProtoPoint, emit: ProtoPoint => Unit): Unit
    /** Batch lifecycle for BATCH-wants agents (udf.proto BeginBatch);
      * batch points between the markers arrive via [[point]]. */
    def beginBatch(b: ProtoBeginBatch, emit: Emit): Unit =
      throw new UnsupportedOperationException(
        "batch-edge framing not supported by this STREAM agent")
    def endBatch(e: ProtoEndBatch, emit: Emit): Unit =
      throw new UnsupportedOperationException(
        "batch-edge framing not supported by this STREAM agent")
    def snapshot(): Array[Byte] = Array.emptyByteArray
    def restore(snapshot: Array[Byte]): Either[String, Unit] =
      Left("restore not implemented")
  }

  /** Socket-server mode — the reference agent library's accept loop
    * (agent.go Server over a unix listener; the daemon side of a
    * `[udf.functions.x] socket = "/path"` config): bind a unix-domain
    * socket, serve EACH connection with a FRESH handler from
    * `newHandler` on its own daemon thread (connections are independent
    * protocol sessions), until the returned handle is closed. A server
    * outlives any one task — the long-running deployment shape, vs the
    * child-per-partition `run` over stdio. */
  def serveSocket(path: java.nio.file.Path, newHandler: () => Handler): AutoCloseable = {
    import java.nio.channels.{Channels, ServerSocketChannel}
    java.nio.file.Files.deleteIfExists(path)
    val server = ServerSocketChannel.open(java.net.StandardProtocolFamily.UNIX)
    server.bind(java.net.UnixDomainSocketAddress.of(path))
    @volatile var closed = false
    val acceptor = new Thread(() => {
      try {
        while (!closed) {
          val ch = server.accept()
          val session = new Thread(() => {
            try run(newHandler(), Channels.newInputStream(ch), Channels.newOutputStream(ch))
            catch { case _: Throwable => () } // a broken session ends itself only
            finally {
              try ch.close() catch { case _: java.io.IOException => () }
            }
          }, "graft-udfagent-session")
          session.setDaemon(true)
          session.start()
        }
      } catch {
        case _: java.nio.channels.ClosedChannelException => () // close() racing accept()
        case _: java.nio.channels.AsynchronousCloseException => ()
      }
    }, "graft-udfagent-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    () => {
      closed = true
      try server.close() catch { case _: java.io.IOException => () }
      java.nio.file.Files.deleteIfExists(path)
      ()
    }
  }

  /** Drive the agent loop until stdin EOF. Synchronous single-thread
    * (the reference agent's read loop shape); responses flush per
    * message so a 1:1 server never stalls on pipe buffers. */
  def run(handler: Handler, in0: InputStream, out0: OutputStream): Unit = {
    val in = new BufferedInputStream(in0)
    val out = new BufferedOutputStream(out0)
    def send(msg: Array[Byte]): Unit = { writeFramed(out, msg); out.flush() }
    val emitter = new Emit {
      def point(p: ProtoPoint): Unit = send(encodeResponsePoint(p))
      def beginBatch(b: ProtoBeginBatch): Unit = send(encodeResponseBegin(b))
      def endBatch(e: ProtoEndBatch): Unit = send(encodeResponseEnd(e))
    }
    try {
      var eof = false
      while (!eof) {
        // readFrameBytes bounds the declared length — a corrupt varint is
        // a framing error, not an allocation
        readFrameBytes(in) match {
          case None => eof = true
          case Some(buf) =>
            decodeRequest(buf) match {
              case QInfo =>
                val (w, p) = handler.info()
                send(encodeResponseInfo(w, p, handler.declaredOptions()))
              case QInit(opts, task, node) =>
                handler.init(opts, task, node) match {
                  case Right(_) => send(encodeResponseInit(success = true, ""))
                  case Left(e)  => send(encodeResponseInit(success = false, e))
                }
              case QKeepalive(t) => send(encodeResponseKeepalive(t))
              case QSnapshot     => send(encodeResponseSnapshot(handler.snapshot()))
              case QRestore(s) =>
                handler.restore(s) match {
                  case Right(_) => send(encodeResponseRestore(success = true, ""))
                  case Left(e)  => send(encodeResponseRestore(success = false, e))
                }
              case QPoint(p) =>
                handler.point(p, emitter.point)
              case QBegin(b) => handler.beginBatch(b, emitter)
              case QEnd(e)   => handler.endBatch(e, emitter)
            }
        }
      }
    } catch {
      case t: Throwable =>
        try send(encodeResponseError(
          Option(t.getMessage).getOrElse(t.getClass.getSimpleName)))
        catch { case _: java.io.IOException => () }
        throw t
    }
  }
}
