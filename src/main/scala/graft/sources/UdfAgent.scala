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
  * A handler that throws ends the loop with an `ErrorResponse` carrying
  * the message — the reference's contract for surfacing agent failure
  * (the server terminates the process on receipt, udf.proto:133-137).
  */
object UdfAgent {

  /** EdgeType (udf.proto:46-49). */
  val Stream = 0
  val Batch = 1

  trait Handler {
    /** (wants, provides) — default STREAM→STREAM. */
    def info(): (Int, Int) = (Stream, Stream)
    /** Left(error) fails init. */
    def init(options: Seq[(String, Seq[OptVal])], taskId: String,
        nodeId: String): Either[String, Unit] = Right(())
    /** One point in; emit 0..N points out. */
    def point(p: ProtoPoint, emit: ProtoPoint => Unit): Unit
    def snapshot(): Array[Byte] = Array.emptyByteArray
    def restore(snapshot: Array[Byte]): Either[String, Unit] =
      Left("restore not implemented")
  }

  /** Drive the agent loop until stdin EOF. Synchronous single-thread
    * (the reference agent's read loop shape); responses flush per
    * message so a 1:1 server never stalls on pipe buffers. */
  def run(handler: Handler, in0: InputStream, out0: OutputStream): Unit = {
    val in = new BufferedInputStream(in0)
    val out = new BufferedOutputStream(out0)
    def send(msg: Array[Byte]): Unit = { writeFramed(out, msg); out.flush() }
    try {
      var eof = false
      while (!eof) {
        val size = readUvarintOrEof(in)
        if (size < 0) eof = true
        else {
          val buf = new Array[Byte](size.toInt)
          var read = 0
          while (read < size) {
            val n = in.read(buf, read, size.toInt - read)
            if (n < 0) throw new java.io.EOFException(
              s"stream ended inside a $size-byte frame")
            read += n
          }
          decodeRequest(buf) match {
            case QInfo =>
              val (w, p) = handler.info()
              send(encodeResponseInfo(w, p))
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
              handler.point(p, pt => send(encodeResponsePoint(pt)))
            case _: QBegin | _: QEnd =>
              throw new UnsupportedOperationException(
                "batch-edge framing not supported by this STREAM agent")
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
