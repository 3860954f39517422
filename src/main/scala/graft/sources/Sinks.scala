package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output connectors (reference §2.1 sinks): influxDBOut-style durable
  * writes, line-protocol serialization (the inverse of
  * [[LineProtocol.parse]]), and the httpPost payload formatter. Streaming
  * callers wrap these in `foreachBatch`; batch callers invoke directly —
  * the reference's point-at-a-time buffered writers (influxdb_out.go
  * writeBuffer) become micro-batch writes for free.
  */
object Sinks {

  /** influxDBOut-equivalent durable write: parquet partitioned by
    * (measurement, UTC day) — the layout that keeps 100 TB of points
    * pruneable by measurement + time-range at read time. Overrides mirror
    * the reference's .database()/.retentionPolicy()/.tag() options. */
  def influxOut(
      df: DataFrame,
      path: String,
      measurementCol: String = "measurement",
      timeCol: String = "time",
      extraTags: Map[String, String] = Map.empty): Unit = {
    val tagged = extraTags.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
    tagged
      .withColumn("__day", date_format(col(timeCol), "yyyy-MM-dd"))
      .write
      .mode("append")
      .partitionBy(measurementCol, "__day")
      .parquet(path)
  }

  /** The `influxDBOut().create()` DDL the reference issues at task start
    * (influxdb_out.go; integration expectations: `CREATE DATABASE db`,
    * `CREATE DATABASE db WITH NAME rp` — TestStream_InfluxDBOut_
    * CreateDatabase[AndRP], streamer_test.go:12577-12700). Identifiers
    * quote only when they are not bare InfluxQL idents, matching the
    * reference's QuoteIdent behavior on the same inputs. The statement
    * goes to whatever query transport the caller injects — for the
    * parquet-backed [[influxOut]] the "create" is a no-op (directories
    * appear on write), but a real InfluxDB target needs these bytes. */
  /** InfluxQL keyword tokens (public influxql token list): an identifier
    * that lexes as a keyword must be quoted even when it looks bare —
    * `CREATE DATABASE select` is invalid, `CREATE DATABASE "select"`
    * is not. */
  private val InfluxQLKeywords: Set[String] = Set(
    "ALL", "ALTER", "ANALYZE", "AND", "ANY", "AS", "ASC", "BEGIN", "BY",
    "CARDINALITY", "CREATE", "CONTINUOUS", "DATABASE", "DATABASES",
    "DEFAULT", "DELETE", "DESC", "DESTINATIONS", "DIAGNOSTICS", "DISTINCT",
    "DROP", "DURATION", "END", "EVERY", "EXACT", "EXPLAIN", "FIELD", "FOR",
    "FROM", "GRANT", "GRANTS", "GROUP", "GROUPS", "IN", "INF", "INSERT",
    "INTO", "KEY", "KEYS", "KILL", "LIMIT", "MEASUREMENT", "MEASUREMENTS",
    "NAME", "OFFSET", "ON", "OR", "ORDER", "PASSWORD", "POLICY", "POLICIES",
    "PRIVILEGES", "QUERIES", "QUERY", "READ", "REPLICATION", "RESAMPLE",
    "RETENTION", "REVOKE", "SELECT", "SERIES", "SET", "SHOW", "SHARD",
    "SHARDS", "SLIMIT", "SOFFSET", "STATS", "SUBSCRIPTION", "SUBSCRIPTIONS",
    "TAG", "TO", "USER", "USERS", "VALUES", "WHERE", "WITH", "WRITE",
    "TRUE", "FALSE")

  def createDatabaseStatement(db: String, rp: Option[String] = None): String = {
    // bare iff ASCII [A-Za-z_][A-Za-z0-9_]* AND not an InfluxQL keyword —
    // influxql.IdentNeedsQuotes semantics (Unicode "letters" like é are
    // NOT bare idents to the InfluxQL lexer, and keywords always quote)
    def firstOk(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
    def restOk(c: Char) = firstOk(c) || (c >= '0' && c <= '9')
    def ident(s: String): String = {
      val bare = s.nonEmpty && firstOk(s.head) && s.drop(1).forall(restOk) &&
        !InfluxQLKeywords.contains(s.toUpperCase(java.util.Locale.ROOT))
      if (bare) s else "\"" + s.replace("\"", "\\\"") + "\""
    }
    s"CREATE DATABASE ${ident(db)}" +
      rp.map(r => s" WITH NAME ${ident(r)}").getOrElse("")
  }

  /** Serialize rows to line protocol: `measurement,tags fields timeNs`.
    * Pure Catalyst (concat/escape), so the writer is codegen'd and
    * distributes like any projection. */
  def toLineProtocol(
      measurement: Column,
      tags: Seq[(String, Column)],
      fields: Seq[(String, Column)],
      timeNs: Column): Column = {
    def esc(c: Column): Column =
      regexp_replace(c.cast("string"), "([,= ])", "\\\\$1")
    val tagPart =
      if (tags.isEmpty) lit("")
      else concat(tags.map { case (k, v) => concat(lit(s",$k="), esc(v)) }: _*)
    val fieldPart = concat_ws(",",
      fields.map { case (k, v) => concat(lit(s"$k="), v.cast("string")) }: _*)
    concat(esc(measurement), tagPart, lit(" "), fieldPart, lit(" "), timeNs.cast("string"))
  }

  /** Line-protocol field VALUE for a typed column, wire-exact
    * (models/point.go marshal; round-trips through LineProtocol.parseLine):
    * integral → `42i`, string → quoted with `"`/`\` escaped, boolean →
    * true/false, float → plain decimal. Pass the result into
    * [[toLineProtocol]]'s fields — it keeps integer fields parseable as
    * int64 by InfluxDB (the reference writes count=10i, not count=10). */
  def lineFieldValue(df: DataFrame, name: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(name).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        concat(col(name).cast("string"), lit("i"))
      case StringType =>
        concat(lit("\""),
          regexp_replace(regexp_replace(col(name), "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
          lit("\""))
      case _ => col(name).cast("string")
    }
  }

  /** httpPost-equivalent payload batches: one JSON Result string per
    * micro-batch/partition-limited chunk, handed to a pluggable transport
    * (the reference's POST, here any String => Unit — tests inject a
    * recorder, production injects an HTTP client in foreachBatch). */
  def httpPost(
      df: DataFrame,
      name: String,
      tagCols: Seq[String],
      transport: String => Unit): Unit =
    transport(ResultRenderer.httpOutJson(df, name, tagCols))

  /** A real HTTP POST transport for [[httpPost]] with the reference's
    * timeout semantics (http_post.go timeout + services/httppost): a
    * slow endpoint is abandoned after `timeoutMs` and the error is
    * RETURNED (the reference logs it and keeps processing — a stalled
    * webhook must never stall the pipeline, TestBatch_HttpPost_Timeout).
    * Returns Right(status) or Left(error). */
  def httpTransport(url: String, headers: Seq[(String, String)] = Nil,
      timeoutMs: Int = 0): String => Either[String, Int] = body => {
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      if (timeoutMs > 0) { conn.setConnectTimeout(timeoutMs); conn.setReadTimeout(timeoutMs) }
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val out = conn.getOutputStream
      out.write(body.getBytes("UTF-8")); out.close()
      val code = conn.getResponseCode
      conn.disconnect()
      Right(code)
    } catch {
      case e: java.net.SocketTimeoutException => Left(s"httpPost timeout: ${e.getMessage}")
      case e: java.io.IOException => Left(s"httpPost failed: ${e.getMessage}")
    }
  }

  /** kapacitorLoopback-equivalent: re-inject an output frame into an
    * ingest location other pipelines read (reference
    * kapacitor_loopback.go; cycle detection is the caller's topology
    * concern, exactly as the reference validates at task start). */
  def loopback(df: DataFrame, ingestPath: String): Unit =
    df.write.mode("append").parquet(ingestPath)

  /** exec handler (reference services/alert/handlers.go:85-137): run a
    * command per alert event with the alert.Data JSON on stdin. The runner
    * is injectable (tests record; production uses [[runProcess]]); payloads
    * are computed distributed and the fan-out happens per partition on the
    * executors, so no event list ever sits on the driver. */
  def execAlert(
      payloads: DataFrame,
      payloadCol: String,
      prog: String,
      args: Seq[String],
      runner: (String, Seq[String], String) => Unit = runProcess): Unit =
    payloads.select(payloadCol).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach(r => runner(prog, args, r.getString(0)))
    }

  /** Real command execution for [[execAlert]]: stdin ← payload, like the
    * reference's commander (command.go Spec). */
  def runProcess(prog: String, args: Seq[String], payload: String): Unit = {
    val pb = new ProcessBuilder((prog +: args): _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val w = p.getOutputStream
    w.write(payload.getBytes("UTF-8")); w.close()
    p.waitFor()
  }

  /** tcp handler (reference services/alert/handlers.go:139-176): write the
    * alert.Data JSON + '\n' to a socket. One connection per partition (the
    * reference dials per event; batching writes per partition is the
    * at-scale choice — same bytes on the wire). */
  def tcpAlert(
      payloads: DataFrame,
      payloadCol: String,
      host: String,
      port: Int,
      send: (String, Int, Iterator[String]) => Unit = sendSocket): Unit =
    payloads.select(payloadCol).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) send(host, port, it.map(_.getString(0)))
    }

  /** Real socket transport for [[tcpAlert]]. */
  def sendSocket(host: String, port: Int, lines: Iterator[String]): Unit = {
    val sock = new java.net.Socket(host, port)
    try {
      val out = sock.getOutputStream
      lines.foreach { l => out.write(l.getBytes("UTF-8")); out.write('\n') }
      out.flush()
    } finally sock.close()
  }

  /** email handler (reference services/smtp): the MIME documents are
    * computed by [[graft.functions.AlertHandlers.emailMime]]; delivery is
    * the injected transport (an SMTP client in production — none ships in
    * this library, exactly like the reference requires a configured SMTP
    * server). */
  def emailAlert(
      payloads: DataFrame,
      mimeCol: String,
      send: String => Unit): Unit =
    payloads.select(mimeCol).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(r => send(r.getString(0)))
    }

  /** httppost RowTemplate rendering (reference services/httppost
    * Endpoint.RowTemplate, integration-pinned by
    * TestStream_HttpPostEndpoint_CustomBody): a Go template over one row —
    * `{{.Name}}`, `{{index .Tags "k"}}`, and a `{{range .Values}}…{{end}}`
    * block whose body may reference `{{index . "time"}}` (Go time.String
    * format) and `{{index . "<field>"}}`. A streaming point renders its
    * range over exactly one value row, so the whole template compiles to a
    * single codegen'd concat — no per-row template interpreter. */
  def rowTemplate(
      template: String,
      name: Column,
      tags: Map[String, Column],
      timeCol: Column,
      fields: Map[String, Column]): Column = {
    val goTime = date_format(timeCol, "yyyy-MM-dd HH:mm:ss '+0000 UTC'")
    val rangeRe = """(?s)\{\{\s*range \.Values\s*\}\}(.*?)\{\{\s*end\s*\}\}""".r
    def compilePart(part: String): Seq[Column] = {
      val actionRe = """\{\{\s*(?:\.(\w+)|index \.Tags "([^"]+)"|index \. "([^"]+)")\s*\}\}""".r
      val out = Seq.newBuilder[Column]
      var pos = 0
      actionRe.findAllMatchIn(part).foreach { m =>
        if (m.start > pos) out += lit(part.substring(pos, m.start))
        if (m.group(1) != null) m.group(1) match {
          case "Name" => out += name
          case other  => out += lit("") // unsupported scope var
        }
        else if (m.group(2) != null)
          out += coalesce(tags.getOrElse(m.group(2), lit(null)).cast("string"), lit(""))
        else m.group(3) match {
          case "time" => out += goTime
          case f      => out += coalesce(fields.getOrElse(f, lit(null)).cast("string"), lit(""))
        }
        pos = m.end
      }
      if (pos < part.length) out += lit(part.substring(pos))
      out.result()
    }
    val parts = Seq.newBuilder[Column]
    var pos = 0
    rangeRe.findAllMatchIn(template).foreach { m =>
      parts ++= compilePart(template.substring(pos, m.start))
      parts ++= compilePart(m.group(1)) // one value row per streamed point
      pos = m.end
    }
    if (pos < template.length) parts ++= compilePart(template.substring(pos))
    val ps = parts.result()
    if (ps.isEmpty) lit("") else concat(ps: _*)
  }
}
