package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Alert handler payload formatters (reference pipeline/alert.go:637-2544
  * and the services packages): the reference's 27 handlers are, at core,
  * JSON/text payload shapes pushed over a transport. Here each formatter is
  * a codegen'd Column producing the payload string; transport is the
  * caller's `foreachBatch` (see Sinks.httpPost) — the engine computes, the
  * sink delivers, and the formatter fan-out costs one projection, not one
  * goroutine per handler.
  */
object AlertHandlers {

  private def jsonStr(c: Column): Column =
    concat(lit("\""), regexp_replace(regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"), "\"", "\\\\\""), lit("\""))

  /** Generic webhook payload — the reference's httpPost/alert POST body
    * (id, message, level, time, duration). */
  def webhook(id: Column, message: Column, level: Column, timeUs: Column, durationUs: Column): Column =
    concat(
      lit("{\"id\":"), jsonStr(id),
      lit(",\"message\":"), jsonStr(message),
      lit(",\"level\":"), jsonStr(level),
      lit(",\"time\":"), timeUs.cast("string"),
      lit(",\"duration\":"), durationUs.cast("string"),
      lit("}"))

  /** Slack-style payload (services/slack): text + colored attachment by
    * level. */
  def slack(message: Column, level: Column, channel: String): Column = {
    val color = when(level === "CRITICAL", "danger")
      .when(level === "WARNING", "warning")
      .otherwise("good")
    concat(
      lit(s"""{"channel":"$channel","attachments":[{"fallback":"""),
      jsonStr(message), lit(",\"color\":"), jsonStr(color),
      lit(",\"text\":"), jsonStr(message), lit("}]}"))
  }

  /** PagerDuty-style event (services/pagerduty2): routing key + event
    * action trigger/resolve by level. */
  def pagerduty(id: Column, message: Column, level: Column, routingKey: String): Column = {
    val action = when(level === "OK", "resolve").otherwise("trigger")
    val severity = when(level === "CRITICAL", "critical")
      .when(level === "WARNING", "warning")
      .when(level === "INFO", "info")
      .otherwise("info")
    concat(
      lit(s"""{"routing_key":"$routingKey","event_action":"""), jsonStr(action),
      lit(""","dedup_key":"""), jsonStr(id),
      lit(""","payload":{"summary":"""), jsonStr(message),
      lit(""","severity":"""), jsonStr(severity), lit("}}"))
  }

  /** Exec/log handler line (services/alert log handler): a flat
    * tab-separated record ready for a line sink. */
  def logLine(id: Column, message: Column, level: Column, timeUs: Column): Column =
    concat_ws("\t", timeUs.cast("string"), level, id, message)

  /** The canonical `alert.Data` JSON document (reference alert/types.go:
    * 183-193) — the payload the log, exec and tcp handlers all emit
    * (services/alert/handlers.go:69-176). Field order and encodings match
    * the Go struct: RFC3339 UTC time, duration in nanoseconds, levels as
    * their names. The nested `data` Result is the caller's pre-rendered
    * JSON (ResultRenderer.toJson) so the formatter stays one codegen'd
    * projection. */
  def alertData(
      id: Column, message: Column, details: Column, timeUs: Column,
      durationUs: Column, level: Column, previousLevel: Column,
      recoverable: Column, dataJson: Column = lit("{}")): Column =
    concat(
      lit("{\"id\":"), jsonStr(id),
      lit(",\"message\":"), jsonStr(message),
      lit(",\"details\":"), jsonStr(details),
      lit(",\"time\":"), jsonStr(date_format(
        timestamp_micros(timeUs.cast("long")), "yyyy-MM-dd'T'HH:mm:ss'Z'")),
      lit(",\"duration\":"), (durationUs.cast("long") * 1000L).cast("string"),
      lit(",\"level\":"), jsonStr(level),
      lit(",\"data\":"), dataJson,
      lit(",\"previousLevel\":"), jsonStr(previousLevel),
      lit(",\"recoverable\":"), recoverable.cast("boolean").cast("string"),
      lit("}"))

  /** Email handler message (services/smtp): a minimal RFC-822 document —
    * subject is the alert message, body the details, exactly the
    * reference's mapping (smtp service Handle → send(subject=message,
    * body=details)). */
  def emailMime(to: String, from: String, message: Column, details: Column): Column =
    concat(
      lit(s"From: $from\r\nTo: $to\r\nSubject: "), message,
      lit("\r\nMIME-Version: 1.0\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"),
      details)
}
