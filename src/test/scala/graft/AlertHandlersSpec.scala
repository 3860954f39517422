package graft

import graft.functions.AlertHandlers
import org.apache.spark.sql.functions._

class AlertHandlersSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    ("cpu:a", "cpu:a is \"CRITICAL\"", "CRITICAL", 1000L, 60L),
    ("cpu:b", "cpu:b is OK", "OK", 2000L, 0L))
    .toDF("id", "message", "level", "time_us", "duration_us")

  test("webhook payload is valid JSON with escaped message") {
    val out = events.select(AlertHandlers.webhook(
      $"id", $"message", $"level", $"time_us", $"duration_us")).as[String].collect()
    assert(out(0) == """{"id":"cpu:a","message":"cpu:a is \"CRITICAL\"","level":"CRITICAL","time":1000,"duration":60}""")
  }

  test("slack payload colors by level") {
    val out = events.select(AlertHandlers.slack($"message", $"level", "#alerts")).as[String].collect()
    assert(out(0).contains("\"color\":\"danger\"") && out(0).startsWith("""{"channel":"#alerts""""))
    assert(out(1).contains("\"color\":\"good\""))
  }

  test("pagerduty resolves on OK and triggers otherwise") {
    val out = events.select(AlertHandlers.pagerduty($"id", $"message", $"level", "rk1")).as[String].collect()
    assert(out(0).contains("\"event_action\":\"trigger\"") && out(0).contains("\"severity\":\"critical\""))
    assert(out(1).contains("\"event_action\":\"resolve\""))
  }

  test("log line is tab-separated") {
    val out = events.select(AlertHandlers.logLine($"id", $"message", $"level", $"time_us")).as[String].head()
    assert(out == "1000\tCRITICAL\tcpu:a\tcpu:a is \"CRITICAL\"")
  }

  test("alertData is the canonical alert.Data document (types.go field order)") {
    val out = events.select(AlertHandlers.alertData(
      $"id", $"message", lit("details"), $"time_us", $"duration_us",
      $"level", lit("OK"), lit(true))).as[String].collect()
    assert(out(0) ==
      """{"id":"cpu:a","message":"cpu:a is \"CRITICAL\"","details":"details",""" +
      """"time":"1970-01-01T00:00:00Z","duration":60000,"level":"CRITICAL",""" +
      """"data":{},"previousLevel":"OK","recoverable":true}""")
    // a JSON parser agrees field-for-field
    val parsed = events.select(from_json(AlertHandlers.alertData(
      $"id", $"message", lit("d"), $"time_us", $"duration_us", $"level",
      lit("OK"), lit(true)),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id string, duration long, level string, recoverable boolean")).as("j"))
      .select("j.id", "j.duration", "j.level", "j.recoverable")
      .collect()
    assert(parsed(0).getString(0) == "cpu:a" && parsed(0).getLong(1) == 60000L &&
      parsed(0).getString(2) == "CRITICAL" && parsed(0).getBoolean(3))
  }

  test("emailMime wraps subject=message body=details") {
    val out = events.select(AlertHandlers.emailMime(
      "ops@example.com", "kapacitor@example.com", $"message", lit("<b>details</b>")))
      .as[String].head()
    assert(out.startsWith("From: kapacitor@example.com\r\nTo: ops@example.com\r\nSubject: cpu:a is \"CRITICAL\"\r\n"))
    assert(out.endsWith("\r\n\r\n<b>details</b>"))
  }
}
