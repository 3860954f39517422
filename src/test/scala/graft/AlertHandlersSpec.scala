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
}
