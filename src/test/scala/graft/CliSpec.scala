package graft

import graft.tick.{Cli, TaskRegistry}
import org.scalatest.funsuite.AnyFunSuite

/** The `kapacitor` CLI presentation layer (cmd/kapacitor/main.go). */
class CliSpec extends AnyFunSuite {

  test("Go RFC822 times in UTC, with the zero-time marker") {
    assert(Cli.rfc822(0L) === "01 Jan 01 00:00 UTC")
    assert(Cli.rfc822(1700000000000L) === "14 Nov 23 22:13 UTC")
    assert(Cli.rfc822(949363200000L) === "01 Feb 00 00:00 UTC")
  }

  test("Go Duration.String at nanosecond resolution") {
    import Cli.goDurationNs
    assert(goDurationNs(0L) === "0s")
    assert(goDurationNs(500L) === "500ns")
    assert(goDurationNs(1500L) === "1.5µs")
    assert(goDurationNs(100000000L) === "100ms")
    assert(goDurationNs(90L * 1000000000L) === "1m30s")
    assert(goDurationNs(3661L * 1000000000L + 500000000L) === "1h1m1.5s")
    assert(goDurationNs(300000000000L) === "5m0s")
    assert(goDurationNs(-1500000000L) === "-1.5s")
  }

  test("Go %v float rendering: plain under 1e6, e-notation with padded exponent") {
    import Cli.goFloatV
    assert(goFloatV(2.0) === "2")
    assert(goFloatV(0.5) === "0.5")
    assert(goFloatV(100000.0) === "100000")
    assert(goFloatV(1000000.0) === "1e+06")
    assert(goFloatV(1234567.0) === "1.234567e+06")
    assert(goFloatV(1e-7) === "1e-07")
    assert(goFloatV(0.0001) === "0.0001")
    assert(goFloatV(-2.5) === "-2.5")
    assert(goFloatV(1e21) === "1e+21")
  }

  test("dbrps %v and varListToStr") {
    assert(Cli.dbrpsStr(Nil) === "[]")
    assert(Cli.dbrpsStr(Seq(("telegraf", "autogen"), ("db", "rp"))) ===
      """["telegraf"."autogen" "db"."rp"]""")
    assert(Cli.varListToStr(Seq(("string", "cpu"), ("star", ""),
      ("string", "mem"))) === "[cpu, *, mem]")
  }

  test("show task renders the field lines, vars table, script, and DOT") {
    val reg = new TaskRegistry
    val script =
      """var warn float
        |stream
        |    |from()
        |        .measurement('m')
        |    |where(lambda: "value" < warn)
        |""".stripMargin
    reg.define("show1", script, Map("warn" -> 75.0))
    val out = Cli.showTask(reg, "show1").get
    val lines = out.linesIterator.toSeq
    assert(lines.head === "ID: show1")
    assert(lines(1) === "Error: ")
    assert(lines(2) === "Template: ")
    assert(lines(3) === "Type: stream")
    assert(lines(4) === "Status: disabled")
    assert(lines(5) === "Executing: false")
    assert(lines(6).startsWith("Created: ") && lines(6).endsWith(" UTC"))
    assert(lines(8) === "LastEnabled: 01 Jan 01 00:00 UTC")
    assert(lines(9) === "Databases Retention Policies: []")
    assert(lines(10) === "TICKscript:")
    // vars table: 30/10/40 padded columns
    val hdr = lines.indexWhere(_ == "Vars:")
    assert(hdr > 0)
    assert(lines(hdr + 1) ===
      "Name" + " " * 26 + "Type" + " " * 6 + "Value" + " " * 35)
    assert(lines(hdr + 2) ===
      "warn" + " " * 26 + "float" + " " * 5 + "75" + " " * 38)
    assert(out.contains("DOT:\ndigraph show1 {"))
    assert(Cli.showTask(reg, "nope").isEmpty)
  }

  test("list tasks table: dynamic ID width, fixed columns, id-sorted") {
    val reg = new TaskRegistry
    val script = "stream\n    |from()\n        .measurement('m')\n"
    reg.define("bbb-long-task-id", script)
    reg.define("aaa", script)
    val out = Cli.listTasksTable(reg)
    val lines = out.linesIterator.toSeq
    val w = "bbb-long-task-id".length + 1
    assert(lines.head ===
      Cli.pad("ID", w) + "Type      Status    Executing " +
        "Databases and Retention Policies")
    assert(lines(1).startsWith(Cli.pad("aaa", w) + "stream    disabled  false     []"))
    assert(lines(2).startsWith(Cli.pad("bbb-long-task-id", w) + "stream    disabled  false     []"))
  }

  test("topic, topic-handler, and topic-event documents") {
    import graft.tick.TickJson.{JInt, JStr}
    val t = Cli.topicJson("sys", "CRITICAL", 7L)
    assert(t.contains("\"href\": \"/kapacitor/v1/alerts/topics/sys\""))
    assert(t.contains("\"level\": \"CRITICAL\"") && t.contains("\"collected\": 7"))
    assert(t.contains("\"rel\": \"events\"") && t.contains(
      "\"href\": \"/kapacitor/v1/alerts/topics/sys/events\""))
    val h = Cli.topicHandlerJson("sys", "slack", "slack",
      Seq("channel" -> JStr("#alerts"), "attach" -> JInt(1)),
      matchExpr = "level() >= WARNING")
    assert(h.contains("\"href\": \"/kapacitor/v1/alerts/topics/sys/handlers/slack\""))
    // options map keys sort
    assert(h.indexOf("\"attach\"") < h.indexOf("\"channel\""))
    assert(h.contains("\"match\": \"level() \\u003e= WARNING\""))
    val e = Cli.topicEventJson("sys", "cpu", "cpu is high", "", 1700000000000L,
      90L * 1000000000L, "CRITICAL")
    assert(e.contains("\"time\": \"2023-11-14T22:13:20Z\""))
    assert(e.contains("\"duration\": \"1m30s\""))
  }

  test("recording/replay documents and list tables") {
    val rj = Cli.recordingJson("rec1", "stream", 1500L, 1700000000000L,
      status = "finished", progress = 1.0)
    assert(rj.contains("\"href\": \"/kapacitor/v1/recordings/rec1\""))
    assert(rj.contains("\"size\": 1500"))
    assert(rj.contains("\"date\": \"2023-11-14T22:13:20Z\""))
    assert(rj.contains("\"progress\": 1"))
    val pj = Cli.replayJson("rp1", "t1", "rec1", recordingTime = false,
      clock = "fast", dateMs = 1700000000000L)
    assert(pj.contains("\"recording-time\": false"))
    assert(pj.contains("\"clock\": \"fast\""))
    // Go omitempty never elides a struct: stats always present
    assert(pj.contains("\"stats\": {}"))

    val rt = Cli.listRecordingsTable(Seq(
      ("rec1", "stream", "finished", 1500L, 1700000000000L))).linesIterator.toSeq
    assert(rt.head === "ID   Type    Status    Size      Date" + " " * 19)
    assert(rt(1) === "rec1 stream  finished  1.5 kB    14 Nov 23 22:13 UTC" + " " * 4)
    val pt = Cli.listReplaysTable(Seq(
      ("rp1", "t1", "rec1", "finished", "fast", 1700000000000L))).linesIterator.toSeq
    assert(pt.head === "ID  Task Recording Status   Clock   Date" + " " * 19)
    assert(pt(1) === "rp1 t1   rec1      finished fast    14 Nov 23 22:13 UTC" + " " * 4)
  }

  test("stats general and ingress tables") {
    val g = Cli.statsGeneral("c1", "s1", "localhost", 5, 2, 3).linesIterator.toSeq
    assert(g.head === "ClusterID:" + " " * 20 + "c1" + " " * 28)
    assert(g(3) === "Tasks:" + " " * 24 + "5" + " " * 29)
    val i = Cli.statsIngress(Seq(
      ("telegraf", "autogen", "cpu", 1500L),
      ("_kapacitor", "autogen", "ingress", 12L))).linesIterator.toSeq
    // widths: db = max(8, len("_kapacitor")=10)+1 = 11; rp 17; m 12
    assert(i.head === "Database   Retention Policy Measurement " +
      "Points Received")
    // rows sort (db, rp, measurement); points right-aligned in 15
    assert(i(1) === "_kapacitor autogen          ingress     " +
      " " * 13 + "12")
    assert(i(2) === "telegraf   autogen          cpu         " +
      " " * 11 + "1500")
  }

  test("show topic: dynamic event/message widths, time-ascending rows") {
    val out = Cli.showTopic("sys", "CRITICAL", 7L, Seq("slack", "pd"),
      Seq(("cpu:serverA", "CRITICAL", "cpu is high", 1700000060000L),
        ("mem", "OK", "ok", 1700000000000L)))
    val lines = out.linesIterator.toSeq
    assert(lines.take(5) === Seq("ID: sys", "Level: CRITICAL",
      "Collected: 7", "Handlers: [slack, pd]", "Events:"))
    // widths: event = len("cpu:serverA")+1 = 12, message = len("cpu is high")+1 = 12
    assert(lines(5) === "Event       Level    Message     Date" + " " * 19)
    assert(lines(6).startsWith("mem         OK       ok          14 Nov 23 22:13 UTC"))
    assert(lines(7).startsWith("cpu:serverA CRITICAL cpu is high 14 Nov 23 22:14 UTC"))
    assert(Cli.showTopicHandler("h1", "sys", "slack", "level() >= WARNING",
      """{"channel":"#x"}""") ===
      "ID: h1\nTopic: sys\nKind: slack\nMatch: level() >= WARNING\n" +
        """Options: {"channel":"#x"}""" + "\n")
  }
}
