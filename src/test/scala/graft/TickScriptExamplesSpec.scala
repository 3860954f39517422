package graft

import graft.tick.TickScript
import org.apache.spark.sql.functions._

/** Smoke suite over the reference's `examples/` TICKscript corpus
  * (/root/reference/examples): every .tick file compiles VERBATIM against a
  * synthetic telegraf-shaped frame, exercising var-heavy scripts,
  * multi-sink chains, the deprecated dot-chaining syntax (scores and the
  * telegraf dirs' trailing `alert .log(...)`), template tasks with declared
  * vars, and the examples' InfluxQL query shapes (AS aliases, arithmetic
  * on aggregates, bare field lists, SELECT star).
  *
  * Non-goals, each pinned by an explicit test:
  *  - telegraf/generic_{stream,batch}_example.tick are sed-templates with
  *    `{placeholder}` holes — not valid TICKscript (the reference can't
  *    define them either);
  *  - *.yaml / *.json task definitions (load service wrappers, not DSL).
  */
class TickScriptExamplesSpec extends SparkSpec {
  import spark.implicits._

  private val root = "/root/reference/examples"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$root/$path")), "UTF-8")

  /** One wide telegraf-shaped frame: every measurement/tag/field the
    * corpus references, host-tagged, 2 hosts × 60 s. The `tags` map feeds
    * groupBy(*). */
  private lazy val telegraf = {
    val measurements = Seq("cpu", "mem", "system", "net", "netstat", "zookeeper",
      "disk", "net_udp_rcvbuferrors", "errors", "views", "scores", "cpu_usage_idle")
    val rows = for {
      m <- measurements
      host <- Seq("h1", "h2")
      t <- 0 until 60
    } yield {
      val v = (t % 17) + (if (host == "h1") 1.0 else 2.0)
      (m, new java.sql.Timestamp(t * 1000L), host, "cpu-total", "eth0", "/",
        "game1", s"p${t % 5}",
        90.0 - v, v, 40.0 + v, 10.0 + v, 1.5, 1000.0 * v, v, v, v, v,
        50.0 + v, 5.0 + v, 1e6 + v, v)
    }
    rows.toDF("measurement", "time", "host", "cpu", "interface", "path",
        "game", "player",
        "usage_idle", "usage_user", "used_percent", "free", "load1", "bytes_recv",
        "value", "err_in", "err_out", "drop_in",
        "drop_out", "tcp_established", "avg_latency", "approximate_data_size")
      .withColumn("tags", map(
        lit("host"), col("host"), lit("cpu"), col("cpu")))
      .withColumn("pid", monotonically_increasing_id())
  }

  private def compiles(path: String, vars: Map[String, Any] = Map.empty) = {
    val df = TickScript.compile(read(path), telegraf, idCol = Some("pid"),
      templateVars = vars)
    assert(df.columns.nonEmpty)
    df
  }

  // ---- nodes/tasks: one minimal script per node

  for (f <- Seq("alert", "batch", "combine", "default", "delete", "eval",
      "flatten", "groupby", "handle_loopback", "httpout", "httppost",
      "influxdbout", "join", "log", "loopback", "sample", "shift",
      "statecount", "stateduration", "stats", "stream", "union", "where",
      "window"))
    test(s"examples/nodes/tasks/$f.tick compiles verbatim") {
      compiles(s"nodes/tasks/$f.tick")
    }

  // ---- error_percent: batch queries + fill + join + eval + influxDBOut

  test("examples/error_percent/error_percent.tick compiles and joins batch sums") {
    val df = compiles("error_percent/error_percent.tick")
    // errors/views share the frame → value = err/(views+err) = 0.5 everywhere
    val vals = df.select("value").distinct().as[Double].collect().toSeq
    assert(vals == Seq(0.5))
  }

  // ---- load service tasks + templates

  test("examples/load/tasks compile verbatim (dbrp headers, topic fan-out, select *)") {
    compiles("load/tasks/cpu_alert.tick")
    compiles("load/tasks/post.tick")
    val raw = compiles("load/tasks/poll_cpu.tick") // select * → raw pass-through
    assert(raw.columns.contains("usage_idle"))
    val joined = compiles("load/tasks/join.tick")
    assert(Seq("mean_usage", "max_usage", "min_usage").forall(joined.columns.contains))
  }

  test("examples/load/templates compile with bound template vars") {
    // `var measurement string` etc. bind at definition time (reference
    // template tasks); the warn/crit lambdas bind as parsed expressions
    val gt80 = TickScript.EBin(">", TickScript.EField("mean"), TickScript.ELit(80.0))
    val gt90 = TickScript.EBin(">", TickScript.EField("mean"), TickScript.ELit(90.0))
    for (tpl <- Seq("load/templates/base_template.tick",
        "load/templates/implicit_template.tick")) {
      val df = compiles(tpl, vars = Map(
        "measurement" -> "cpu", "field" -> "usage_user",
        "warn" -> gt80, "crit" -> gt90))
      assert(df.columns.contains("level") && df.columns.contains("payload_slack"))
    }
  }

  // ---- scores: the deprecated dot-chaining syntax end-to-end

  test("examples/scores/top_scores.tick compiles verbatim (legacy dot chaining)") {
    val df = compiles("scores/top_scores.tick")
    // final chain: max.join(min) |eval(gap, topFirst, topLast)
    assert(Seq("gap", "topFirst", "topLast").forall(df.columns.contains))
  }

  // ---- telegraf alert corpus (stream + batch per plugin)

  for (f <- Seq("cpu/cpu_alert_stream", "cpu/cpu_alert_batch",
      "mem/mem_alert_stream", "mem/mem_alert_batch",
      "disk/disk_alert_stream", "disk/disk_alert_batch",
      "net/net_alert_stream", "net/net_alert_batch",
      "net/net_udp_buffer_overflow_alert",
      "netstat/netstat_alert_stream", "netstat/netstat_alert_batch",
      "zookeeper/zookeeper_latency_stream", "zookeeper/zookeeper_latency_batch",
      "zookeeper/zookeeper_data_size_stream", "zookeeper/zookeeper_data_size_batch"))
    test(s"examples/telegraf/$f.tick compiles verbatim") {
      val df = compiles(s"telegraf/$f.tick")
      assert(df.columns.contains("level"))
    }

  // ---- documented non-goals

  test("telegraf generic examples are sed-templates, not TICKscript (non-goal)") {
    // `var info = {info_level}` — `{` is not a DSL token; the reference
    // cannot define these either, they exist to be sed-filled
    for (f <- Seq("telegraf/generic_stream_example.tick",
        "telegraf/generic_batch_example.tick"))
      intercept[Exception](TickScript.compile(read(f), telegraf))
  }
}
