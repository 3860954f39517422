package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tick.TickJson
import graft.tick.TickJson._

/** Per-node-type coverage of the task JSON surface: every marshalable
  * node type serializes with its reference field set (pipeline/&#42;.go
  * struct order + constructor defaults) and survives the
  * unmarshal→remarshal canonicalization as a fixpoint. */
class TickJsonNodesSpec extends AnyFunSuite {

  /** Marshal must be a remarshal fixpoint (the law Go's own
    * Unmarshal/Marshal pair obeys structurally). */
  private def fix(script: String): String = {
    val m = TickJson.marshal(script)
    assert(TickJson.remarshal(m) === m, s"not a fixpoint:\n$m")
    m
  }

  private def nodeOf(m: String, typ: String): Seq[(String, JV)] = {
    val JObj(root) = TickJson.parseJson(m): @unchecked
    val JArr(nodes) = root.find(_._1 == "nodes").get._2: @unchecked
    nodes.collectFirst {
      case JObj(fs) if fs.contains(("typeOf", JStr(typ))) => fs
    }.getOrElse(fail(s"no $typ node in:\n$m"))
  }
  private def fieldNames(fs: Seq[(String, JV)]): Seq[String] = fs.map(_._1)
  private def v(fs: Seq[(String, JV)], k: String): JV =
    fs.find(_._1 == k).getOrElse(fail(s"missing $k"))._2

  test("batch query node: field order, group-by time(), fill, schedule durations") {
    val m = fix("""
      batch
        |query('SELECT mean(value) FROM "db"."rp".m')
          .period(10m)
          .every(5m)
          .offset(1h)
          .align()
          .alignGroup()
          .cron('0 * * * *')
          .groupBy(time(2m), 'host')
          .fill(0)
          .cluster('east')
        |httpOut('q')""")
    val q = nodeOf(m, "query")
    assert(fieldNames(q) === Seq("typeOf", "id", "queryStr", "align", "cron",
      "alignGroup", "groupBy", "groupByMeasurement", "fill", "cluster",
      "period", "every", "offset"))
    assert(v(q, "period") === JStr("10m"))
    assert(v(q, "offset") === JStr("1h"))
    assert(v(q, "fill") === JInt(0))
    val JArr(dims) = v(q, "groupBy"): @unchecked
    // time(2m) renders as an ast func node (args + functionType, no name
    // — the reference quirk), 'host' as a bare string
    assert(dims(1) === JStr("host"))
    val JObj(fn) = dims(0): @unchecked
    assert(fn.map(_._1) === Seq("args", "functionType", "typeOf"))
    assert(v(fn, "typeOf") === JStr("func"))
  }

  test("window count variant and barrier delete omitempty") {
    val m = fix("""
      stream
        |from().measurement('m')
        |barrier().idle(30s).delete(TRUE)
        |window().periodCount(100).everyCount(10)
        |httpOut('w')""")
    val w = nodeOf(m, "window")
    assert(v(w, "periodCount") === JInt(100))
    assert(v(w, "period") === JStr("0s"))
    val b = nodeOf(m, "barrier")
    // delete is omitempty: present (first) only when true; period/idle
    // are the shadow-appended duration strings
    assert(fieldNames(b) === Seq("typeOf", "id", "delete", "period", "idle"))
    assert(v(b, "idle") === JStr("30s"))
    // without .delete() the field is absent entirely
    val m2 = fix("stream\n|from()\n|barrier().period(10s)\n|httpOut('w')")
    assert(fieldNames(nodeOf(m2, "barrier")) === Seq("typeOf", "id", "period", "idle"))
  }

  test("influxql family: args quirks (elapsed null, top order, holtWinters fit)") {
    val m = fix("""
      stream
        |from()
        |window().period(10s).every(10s)
        |percentile('value', 95.0)
        |httpOut('p')""")
    val p = nodeOf(m, "percentile")
    assert(fieldNames(p) === Seq("typeOf", "id", "field", "as", "usePointTimes", "args"))
    assert(v(p, "as") === JStr("percentile"))
    // Go writes 95.0 as the bytes "95", which read back integral
    assert(v(p, "args") === JArr(Seq(JInt(95))))

    val m2 = fix("stream\n|from()\n|elapsed('value', 1ms)\n|httpOut('e')")
    // the reference never sets Args for elapsed — faithful null
    assert(v(nodeOf(m2, "elapsed"), "args") === JNull)

    val m3 = fix("stream\n|from()\n|window().period(10s).every(10s)\n|top(3, 'value', 'host', 'dc')\n|httpOut('t')")
    val t = nodeOf(m3, "top")
    assert(v(t, "field") === JStr("value"))
    assert(v(t, "args") === JArr(Seq(JInt(3), JStr("host"), JStr("dc"))))

    val m4 = fix("stream\n|from()\n|window().period(10s).every(10s)\n|holtWintersWithFit('value', 10, 4, 1m)\n|httpOut('h')")
    val h = nodeOf(m4, "holtWinters") // WithFit folds onto holtWinters
    assert(v(h, "usePointTimes") === JBool(true))
    assert(v(h, "args") === JArr(Seq(JInt(10), JInt(4), JStr("1m"), JBool(true))))

    val m5 = fix("stream\n|from()\n|movingAverage('value', 5)\n|httpOut('ma')")
    assert(v(nodeOf(m5, "movingAverage"), "args") === JArr(Seq(JInt(5))))
  }

  test("join and union multi-parent topology") {
    val m = fix("""
      var a = stream
        |from().measurement('m1')
      var b = stream
        |from().measurement('m2')
      a
        |join(b)
          .as('l', 'r')
          .on('host')
          .tolerance(5s)
          .streamName('joined')
          .fill('none')
        |httpOut('j')
      a
        |union(b)
          .rename('u')
        |httpOut('u')""")
    val j = nodeOf(m, "join")
    assert(fieldNames(j) === Seq("typeOf", "id", "as", "on", "delimiter",
      "deleteAll", "streamName", "fill", "tolerance"))
    assert(v(j, "as") === JArr(Seq(JStr("l"), JStr("r"))))
    assert(v(j, "delimiter") === JStr("."))
    assert(v(j, "tolerance") === JStr("5s"))
    assert(v(j, "fill") === JStr("none"))
    val u = nodeOf(m, "union")
    assert(v(u, "rename") === JStr("u"))
    // join must carry two parent edges
    val JObj(root) = TickJson.parseJson(m): @unchecked
    val JArr(edges) = root.find(_._1 == "edges").get._2: @unchecked
    val jid = j.collectFirst { case ("id", JStr(i)) => i }.get
    assert(edges.count { case JObj(fs) => fs.contains(("child", JStr(jid))); case _ => false } === 2)
  }

  test("stats node: synthesized observer edge, align, source position") {
    val m = fix("""
      var data = stream
        |from().measurement('m')
        |httpOut('d')
      data
        |stats(10s)
          .align()
        |httpOut('s')""")
    val st = nodeOf(m, "stats")
    assert(fieldNames(st) === Seq("typeOf", "id", "align", "interval"))
    assert(v(st, "align") === JBool(true))
    assert(v(st, "interval") === JStr("10s"))
  }

  test("deadman macro expands to stats|derivative|alert with the service templates") {
    val m = TickJson.marshal(
      """
      var data = stream
        |from().measurement('m')
        |httpOut('d')
      data
        |deadman(100.0, 10s)""",
      deadman = TickJson.DeadmanConfig(
        id = "node 'NODE_NAME' in task '{{ .TaskName }}'",
        message = "{{ .ID }} is dead: INTERVAL"))
    assert(TickJson.remarshal(m) === m)
    val d = nodeOf(m, "derivative")
    assert(v(d, "field") === JStr("emitted"))
    assert(v(d, "as") === JStr("emitted"))
    assert(v(d, "nonNegative") === JBool(true))
    assert(v(d, "unit") === JStr("10s"))
    val a = nodeOf(m, "alert")
    // NODE_NAME resolves to the observed node's name; INTERVAL renders
    // GO-style (time.Duration.String), not influxql-style
    assert(v(a, "alertId") === JStr("node 'http_out2' in task '{{ .TaskName }}'"))
    assert(v(a, "message") === JStr("{{ .ID }} is dead: 10s"))
    // crit: "emitted" <= 100 (float threshold)
    val JObj(crit) = v(a, "crit"): @unchecked
    val JObj(expr) = crit.find(_._1 == "expression").get._2: @unchecked
    assert(expr.collectFirst { case ("operator", JStr(o)) => o }.get === "<=".replace("<", "<"))
  }

  test("alert handlers: multiple kinds with chained sub-properties") {
    val m = fix("""
      stream
        |from().measurement('m')
        |alert()
          .crit(lambda: "v" > 10)
          .slack()
            .channel('#ops')
            .username('kapa')
          .email('a@b.c', 'd@e.f')
          .exec('/bin/notify', 'arg1')
          .tcp('localhost:7777')
          .log('/var/log/alerts.log')
            .mode(420)
          .post('http://h1').captureResponse().timeout(5s)
          .mqtt('alerts/topic')
            .qos(2)
            .retained()
          .snmpTrap('1.3.6.1')
            .data('1.3.6.1.2', 's', '{{ .Level }}')
          .inhibit('other', 'host')""")
    val a = nodeOf(m, "alert")
    val JArr(Seq(JObj(slack))) = v(a, "slack"): @unchecked
    assert(slack.map(_._1) === Seq("workspace", "channel", "username", "iconEmoji"))
    assert(slack.contains(("channel", JStr("#ops"))))
    val JArr(Seq(JObj(email))) = v(a, "email"): @unchecked
    assert(email.head === ("to", JArr(Seq(JStr("a@b.c"), JStr("d@e.f")))))
    val JArr(Seq(JObj(exec))) = v(a, "exec"): @unchecked
    assert(exec === Seq("command" -> JArr(Seq(JStr("/bin/notify"), JStr("arg1")))))
    val JArr(Seq(JObj(log))) = v(a, "log"): @unchecked
    assert(log === Seq("filePath" -> JStr("/var/log/alerts.log"), "mode" -> JInt(420)))
    val JArr(Seq(JObj(post))) = v(a, "post"): @unchecked
    assert(post.contains(("captureResponse", JBool(true))))
    assert(post.contains(("timeout", JInt(5000000000L)))) // nanos int, not a string
    val JArr(Seq(JObj(mqtt))) = v(a, "mqtt"): @unchecked
    assert(mqtt === Seq("brokerName" -> JStr(""), "topic" -> JStr("alerts/topic"),
      "qos" -> JInt(2), "retained" -> JBool(true)))
    val JArr(Seq(JObj(snmp))) = v(a, "snmpTrap"): @unchecked
    assert(v(snmp, "data") === JArr(Seq(JObj(Seq(
      "oid" -> JStr("1.3.6.1.2"), "type" -> JStr("s"), "value" -> JStr("{{ .Level }}"))))))
    assert(v(a, "inhibitors") === JArr(Seq(JObj(Seq(
      "category" -> JStr("other"), "equalTags" -> JArr(Seq(JStr("host"))))))))
  }

  test("autoscale nodes: k8s defaults, swarm, ec2 raw-Go quirk") {
    val m = fix("""
      stream
        |from().measurement('m')
        |k8sAutoscale()
          .resourceName('app')
          .replicas(lambda: int("desired"))
        |httpOut('k')""")
    val k = nodeOf(m, "k8sAutoscale")
    assert(v(k, "kind") === JStr("deployments"))
    assert(v(k, "min") === JInt(1))
    assert(v(k, "namespaceTag") === JStr("namespace"))
    assert(fieldNames(k).takeRight(2) === Seq("increaseCooldown", "decreaseCooldown"))

    val m2 = fix("""
      stream
        |from().measurement('m')
        |swarmAutoscale()
          .serviceName('svc')
          .replicas(lambda: int("desired"))
        |httpOut('s')""")
    assert(v(nodeOf(m2, "swarmAutoscale"), "min") === JInt(1))

    // ec2Autoscale has no custom marshal in the reference: Go field
    // names, nano durations, NO typeOf/id — and therefore cannot
    // round-trip (the reference's json.go has no entry for it either)
    val m3 = TickJson.marshal("""
      stream
        |from().measurement('m')
        |ec2Autoscale()
          .groupName('g')
          .replicas(lambda: int("desired"))
          .increaseCooldown(1m)
        |httpOut('e')""")
    assert(m3.contains("\"GroupName\": \"g\""))
    assert(m3.contains("\"IncreaseCooldown\": 60000000000"))
    assert(!m3.contains("\"typeOf\": \"ec2Autoscale\""))
  }

  test("sideload, httpPost, kapacitorLoopback, log, shift, sample, flatten, combine") {
    val m = fix("""
      stream
        |from().measurement('m')
        |shift(-10s)
        |sample(1m)
        |flatten().on('host', 'port').delimiter('_').dropOriginalFieldName()
        |sideload()
          .source('file:///tmp/sl')
          .order('host/{{.host}}.yml')
          .field('f', 1)
          .tag('t', 'x')
        |log().level('DEBUG').prefix('p')
        |httpPost('http://a', 'http://b')
          .endpoint('ep')
          .header('k', 'v')
          .codeField('code')
          .timeout(3s)
        |kapacitorLoopback()
          .database('db')
          .retentionPolicy('rp')
          .measurement('m2')
          .tag('lt', 'lv')""")
    assert(v(nodeOf(m, "shift"), "shift") === JStr("-10s"))
    val sm = nodeOf(m, "sample")
    assert(v(sm, "n") === JInt(0)); assert(v(sm, "duration") === JStr("1m"))
    val fl = nodeOf(m, "flatten")
    assert(v(fl, "on") === JArr(Seq(JStr("host"), JStr("port"))))
    assert(v(fl, "delimiter") === JStr("_"))
    assert(v(fl, "dropOriginalFieldName") === JBool(true))
    val sl = nodeOf(m, "sideload")
    assert(v(sl, "fields") === JObj(Seq("f" -> JInt(1))))
    val hp = nodeOf(m, "httpPost")
    assert(v(hp, "endpoints") === JArr(Seq(JStr("ep"))))
    assert(v(hp, "urls") === JArr(Seq(JStr("http://a"), JStr("http://b"))))
    assert(v(hp, "timeout") === JStr("3s")) // node-level timeout IS a shadow duration string
    val kl = nodeOf(m, "kapacitorLoopback")
    assert(fieldNames(kl) === Seq("typeOf", "id", "database", "retention_policy",
      "measurement", "tags"))
    val lg = nodeOf(m, "log")
    assert(v(lg, "level") === JStr("DEBUG"))

    val m2 = fix("""
      stream
        |from().measurement('m')
        |combine(lambda: "t" == 'a', lambda: "t" == 'b')
          .as('a', 'b')
          .max(100)
          .tolerance(2s)
        |httpOut('c')""")
    val cb = nodeOf(m2, "combine")
    assert(fieldNames(cb) === Seq("typeOf", "id", "lambdas", "as", "delimiter",
      "max", "tolerance"))
    assert(v(cb, "max") === JInt(100))
    // default max is 1e6 (defaultMaxCombinations)
    val m3 = fix("stream\n|from()\n|combine(lambda: TRUE, lambda: TRUE).as('x','y')\n|httpOut('c')")
    assert(v(nodeOf(m3, "combine"), "max") === JInt(1000000))
  }

  test("where node, groupBy node with star and exclude, stateDuration/stateCount, default/delete") {
    val m = fix("""
      stream
        |from().measurement('m')
        |where(lambda: "host" == 'a')
        |groupBy(*)
          .exclude('dc')
        |default().field('f', 0.0).tag('t', 'd')
        |delete().field('junk').tag('jt')
        |stateDuration(lambda: "v" > 5).unit(1m).as('dur')
        |stateCount(lambda: "v" > 5)
        |httpOut('x')""")
    val wh = nodeOf(m, "where")
    val JObj(lam) = v(wh, "lambda"): @unchecked
    assert(lam.map(_._1) === Seq("expression", "typeOf"))
    val gb = nodeOf(m, "groupBy")
    assert(v(gb, "dimensions") === JArr(Seq(JObj(Seq("typeOf" -> JStr("star"))))))
    assert(v(gb, "exclude") === JArr(Seq(JStr("dc"))))
    val df = nodeOf(m, "default")
    assert(v(df, "fields") === JObj(Seq("f" -> JInt(0)))) // 0.0 writes as "0"
    assert(v(df, "tags") === JObj(Seq("t" -> JStr("d"))))
    val dl = nodeOf(m, "delete")
    assert(v(dl, "fields") === JArr(Seq(JStr("junk"))))
    val sd = nodeOf(m, "stateDuration")
    assert(v(sd, "as") === JStr("dur")); assert(v(sd, "unit") === JStr("1m"))
    val sc = nodeOf(m, "stateCount")
    assert(v(sc, "as") === JStr("state_count"))
  }

  test("udf options carry types: duration, bool, int, double, string") {
    val m = fix("""
      stream
        |from().measurement('m')
        @myudf()
          .window(10m)
          .flag(TRUE)
          .size(8)
          .ratio(0.5)
          .name('x')
        |httpOut('u')""")
    val JObj(root) = TickJson.parseJson(m): @unchecked
    val JArr(nodes) = root.find(_._1 == "nodes").get._2: @unchecked
    val JObj(udf) = nodes.collectFirst {
      case o @ JObj(fs) if fs.contains(("typeOf", JStr("udf"))) => o }.get: @unchecked
    // whole-map marshal: keys sorted
    assert(udf.map(_._1) === udf.map(_._1).sorted)
    assert(udf.contains(("udfName", JStr("myudf"))))
    assert(udf.contains(("window", JArr(Seq(JStr("10m"))))))
    assert(udf.contains(("flag", JArr(Seq(JBool(true))))))
    assert(udf.contains(("size", JArr(Seq(JInt(8))))))
    assert(udf.contains(("ratio", JArr(Seq(JFloat(0.5))))))
  }

  test("float formatting follows Go encoding/json") {
    assert(TickJson.goFloat(0.0) === "0")
    assert(TickJson.goFloat(90.0) === "90")
    assert(TickJson.goFloat(0.5) === "0.5")
    assert(TickJson.goFloat(1.21) === "1.21")
    assert(TickJson.goFloat(-2.75) === "-2.75")
    assert(TickJson.goFloat(1e6) === "1000000")
    assert(TickJson.goFloat(1e-7) === "1e-7")
    assert(TickJson.goFloat(1e21) === "1e+21")
    assert(TickJson.goFloat(2.5e-8) === "2.5e-8")
  }

  test("influxql duration formatting") {
    assert(formatDuration(0L) === "0s")
    assert(formatDuration(1000000000L) === "1s")
    assert(formatDuration(90L * 1000000000L) === "90s")
    assert(formatDuration(60L * 1000000000L) === "1m")
    assert(formatDuration(3600L * 1000000000L) === "1h")
    assert(formatDuration(86400L * 1000000000L) === "1d")
    assert(formatDuration(604800L * 1000000000L) === "1w")
    assert(formatDuration(1500000000L) === "1500ms")
    assert(formatDuration(1500L) === "1500ns")
    assert(formatDuration(-3600L * 1000000000L) === "-1h")
  }
}
