package graft.tick

import scala.collection.mutable
import graft.tick.TickJson._

/** The reverse compiler — pipeline JSON → TICKscript source — matching
  * the reference's `pipeline/tick` package (AST builder ast.go:19-118,
  * per-node Function builders, ast Format rendering). This is the leg
  * Chronograf uses to turn an edited task DAG back into a stored
  * TICKscript.
  *
  * Laws matched against pipeline/tick/&#42;_test.go expected scripts:
  *  - node visit order is the pipeline walk; a node becomes a
  *    `var <name> = …` declaration when it is observed by a stats node,
  *    has more than one child, or is not the FIRST parent of its only
  *    child; otherwise a single child continues the chain inline and a
  *    childless node ends a program statement (ast.go Link);
  *  - names are desc+id (`from1`, `http_out2`);
  *  - only non-zero properties render (Function.Dot skips zero values
  *    ARGUMENT-WISE; `.flapping` keeps zeros; post/tcp/exec/log/mqtt/
  *    snmpTrap keep the opening call even when all args are zero);
  *  - literal formats are the ast Format ones: strings single-quoted
  *    (`\'` escaping), durations influxql-style, floats with a forced
  *    `.0` when integral, octal ints with a leading `0` (the log-mode
  *    handler renders base-8 — alert.go:138-146), lists `[…]`, lambdas
  *    `lambda: <expr>` with minimal parens by precedence;
  *  - layout: chain calls at 4 spaces (`|fn()`, `@udf()`), properties
  *    at 8, statements separated by one blank line, trailing newline.
  *
  * Faithful quirks reproduced (all verifiable in the reference source):
  *  - alert `category` is never rendered (pipeline/tick/alert.go has no
  *    Dot for it), nor opsGenie2 recoveryAction/details;
  *  - a lambda FUNCTION's name does not survive JSON
  *    (ast.FunctionNode.MarshalJSON drops it), so a func call inside an
  *    unmarshaled lambda renders with an empty name — same data loss as
  *    the reference's unmarshal→render path;
  *  - swarmAutoscale renders `.serviceName(serviceNameTag)` and
  *    ec2Autoscale `.groupName(groupNameTag)` (upstream bugs in
  *    pipeline/tick/swarm_autoscale.go / ec2_autoscale.go — the tag
  *    field is passed to both properties).
  */
object TickGen {

  /** JSON → TICKscript. */
  def fromJson(json: String): String = generate(TickJson.unmarshal(json))

  /** The canonical TICKscript view of a script: marshal to the task
    * JSON and regenerate. Normalizes formatting, drops defaults, and
    * resolves template vars. */
  def canonical(script: String, templateVars: Map[String, Any] = Map.empty): String =
    fromJson(TickJson.marshal(script, templateVars))

  // ------------------------------------------------------------ naming

  private val descOf: Map[String, String] = Map(
    "influxdbOut" -> "influxdb_out", "httpOut" -> "http_out",
    "httpPost" -> "http_post", "kapacitorLoopback" -> "kapacitor_loopback",
    "stateDuration" -> "state_duration", "stateCount" -> "state_count",
    "k8sAutoscale" -> "k8s_autoscale", "swarmAutoscale" -> "swarm_autoscale",
    "groupBy" -> "groupby")

  private def nameOf(n: UnNode): String = {
    val desc = n.typeOf match {
      case "udf" => n.fields.collectFirst { case ("udfName", JStr(s)) => s }.getOrElse("udf")
      case t => descOf.getOrElse(t, t)
    }
    s"$desc${n.id}"
  }

  // ------------------------------------------------------- value forms

  private def qstr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def goFloatTick(d: Double): String = {
    val s = goFloat(d)
    if (s.contains('.') || s.contains('e')) s else s + ".0"
  }

  /** An influxql duration STRING from JSON back to its literal (it is
    * already the literal). */
  private def durLit(s: String): String = s

  private def nanosDur(n: Long): String = formatDuration(n)

  private def isZero(v: JV): Boolean = v match {
    case JNull => true
    case JStr("") => true
    case JStr("0s") => true // zero durations in shadow-string fields
    case JInt(0) => true
    case JFloat(0.0) => true
    case JBool(false) => true
    case JArr(vs) => vs.isEmpty
    case _ => false
  }

  /** A scalar JSON field value as a TICKscript literal. `dur` marks
    * duration-typed fields (strings already influxql, ints are nanos). */
  private def lit(v: JV, dur: Boolean = false): String = v match {
    case JStr(s) if dur => durLit(s)
    case JStr(s) => qstr(s)
    case JInt(n) if dur => nanosDur(n)
    case JInt(n) => n.toString
    case JFloat(d) => goFloatTick(d)
    case JBool(b) => if (b) "TRUE" else "FALSE"
    case o: JObj => astSource(o)
    case JArr(vs) => vs.map(lit(_)).mkString("[", ", ", "]")
    case JNull => "''"
  }

  // ---------------------------------------------- lambda ast rendering

  private def prec(op: String): Int = op match {
    case "OR" => 1
    case "AND" => 2
    case "==" | "!=" | "<" | ">" | "<=" | ">=" | "=~" | "!~" => 3
    case "+" | "-" => 4
    case "*" | "/" | "%" => 5
    case _ => 6
  }

  /** An ast JSON node (lambda bodies, groupBy star/func dims) to source
    * text (ast Format semantics, minimal parens by precedence — the
    * source's explicit parens are not marshaled). */
  def astSource(v: JV): String = v match {
    case JObj(fs) =>
      def f(k: String): Option[JV] = fs.find(_._1 == k).map(_._2)
      f("typeOf") match {
        case Some(JStr("lambda")) =>
          "lambda: " + astSource(f("expression").getOrElse(JNull))
        case Some(JStr("binary")) =>
          val op = f("operator").collect { case JStr(s) => s }.getOrElse("")
          val p = prec(op)
          def side(x: Option[JV], right: Boolean): String = x match {
            case Some(o @ JObj(ofs)) if ofs.contains(("typeOf", JStr("binary"))) =>
              val cop = ofs.collectFirst { case ("operator", JStr(s)) => s }.getOrElse("")
              val cp = prec(cop)
              val needs = cp < p || (cp == p && right)
              if (needs) s"(${astSource(o)})" else astSource(o)
            case Some(o) => astSource(o)
            case None => ""
          }
          s"${side(f("left"), right = false)} $op ${side(f("right"), right = true)}"
        case Some(JStr("unary")) =>
          val op = f("operator").collect { case JStr(s) => s }.getOrElse("-")
          val inner = f("node") match {
            case Some(o @ JObj(ofs)) if ofs.contains(("typeOf", JStr("binary"))) =>
              s"(${astSource(o)})"
            case Some(o) => astSource(o)
            case None => ""
          }
          s"$op$inner"
        case Some(JStr("reference")) =>
          "\"" + f("reference").collect { case JStr(s) => s }.getOrElse("") + "\""
        case Some(JStr("number")) =>
          val isInt = f("isint").contains(JBool(true))
          if (isInt) {
            val n = f("int64").collect { case JInt(i) => i }.getOrElse(0L)
            val base = f("base").collect { case JInt(b) => b }.getOrElse(10L)
            if (base == 8) "0" + java.lang.Long.toOctalString(n) else n.toString
          } else {
            val d = f("float64") match {
              case Some(JFloat(x)) => x
              case Some(JInt(x)) => x.toDouble
              case _ => 0.0
            }
            goFloatTick(d)
          }
        case Some(JStr("string")) =>
          qstr(f("literal").collect { case JStr(s) => s }.getOrElse(""))
        case Some(JStr("bool")) =>
          if (f("bool").contains(JBool(true))) "TRUE" else "FALSE"
        case Some(JStr("duration")) =>
          f("duration").collect { case JStr(s) => s }.getOrElse("0s")
        case Some(JStr("regex")) =>
          "/" + f("regex").collect { case JStr(s) => s }.getOrElse("")
            .replace("/", "\\/") + "/"
        case Some(JStr("star")) => "*"
        case Some(JStr("func")) =>
          // the function NAME did not survive JSON (faithful quirk)
          val as = f("args") match {
            case Some(JArr(vs)) => vs.map(astSource).mkString(", ")
            case _ => ""
          }
          s"($as)"
        case Some(JStr("identifier")) =>
          f("ident").collect { case JStr(s) => s }.getOrElse("")
        case Some(JStr("list")) =>
          f("nodes") match {
            case Some(JArr(vs)) => vs.map(astSource).mkString("[", ", ", "]")
            case _ => "[]"
          }
        case _ => lit(JObj(fs))
      }
    case other => lit(other)
  }

  // ------------------------------------------------- chain text builder

  /** One chain under construction: the accumulated statement text. */
  private final class Chain(var text: String) {
    /** `|fn(args)` — args individually skip zero values; the call
      * renders only if any arg survives or the arg list was empty. */
    def pipe(fn: String, args: Seq[String]): Chain = at("|", fn, args)
    def udf(fn: String, args: Seq[String]): Chain = at("@", fn, args)
    private def at(op: String, fn: String, args: Seq[String]): Chain = {
      text += s"\n    $op$fn(${args.mkString(", ")})"
      this
    }
    /** `.prop(args)` with zero args removed; skipped entirely when all
      * args were zero (Function.Dot). */
    def dot(name: String, args: JV*): Chain = {
      val kept = args.filterNot(isZero)
      if (kept.nonEmpty || args.isEmpty) rawDot(name, kept.map(a => lit(a)))
      else this
    }
    def dotDur(name: String, v: JV): Chain =
      if (isZero(v)) this else rawDot(name, Seq(lit(v, dur = true)))
    def dotIf(name: String, flag: JV): Chain =
      if (flag == JBool(true)) rawDot(name, Nil) else this
    /** keeps the call even when every arg is zero (DotRemoveZeroValue). */
    def dotKeep(name: String, args: JV*): Chain =
      rawDot(name, args.filterNot(isZero).map(lit(_)))
    /** keeps zero-valued args verbatim (DotZeroValueOK — flapping). */
    def dotZeroOK(name: String, args: JV*): Chain =
      rawDot(name, args.map(lit(_)))
    def rawDot(name: String, args: Seq[String]): Chain = {
      text += s"\n        .$name(${args.mkString(", ")})"
      this
    }
  }

  // ---------------------------------------------------------- generate

  private def generate(p: UnPipeline): String = {
    val byId = p.nodes.map(n => n.id -> n).toMap
    // pipeline walk order + real-children graph (see TickJson.remarshal)
    val isStats = (id: Long) => byId(id).typeOf == "stats"
    val realChildren: Map[Long, Seq[Long]] =
      p.edges.filterNot(e => isStats(e._2)).groupBy(_._1)
        .map { case (k, es) => k -> es.map(_._2).sorted }
    val srcs = p.nodes.filter(n => n.typeOf == "stream" || n.typeOf == "batch" ||
      n.typeOf == "stats").sortBy(_.id)
    val seen = mutable.Set.empty[Long]
    val order = mutable.ArrayBuffer.empty[Long]
    def visit(id: Long): Unit = if (!seen(id)) {
      seen += id; realChildren.getOrElse(id, Nil).foreach(visit); order += id
    }
    srcs.reverseIterator.foreach(n => visit(n.id))
    val walk = order.reverse.map(byId).toSeq

    // nodes observed by a stats node become vars (ast.go statSources)
    val statObserved: Set[Long] =
      p.nodes.filter(_.typeOf == "stats").flatMap(_.parents.headOption).toSet

    val exprs = mutable.Map.empty[Long, String] // node id → accumulated text or ident
    // statements keyed by their FINAL node's id: emitting in id order
    // regenerates the original creation order, so a reparse assigns the
    // SAME ids (the reference emits in walk order and is not id-stable
    // when a node fans out to multiple sinks; id order is elsewhere
    // identical to its walk order and makes canonical() a fixpoint)
    val statements = mutable.ArrayBuffer.empty[(Long, String)]

    def field(n: UnNode, k: String): JV =
      n.fields.find(_._1 == k).map(_._2).getOrElse(JNull)

    for (n <- walk) {
      val parentTexts = n.parents.map(exprs(_))
      val built: String = build(n, parentTexts, field(n, _))
      // Link (ast.go:51-80)
      val children = realChildren.getOrElse(n.id, Nil)
      val mkVar = statObserved(n.id) || children.size > 1 ||
        (children.size == 1 && byId(children.head).parents.headOption.exists(_ != n.id))
      if (mkVar) {
        statements += ((n.id, s"var ${nameOf(n)} = $built\n"))
        exprs(n.id) = nameOf(n)
      } else if (children.isEmpty) {
        statements += ((n.id, s"$built\n"))
      } else {
        exprs(n.id) = built
      }
    }
    statements.sortBy(_._1).map(_._2).mkString("\n")
  }

  // ---------------------------------------------- per-node builders

  private def strs(v: JV): Seq[JV] = v match {
    case JArr(vs) => vs
    case JNull => Nil
    case other => Seq(other)
  }

  private def build(n: UnNode, parents: Seq[String], f: String => JV): String = {
    val c = new Chain(parents.headOption.getOrElse(""))
    n.typeOf match {
      case "stream" => return "stream"
      case "batch" => return "batch"
      case "from" =>
        c.pipe("from", Nil)
          .dot("database", f("database"))
          .dot("retentionPolicy", f("retentionPolicy"))
          .dot("measurement", f("measurement"))
          .dotIf("groupByMeasurement", f("groupByMeasurement"))
          .dotDur("round", f("round"))
          .dotDur("truncate", f("truncate"))
          .dot("where", f("where"))
        val dims = strs(f("groupBy"))
        if (dims.nonEmpty) c.rawDot("groupBy", dims.map(d => lit(d)))
      case "query" =>
        c.pipe("query", Seq(lit(f("queryStr"))).filterNot(_ == "''"))
          .dotDur("period", f("period"))
          .dotDur("every", f("every"))
          .dotIf("align", f("align"))
          .dot("cron", f("cron"))
          .dotDur("offset", f("offset"))
          .dotIf("alignGroup", f("alignGroup"))
        val dims = strs(f("groupBy"))
        if (dims.nonEmpty) c.rawDot("groupBy", dims.map(d => lit(d)))
        c.dotIf("groupByMeasurement", f("groupByMeasurement"))
        if (f("fill") != JNull) c.rawDot("fill", Seq(lit(f("fill"))))
        c.dot("cluster", f("cluster"))
      case "queryFlux" =>
        c.pipe("queryFlux", Seq(lit(f("queryStr"))).filterNot(_ == "''"))
          .dotDur("period", f("period"))
          .dotDur("every", f("every"))
          .dotIf("align", f("align"))
          .dot("cron", f("cron"))
          .dotDur("offset", f("offset"))
          .dot("cluster", f("cluster"))
          .dot("orgID", f("orgid"))
          .dot("org", f("org"))
      case "window" =>
        c.pipe("window", Nil)
          .dotDur("period", f("period"))
          .dotDur("every", f("every"))
          .dot("periodCount", f("periodCount"))
          .dot("everyCount", f("everyCount"))
          .dotIf("align", f("align"))
          .dotIf("fillPeriod", f("fillPeriod"))
      case "where" =>
        c.pipe("where", Seq(lit(f("lambda"))))
      case "eval" =>
        c.pipe("eval", strs(f("lambdas")).map(l => lit(l)))
        val as = strs(f("as"))
        if (as.nonEmpty) c.rawDot("as", as.map(a => lit(a)))
        val tags = strs(f("tags"))
        if (tags.nonEmpty) c.rawDot("tags", tags.map(t => lit(t)))
        if (f("keep") == JBool(true))
          c.rawDot("keep", strs(f("keepList")).map(k => lit(k)))
      case "default" =>
        c.pipe("default", Nil)
        kvDots(c, "field", f("fields")); kvDots(c, "tag", f("tags"))
      case "delete" =>
        c.pipe("delete", Nil)
        strs(f("fields")).foreach(x => c.rawDot("field", Seq(lit(x))))
        strs(f("tags")).foreach(x => c.rawDot("tag", Seq(lit(x))))
      case "shift" =>
        c.pipe("shift", Seq(lit(f("shift"), dur = true)))
      case "sample" =>
        val args = Seq(f("n"), f("duration")).filterNot(isZero)
        c.pipe("sample", args.map {
          case JStr(s) => durLit(s); case other => lit(other) })
      case "flatten" =>
        c.pipe("flatten", Nil)
        val on = strs(f("on"))
        if (on.nonEmpty) c.rawDot("on", on.map(o => lit(o)))
        c.dot("delimiter", f("delimiter"))
          .dotDur("tolerance", f("tolerance"))
          .dotIf("dropOriginalFieldName", f("dropOriginalFieldName"))
      case "combine" =>
        c.pipe("combine", strs(f("lambdas")).map(l => lit(l)))
        val as = strs(f("as"))
        if (as.nonEmpty) c.rawDot("as", as.map(a => lit(a)))
        c.dot("delimiter", f("delimiter"))
          .dotDur("tolerance", f("tolerance"))
          .dot("max", f("max"))
      case "groupBy" =>
        c.pipe("groupBy", strs(f("dimensions")).map(d => lit(d)))
        val ex = strs(f("exclude"))
        if (ex.nonEmpty) c.rawDot("exclude", ex.map(e => lit(e)))
        c.dotIf("byMeasurement", f("byMeasurement"))
      case "barrier" =>
        c.pipe("barrier", Nil)
          .dotDur("idle", f("idle"))
          .dotDur("period", f("period"))
        if (f("delete") == JBool(true)) c.rawDot("delete", Seq("TRUE"))
      case "derivative" =>
        c.pipe("derivative", Seq(lit(f("field"))).filterNot(_ == "''"))
          .dot("as", f("as"))
          .dotDur("unit", f("unit"))
          .dotIf("nonNegative", f("nonNegative"))
      case "changeDetect" =>
        c.pipe("changeDetect", strs(f("fields")).map(x => lit(x)))
      case "stateDuration" =>
        c.pipe("stateDuration", Seq(lit(f("lambda"))))
          .dot("as", f("as"))
          .dotDur("unit", f("unit"))
      case "stateCount" =>
        c.pipe("stateCount", Seq(lit(f("lambda"))))
          .dot("as", f("as"))
      case "stats" =>
        c.pipe("stats", Seq(lit(f("interval"), dur = true)))
          .dotIf("align", f("align"))
      case "union" =>
        c.pipe("union", parents.drop(1))
          .dot("rename", f("rename"))
      case "join" =>
        c.pipe("join", parents.drop(1))
        val as = strs(f("as"))
        if (as.nonEmpty) c.rawDot("as", as.map(a => lit(a)))
        val on = strs(f("on"))
        if (on.nonEmpty) c.rawDot("on", on.map(o => lit(o)))
        c.dot("delimiter", f("delimiter"))
          .dot("streamName", f("streamName"))
          .dotDur("tolerance", f("tolerance"))
          .dotIf("deleteAll", f("deleteAll"))
        if (f("fill") != JNull) c.rawDot("fill", Seq(lit(f("fill"))))
      case "httpOut" =>
        c.pipe("httpOut", Seq(lit(f("endpoint"))).filterNot(_ == "''"))
      case "httpPost" =>
        c.pipe("httpPost", strs(f("urls")).map(u => lit(u)))
          .dot("codeField", f("codeField"))
          .dotIf("captureResponse", f("captureResponse"))
          .dotDur("timeout", f("timeout"))
        strs(f("endpoints")).foreach(e => c.rawDot("endpoint", Seq(lit(e))))
        kvDots(c, "header", f("headers"))
      case "influxdbOut" =>
        c.pipe("influxDBOut", Nil)
          .dot("cluster", f("cluster"))
          .dot("database", f("database"))
          .dot("retentionPolicy", f("retentionPolicy"))
          .dot("measurement", f("measurement"))
          .dot("writeConsistency", f("writeConsistency"))
          .dot("precision", f("precision"))
          .dot("buffer", f("buffer"))
          .dotDur("flushInterval", f("flushInterval"))
          .dotIf("create", f("create"))
        kvDots(c, "tag", f("tags"))
      case "kapacitorLoopback" =>
        c.pipe("kapacitorLoopback", Nil)
          .dot("database", f("database"))
          .dot("retentionPolicy", f("retention_policy"))
          .dot("measurement", f("measurement"))
        kvDots(c, "tag", f("tags"))
      case "log" =>
        c.pipe("log", Nil)
          .dot("level", f("level"))
          .dot("prefix", f("prefix"))
      case "sideload" =>
        c.pipe("sideload", Nil)
          .dot("source", f("source"))
        val ord = strs(f("order"))
        if (ord.nonEmpty) c.rawDot("order", ord.map(o => lit(o)))
        kvDots(c, "field", f("fields")); kvDots(c, "tag", f("tags"))
      case "k8sAutoscale" =>
        c.pipe("k8sAutoscale", Nil)
          .dot("cluster", f("cluster"))
          .dot("namespace", f("namespace"))
          .dot("kind", f("kind"))
          .dot("resourceName", f("resourceName"))
          .dot("resourceNameTag", f("resourceNameTag"))
          .dot("currentField", f("currentField"))
          .dot("max", f("max"))
          .dot("min", f("min"))
          .dot("replicas", f("replicas"))
          .dotDur("increaseCooldown", f("increaseCooldown"))
          .dotDur("decreaseCooldown", f("decreaseCooldown"))
          .dot("namespaceTag", f("namespaceTag"))
          .dot("kindTag", f("kindTag"))
          .dot("resourceTag", f("resourceTag"))
      case "swarmAutoscale" =>
        // upstream bug kept: serviceName renders the TAG field
        c.pipe("swarmAutoscale", Nil)
          .dot("cluster", f("cluster"))
          .dot("serviceName", f("serviceNameTag"))
          .dot("serviceNameTag", f("serviceNameTag"))
          .dot("outputServiceNameTag", f("outputServiceNameTag"))
          .dot("currentField", f("currentField"))
          .dot("max", f("max"))
          .dot("min", f("min"))
          .dot("replicas", f("replicas"))
          .dotDur("increaseCooldown", f("increaseCooldown"))
          .dotDur("decreaseCooldown", f("decreaseCooldown"))
      case "trickle" =>
        c.pipe("trickle", Nil)
      case "udf" =>
        c.udf(n.fields.collectFirst { case ("udfName", JStr(s)) => s }.getOrElse(""), Nil)
        n.fields.foreach {
          case ("udfName", _) => ()
          case (opt, JArr(vs)) =>
            c.rawDot(opt, vs.map {
              case JStr(s) if looksLikeDuration(s) => durLit(s)
              case other => lit(other)
            })
          case _ => ()
        }
      case m if influxqlGen(m) =>
        val args0 = f("args") match { case JArr(vs) => vs; case _ => Nil }
        val field0 = f("field")
        val args: Seq[String] = m match {
          case "top" | "bottom" =>
            if (args0.nonEmpty)
              (args0.head +: field0 +: args0.drop(1)).filterNot(isZero).map(a => lit(a))
            else Nil
          case "holtWinters" =>
            (Seq(field0).filterNot(isZero) ++ args0.filterNot(isZero)).map {
              case JStr(s) if looksLikeDuration(s) => durLit(s)
              case JBool(true) => "TRUE"
              case a => lit(a)
            }
          case _ =>
            (Seq(field0).filterNot(isZero) ++ args0.filterNot(isZero)).map {
              case JStr(s) if looksLikeDuration(s) && m == "elapsed" => durLit(s)
              case a => lit(a)
            }
        }
        c.pipe(m, args)
          .dot("as", f("as"))
          .dotIf("usePointTimes", f("usePointTimes"))
      case "alert" => buildAlert(c, f)
      case other =>
        throw new IllegalArgumentException(s"cannot render node type $other")
    }
    c.text
  }

  private val influxqlGen: Set[String] = Set(
    "count", "distinct", "mean", "median", "mode", "spread", "sum", "first",
    "last", "min", "max", "stddev", "difference", "cumulativeSum",
    "percentile", "elapsed", "movingAverage", "holtWinters", "top", "bottom")

  private def looksLikeDuration(s: String): Boolean =
    s.matches("-?\\d+(ns|u|µs|ms|s|m|h|d|w)")

  /** Sorted k/v dot calls from a JSON map field (`.field(k, v)`…). */
  private def kvDots(c: Chain, name: String, v: JV): Unit = v match {
    case JObj(fs) => fs.sortBy(_._1).foreach { case (k, x) =>
      c.rawDot(name, Seq(qstr(k), lit(x))) }
    case _ => ()
  }

  // -------------------------------------------------- alert rendering

  private def buildAlert(c: Chain, f: String => JV): Unit = {
    c.pipe("alert", Nil)
      .dot("topic", f("topic"))
      .dot("id", f("alertId"))
      .dot("message", f("message"))
      .dot("details", f("details"))
      .dot("info", f("info"))
      .dot("warn", f("warn"))
      .dot("crit", f("crit"))
      .dot("infoReset", f("infoReset"))
      .dot("warnReset", f("warnReset"))
      .dot("critReset", f("critReset"))
      .dot("history", f("history"))
      .dot("levelTag", f("levelTag"))
      .dot("levelField", f("levelField"))
      .dot("messageField", f("messageField"))
      .dot("durationField", f("durationField"))
      .dot("idTag", f("idTag"))
      .dot("idField", f("idField"))
      .dotIf("all", f("all"))
      .dotIf("noRecoveries", f("noRecoveries"))
    handlerArr(f("inhibitors")).foreach { h =>
      c.rawDot("inhibit", (Seq(h("category")) ++ strs(h("equalTags"))).map(x => lit(x)))
    }
    if (f("stateChangesOnly") == JBool(true)) {
      f("stateChangesOnlyDuration") match {
        case JInt(0) | JNull => c.rawDot("stateChangesOnly", Nil)
        case JInt(n) => c.rawDot("stateChangesOnly", Seq(nanosDur(n)))
        case other => c.rawDot("stateChangesOnly", Seq(lit(other, dur = true)))
      }
    }
    if (f("useFlapping") == JBool(true))
      c.dotZeroOK("flapping", f("flapLow"), f("flapHigh"))
    handlerArr(f("post")).foreach { h =>
      c.dotKeep("post", h("url"))
        .dot("endpoint", h("endpoint"))
        .dotIf("captureResponse", h("captureResponse"))
        .dotDur("timeout", h("timeout"))
        .dotIf("skipSSLVerification", h("skipSSLVerification"))
      kvDots(c, "header", h("headers"))
    }
    handlerArr(f("tcp")).foreach(h => c.dotKeep("tcp", h("address")))
    handlerArr(f("email")).foreach { h =>
      c.rawDot("email", Nil)
      strs(h("to")).foreach(t => c.rawDot("to", Seq(lit(t))))
      val tt = strs(h("to-templates"))
      if (tt.nonEmpty) c.rawDot("toTemplates", Seq(tt.map(t => lit(t)).mkString("[", ", ", "]")))
    }
    handlerArr(f("exec")).foreach(h => c.dotKeep("exec", strs(h("command")): _*))
    handlerArr(f("log")).foreach { h =>
      c.dotKeep("log", h("filePath"))
      h("mode") match {
        case JInt(0) | JNull => ()
        case JInt(m) => c.rawDot("mode", Seq("0" + java.lang.Long.toOctalString(m)))
        case _ => ()
      }
    }
    handlerArr(f("victorOps")).foreach(h =>
      c.rawDot("victorOps", Nil).dot("routingKey", h("routingKey")))
    handlerArr(f("pagerDuty")).foreach(h =>
      c.rawDot("pagerDuty", Nil).dot("serviceKey", h("serviceKey")))
    handlerArr(f("pagerDuty2")).foreach { h =>
      c.rawDot("pagerDuty2", Nil).dot("routingKey", h("routingKey"))
      strs(h("links")).foreach {
        case JObj(l) =>
          val href = l.collectFirst { case ("href", x) => x }.getOrElse(JNull)
          val text = l.collectFirst { case ("text", x) => x }.getOrElse(JNull)
          if (!isZero(text)) c.rawDot("link", Seq(lit(href), lit(text)))
          else c.rawDot("link", Seq(lit(href)))
        case _ => ()
      }
    }
    handlerArr(f("pushover")).foreach { h =>
      c.rawDot("pushover", Nil)
        .dot("userKey", h("userKey"))
        .dot("device", h("device"))
        .dot("title", h("title"))
        .dot("uRL", h("url"))
        .dot("uRLTitle", h("urlTitle"))
        .dot("sound", h("sound"))
    }
    handlerArr(f("sensu")).foreach { h =>
      c.rawDot("sensu", Nil).dot("source", h("source"))
      val hs = strs(h("handlers"))
      if (hs.nonEmpty) c.rawDot("handlers", hs.map(x => lit(x)))
      kvDots(c, "metadata", h("metadata"))
    }
    handlerArr(f("serviceNow")).foreach { h =>
      c.rawDot("serviceNow", Nil)
        .dot("source", h("source"))
        .dot("node", h("node"))
        .dot("type", h("type"))
        .dot("resource", h("resource"))
        .dot("metricName", h("metric_name"))
        .dot("messageKey", h("message_key"))
      kvDots(c, "additionalInfo", h("additional_info"))
    }
    handlerArr(f("bigPanda")).foreach { h =>
      c.rawDot("bigPanda", Nil)
        .dot("appKey", h("app-key"))
        .dot("host", h("host"))
        .dot("primaryProperty", h("primary-property"))
        .dot("secondaryProperty", h("secondary-property"))
      kvDots(c, "attribute", h("attributes"))
    }
    handlerArr(f("slack")).foreach { h =>
      c.rawDot("slack", Nil)
        .dot("workspace", h("workspace"))
        .dot("channel", h("channel"))
        .dot("username", h("username"))
        .dot("iconEmoji", h("iconEmoji"))
    }
    handlerArr(f("discord")).foreach { h =>
      c.rawDot("discord", Nil)
        .dot("workspace", h("workspace"))
        .dot("username", h("username"))
        .dot("avatarUrl", h("avatarUrl"))
        .dot("embedTitle", h("embedTitle"))
    }
    handlerArr(f("telegram")).foreach { h =>
      c.rawDot("telegram", Nil)
        .dot("chatId", h("chatId"))
        .dot("parseMode", h("parseMode"))
        .dotIf("disableWebPagePreview", h("disableWebPagePreview"))
        .dotIf("disableNotification", h("disableNotification"))
    }
    handlerArr(f("hipChat")).foreach { h =>
      c.rawDot("hipChat", Nil).dot("room", h("room")).dot("token", h("token"))
    }
    handlerArr(f("kafka")).foreach { h =>
      c.rawDot("kafka", Nil)
        .dot("cluster", h("cluster"))
        .dot("kafkaTopic", h("kafka-topic"))
        .dotIf("disablePartitionById", h("disable-partition-by-id"))
        .dot("partitionHashAlgorithm", h("partition-hash-algorithm"))
        .dot("template", h("template"))
    }
    handlerArr(f("alerta")).foreach { h =>
      c.rawDot("alerta", Nil)
        .dot("token", h("token"))
        .dot("resource", h("resource"))
        .dot("event", h("event"))
        .dot("environment", h("environment"))
        .dot("group", h("group"))
        .dot("value", h("value"))
        .dot("origin", h("origin"))
      val sv = strs(h("service"))
      if (sv.nonEmpty) c.rawDot("services", sv.map(x => lit(x)))
      val co = strs(h("correlate"))
      if (co.nonEmpty) c.rawDot("correlated", co.map(x => lit(x)))
      c.dotDur("timeout", h("timeout"))
      kvDots(c, "attribute", h("attributes"))
    }
    handlerArr(f("opsGenie")).foreach { h =>
      c.rawDot("opsGenie", Nil)
      val t = strs(h("teams")); if (t.nonEmpty) c.rawDot("teams", t.map(x => lit(x)))
      val r = strs(h("recipients")); if (r.nonEmpty) c.rawDot("recipients", r.map(x => lit(x)))
    }
    handlerArr(f("opsGenie2")).foreach { h =>
      // recoveryAction / details are NOT rendered (pipeline/tick/alert.go quirk)
      c.rawDot("opsGenie2", Nil)
      val t = strs(h("teams")); if (t.nonEmpty) c.rawDot("teams", t.map(x => lit(x)))
      val r = strs(h("recipients")); if (r.nonEmpty) c.rawDot("recipients", r.map(x => lit(x)))
    }
    handlerArr(f("talk")).foreach(_ => c.rawDot("talk", Nil))
    handlerArr(f("mqtt")).foreach { h =>
      c.dotKeep("mqtt", h("topic"))
        .dot("brokerName", h("brokerName"))
        .dot("qos", h("qos"))
        .dotIf("retained", h("retained"))
    }
    handlerArr(f("snmpTrap")).foreach { h =>
      c.dotKeep("snmpTrap", h("trapOid"))
      strs(h("data")).foreach {
        case JObj(d) =>
          def g(k: String) = d.collectFirst { case (`k`, x) => x }.getOrElse(JNull)
          c.rawDot("data", Seq(lit(g("oid")), lit(g("type")), lit(g("value"))))
        case _ => ()
      }
    }
    handlerArr(f("teams")).foreach(h =>
      c.rawDot("teams", Nil).dot("channelURL", h("channel_url")))
    handlerArr(f("zenoss")).foreach { h =>
      c.rawDot("zenoss", Nil)
        .dot("action", h("action"))
        .dot("method", h("method"))
        .dot("type", h("type"))
        .dot("tid", h("tid"))
        .dot("summary", h("summary"))
        .dot("device", h("device"))
        .dot("component", h("component"))
        .dot("eventClassKey", h("evclasskey"))
        .dot("eventClass", h("evclass"))
        .dot("collector", h("collector"))
        .dot("message", h("message"))
      kvDots(c, "customField", h("customField"))
    }
  }

  private def handlerArr(v: JV): Seq[String => JV] = v match {
    case JArr(vs) => vs.collect { case JObj(fs) =>
      (k: String) => fs.find(_._1 == k).map(_._2).getOrElse(JNull)
    }
    case _ => Nil
  }
}
