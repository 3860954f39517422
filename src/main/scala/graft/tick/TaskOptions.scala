package graft.tick

/** The `option task = {...}` header of a task script —
  * task/options/options.go: FromScriptAST's extractors (:160-328) and
  * Options.Validate (:330-392), so a graft task script is
  * self-describing exactly like a Flux task script. The body after the
  * header is the task's query (Spark SQL here, Flux there) and is not
  * interpreted by this parser.
  *
  * Laws matched (options_test.go:62-204):
  *  - exactly one `option task` assignment (duplicates error);
  *  - name: string literal, required;
  *  - exactly one of cron (string literal, must parse) / every
  *    (duration literal — a bare int errors, parse-field error);
  *  - every ≥ 1 s and whole seconds; offset whole seconds (negative
  *    allowed — "maybe useful for forecasting");
  *  - concurrency in [1, 100], retry in [1, 10], both defaulting to 1;
  *  - validation failures join as "invalid options: a, b".
  */
object TaskOptions {

  val MaxConcurrency = 100L
  val MaxRetry = 10L

  final case class Options(
      name: String = "",
      cron: String = "",
      every: String = "",
      offset: Option[String] = None,
      concurrency: Long = 1L,
      retry: Long = 1L) {

    /** taskmodel EffectiveCronString. */
    def effectiveCron: String =
      if (cron.nonEmpty) cron
      else if (every.nonEmpty) s"@every $every"
      else ""

    def offsetSeconds: Long = offset.map(signedDurationSec).getOrElse(0L)
  }

  class OptionsException(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new OptionsException(msg)

  /** Signed whole-second duration value of a (possibly negative) Flux
    * duration literal. Calendar units are rejected here — task every/
    * offset are fixed intervals in the reference's validator too. */
  private def signedDurationSec(lit: String): Long = {
    val neg = lit.startsWith("-")
    val (secs, months) = FluxCron.parseDuration(lit.stripPrefix("-"))
    if (months != 0) fail(s"calendar units not allowed in task durations: $lit")
    if (neg) -secs else secs
  }

  private val durationRe = "-?(\\d+(y|mo|w|d|h|ms|us|µs|ns|m|s))+".r

  /** Tokenize the object literal body: ident ':' value pairs, comma or
    * newline separated, `//` comments stripped, trailing comma ok. */
  private def parseObject(body: String): Seq[(String, String)] = {
    val noComments = body.linesIterator
      .map { l =>
        // strip // comments outside strings (escape-aware, like
        // ScrapeScheduler.stripComment — `"a\"//b"` must not be cut)
        var inStr = false; var esc = false; var i = 0; var cut = l.length
        while (i < l.length - 1 && cut == l.length) {
          if (esc) esc = false
          else if (inStr && l(i) == '\\') esc = true
          else if (l(i) == '"') inStr = !inStr
          else if (!inStr && l(i) == '/' && l(i + 1) == '/') cut = i
          i += 1
        }
        l.substring(0, cut)
      }
      .mkString("\n")
    val pairs = Seq.newBuilder[(String, String)]
    var i = 0
    val s = noComments
    def skipWs(): Unit = while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
    while ({ skipWs(); i < s.length }) {
      val ks = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      val key = s.substring(ks, i)
      if (key.isEmpty) fail(s"malformed task options near offset $i")
      skipWs()
      if (i >= s.length || s(i) != ':') fail(s"expected ':' after $key")
      i += 1
      skipWs()
      val vs = i
      if (i < s.length && s(i) == '"') {
        i += 1
        while (i < s.length && s(i) != '"') { if (s(i) == '\\') i += 1; i += 1 }
        if (i >= s.length) fail("unterminated string in task options")
        i += 1
      } else {
        while (i < s.length && !s(i).isWhitespace && s(i) != ',' && s(i) != '}') i += 1
      }
      pairs += key -> s.substring(vs, i)
    }
    pairs.result()
  }

  /** Locate every `option task = {...}` header in `script`. Each hit is
    * (headerStart, bodyStart, headerEnd) where headerEnd is the index
    * just PAST the closing brace, or -1 if the object is unterminated.
    * The single scanner shared by [[fromScript]] (the parser) and
    * [[FluxSql.stripTaskHeader]] (the stripper) so the two can never
    * disagree about where a header is. */
  private[tick] def locateHeaders(script: String): Seq[(Int, Int, Int)] = {
    val headerRe = "(?s)option\\s+task\\s*=\\s*\\{".r
    headerRe.findAllMatchIn(script).toSeq.map { m =>
      // quote-aware scan to the matching close brace
      var i = m.end
      var inStr = false
      while (i < script.length && (inStr || script(i) != '}')) {
        if (script(i) == '"' ) inStr = !inStr
        else if (inStr && script(i) == '\\') i += 1
        i += 1
      }
      (m.start, m.end, if (i >= script.length) -1 else i + 1)
    }
  }

  /** FromScriptAST (options.go:160-200): locate the single
    * `option task = {...}` statement, extract + validate. */
  def fromScript(script: String): Options = {
    val headers = locateHeaders(script)
    if (headers.isEmpty) fail("no task options defined")
    if (headers.length > 1) fail("multiple task options defined")
    val (_, bs, he) = headers.head
    if (he < 0) fail("unterminated task options object")
    val pairs = parseObject(script.substring(bs, he - 1))

    var o = Options()
    def strLit(k: String, v: String): String = {
      if (!(v.startsWith("\"") && v.endsWith("\"") && v.length >= 2))
        fail(s"invalid options: failed to parse field $k")
      v.substring(1, v.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    }
    def durLit(k: String, v: String): String = {
      if (durationRe.pattern.matcher(v).matches()) v
      else fail(s"invalid options: failed to parse field $k (not a duration)")
    }
    def intLit(k: String, v: String): Long =
      try v.toLong
      catch { case _: Exception => fail(s"invalid options: failed to parse field $k") }

    var sawCron, sawEvery = false
    for ((k, v) <- pairs) k match {
      case "name" => o = o.copy(name = strLit(k, v))
      case "cron" => sawCron = true; o = o.copy(cron = strLit(k, v))
      case "every" => sawEvery = true; o = o.copy(every = durLit(k, v))
      case "offset" => o = o.copy(offset = Some(durLit(k, v)))
      case "concurrency" => o = o.copy(concurrency = intLit(k, v))
      case "retry" => o = o.copy(retry = intLit(k, v))
      case other => () // unknown keys tolerated, like edit.GetProperty misses
    }
    // extractor order follows taskOptionExtractors: name first
    if (pairs.forall(_._1 != "name"))
      fail("invalid options: missing required option: name")
    if (sawCron && sawEvery) fail("cannot use both cron and every in task options")
    if (!sawCron && !sawEvery)
      fail("invalid options: missing required option: cron or every")
    validate(o)
    o
  }

  /** Options.Validate (options.go:330-392). */
  def validate(o: Options): Unit = {
    val errs = Seq.newBuilder[String]
    if (o.name.isEmpty) errs += "name required"
    val cronPresent = o.cron.nonEmpty
    val everyPresent = o.every.nonEmpty
    if (cronPresent == everyPresent)
      errs += "must specify exactly one of either cron or every"
    else if (cronPresent) {
      try FluxCron.parse(o.cron)
      catch { case e: Exception => errs += s"cron invalid: ${e.getMessage}" }
    } else {
      val sec = signedDurationSec(o.every)
      if (sec < 1) errs += "every option must be at least 1 second"
      // sub-second residue is unrepresentable here (whole-second model),
      // so "whole seconds" holds by construction
    }
    if (o.concurrency < 1) errs += "concurrency must be at least 1"
    else if (o.concurrency > MaxConcurrency)
      errs += s"concurrency exceeded max of $MaxConcurrency"
    if (o.retry < 1) errs += "retry must be at least 1"
    else if (o.retry > MaxRetry) errs += s"retry exceeded max of $MaxRetry"
    val es = errs.result()
    if (es.nonEmpty) fail("invalid options: " + es.mkString(", "))
  }

  /** kv createTask's script path (kv/task.go:307-345): a TaskCreate
    * whose schedule fields come from the script's own header. */
  def taskCreateFromScript(script: String, status: String = ""): FluxTasks.TaskCreate = {
    val o = fromScript(script)
    FluxTasks.TaskCreate(
      name = o.name, flux = script, every = o.every, cron = o.cron,
      offsetS = o.offsetSeconds, status = status)
  }

  /** A [[FluxTasks.FluxTaskSystem]] `concurrencyOf` that reads the
    * task's own declared concurrency (executor/limits.go:15-21 parses
    * it from the script per check). Tasks without a header (explicit-
    * field tasks) are unlimited, like a nil o.Concurrency. */
  val concurrencyOf: FluxTasks.Task => Option[Int] = t =>
    try Some(fromScript(t.flux).concurrency.toInt)
    catch { case _: Exception => None }
}
