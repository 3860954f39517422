package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Alert topics and inhibitors (reference alert.go:712-914 handleEvent,
  * alert/inhibit.go:10-90, services/alert).
  *
  * Topics: every alert event is published to its node's topic(s); handlers
  * subscribe to topics and receive the fan-out. Declaratively that is a
  * join of the event stream against a (topic → handler) subscription table
  * — handlers are few, so the subscription side broadcasts.
  *
  * Inhibitors: an alert node declaring `.inhibit(category, equalTags…)`
  * suppresses, while its own level is non-OK, every event of `category`
  * whose equal-tags match its group (inhibit.go:74-90; the inhibitor's
  * state is Set on each trigger, alert.go:1225-1229). Batch rendering: the
  * inhibiting node's event stream is a step function of time per
  * (category, tagset); a candidate event is inhibited iff the latest
  * inhibiting event at-or-before it is non-OK. That is a union of the two
  * streams + a per-key running last_value — one shuffle on (category,
  * equalTags), no joins, no state explosion.
  *
  * Tie order (documented): the reference updates inhibitor state and
  * delivers events from concurrent goroutines, so same-instant ordering is
  * racy; here an inhibiting event at time t governs candidates at the same
  * t (inhibitor sorts first on ties) — deterministic and the conservative
  * reading of "suppress while CRITICAL".
  */
object AlertTopics {

  /** Fan out events to their subscribed handlers.
    * @param events        alert events with a `topic` column
    * @param subscriptions (topic, handler) rows — the AlertService handler
    *                      registry (services/alert topics store) */
  def fanOut(events: DataFrame, subscriptions: DataFrame): DataFrame =
    events.join(broadcast(subscriptions), "topic")

  /** Compile a topic-handler MATCH expression — the `match:` line of a
    * handler spec (client.TopicHandlerOptions, e.g. `changed() == TRUE`)
    * — into a boolean Column over an alert-event frame, exactly the
    * reference's newMatchHandler semantics
    * (services/alert/handlers.go:372-521): the five event functions
    * `changed()` / `level()` / `name()` / `taskName()` /
    * `alertDuration()` bind to the given columns, the bare identifiers
    * OK/INFO/WARNING/CRITICAL are the int64 levels 0-3
    * (matchIdentifiers), and the rest of the lambda grammar
    * (AND/OR/comparisons/arithmetic/regex) compiles through the shared
    * expression compiler ([[graft.tick.TickScript.exprToColumn]]) after
    * leaf substitution, so the operator semantics cannot drift from the
    * lambda language. Unknown identifiers refuse loudly like the
    * reference's AST walk; a known function with arguments gets the
    * reference's "takes no arguments" error; unknown functions refuse at
    * COMPILE time (the reference defers that failure to per-event
    * evaluation — same outcome, earlier and louder). An EMPTY match line
    * is match-all — the reference only wraps a handler in
    * newMatchHandler when `spec.Match != ""` (service.go:1119).
    * `durationS` carries the alert duration at second scale, the repo's
    * duration-in-expressions convention. */
  def matchColumn(
      matchExpr: String,
      level: org.apache.spark.sql.Column,
      prevLevel: org.apache.spark.sql.Column,
      name: org.apache.spark.sql.Column,
      taskName: org.apache.spark.sql.Column,
      durationS: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.tick.TickScript
    import graft.tick.TickScript._
    import org.apache.spark.sql.Column
    if (matchExpr.trim.isEmpty) return lit(true)
    val fns: Map[String, Column] = Map(
      "changed" -> (level =!= prevLevel), "level" -> level.cast("long"),
      "name" -> name, "taskName" -> taskName, "alertDuration" -> durationS)
    val ids: Map[String, Long] =
      Map("OK" -> 0L, "INFO" -> 1L, "WARNING" -> 2L, "CRITICAL" -> 3L)
    def subst(e: Expr): Expr = e match {
      case EFn(f, Nil) if fns.contains(f) => ELit(fns(f))
      case EFn(f, _) if fns.contains(f) => throw new IllegalArgumentException(
        s"$f takes no arguments")
      case EFn(f, _) => throw new IllegalArgumentException(
        s"unknown function '$f' in match expression: $matchExpr")
      case EVar(v) if ids.contains(v) => ELit(ids(v))
      case EVar(other) => throw new IllegalArgumentException(
        s"""unknown identifier "$other" in match expression: $matchExpr""")
      case EField(f) => throw new IllegalArgumentException(
        s"""match expressions have no field scope (got "$f"): $matchExpr""")
      case EBin(op, l, r) => EBin(op, subst(l), subst(r))
      case ENeg(x) => ENeg(subst(x))
      case other => other
    }
    TickScript.exprToColumn(subst(TickScript.lambdaExpr(matchExpr)))
  }

  /** Latest event state per (topic, event id) — `Topic.EventStates`
    * (alert/topics.go:280-296): a topic keeps the most recently
    * collected state per event id, and the query filters on the
    * CURRENT level (a historical CRITICAL that recovered does not
    * count). One partial+final max aggregate per (topic, id): the max
    * over a `(timeUs, level, carry…)` struct is the latest-wins rule
    * with a deterministic lexicographic tie-break — no window sort, so
    * the plan holds at any topic cardinality.
    *
    * @param carry additional state columns to keep (message, duration…)
    */
  def eventStates(events: DataFrame, minLevel: Int = 0,
      topicCol: String = "topic", idCol: String = "id",
      timeUsCol: String = "time_us", levelCol: String = "level",
      carry: Seq[String] = Nil): DataFrame = {
    val st = struct((timeUsCol +: levelCol +: carry).map(col): _*)
    events.groupBy(col(topicCol), col(idCol))
      .agg(max(st).as("__st"))
      .select(col(topicCol) +: col(idCol) +:
        (timeUsCol +: levelCol +: carry).map(c => col(s"__st.$c").as(c)): _*)
      .where(col(levelCol) >= minLevel)
  }

  /** `Topics.TopicState(pattern, minLevel)` (alert/topics.go:171-188,
    * :230-243): per glob-matched topic, `level` = the max CURRENT event
    * level (over latest states, not history) and `collected` = the
    * total number of events ever collected. Single scan: per-(topic,id)
    * partial max+count, then a per-topic rollup — two narrow shuffles,
    * both partial-aggregated map-side. Pattern is the reference's
    * path.Match glob (`*`/`?` translated; empty matches all). */
  def topicStates(events: DataFrame, pattern: String = "", minLevel: Int = 0,
      topicCol: String = "topic", idCol: String = "id",
      timeUsCol: String = "time_us", levelCol: String = "level"): DataFrame = {
    val filtered =
      if (pattern.isEmpty) events
      else events.where(col(topicCol).rlike("^" + globRegex(pattern) + "$"))
    filtered
      .groupBy(col(topicCol), col(idCol))
      .agg(max(struct(col(timeUsCol), col(levelCol))).as("__st"),
        count(lit(1)).as("__n"))
      .groupBy(col(topicCol))
      .agg(max(col(s"__st.$levelCol")).as(levelCol),
        sum(col("__n")).as("collected"))
      .where(col(levelCol) >= minLevel)
  }

  private def globRegex(pattern: String): String =
    pattern.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => "\\" + c
      case c => c.toString
    }

  /** Suppress candidate events inhibited by an active non-OK inhibitor.
    *
    * @param candidates      events of the inhibited category:
    *                        (timeUs, equalTags…, payload…)
    * @param inhibitorEvents the inhibiting node's alert events:
    *                        (timeUs, equalTags…, level) — its non-OK runs
    *                        define the inhibition windows
    * @param equalTags       tag columns that must match (inhibit.go:81-88)
    * @return candidates plus a boolean `inhibited` column */
  def applyInhibitors(
      candidates: DataFrame,
      inhibitorEvents: DataFrame,
      equalTags: Seq[String],
      timeUsCol: String = "time_us"): DataFrame = {
    val c = candidates.withColumn("__src", lit(1))
    val i = inhibitorEvents
      .select(equalTags.map(col) :+ col(timeUsCol) :+ col("level").cast("int").as("__ilvl"): _*)
      .withColumn("__src", lit(0))
    val unioned = c.unionByName(i, allowMissingColumns = true)
    val w = Window.partitionBy(equalTags.map(col): _*)
      .orderBy(col(timeUsCol), col("__src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__inh", coalesce(last(col("__ilvl"), ignoreNulls = true).over(w), lit(0)))
      .filter(col("__src") === 1)
      .withColumn("inhibited", col("__inh") =!= 0)
      .drop("__src", "__ilvl", "__inh")
  }
  /** Go `time.Duration.String()` of a µs count — the `{{.Interval}}`
    * rendering of the aggregate handler's message template ("100ms",
    * "1.5s", "1m40s"); delegates to the nanosecond renderer the CLI
    * layer maintains. */
  def goDurationUs(us: Long): String = graft.tick.Cli.goDurationNs(us * 1000L)

  /** The AGGREGATE topic handler (services/alert/handlers.go:199-308):
    * fold each interval's events into ONE synthetic event on `outTopic` —
    * count-templated message ("Received {{ .Count }} events in the last
    * {{.Interval}}."), max level, max time, max duration, the member
    * messages joined by newline as the details, member series
    * concatenated, `recoverable` pinned false. Empty intervals emit
    * nothing (the ticker branch skips len(events)==0).
    *
    * Batch rendering of the ticker: interval buckets on event time
    * (floor(time/interval)) — one partial+final aggregate per bucket; the
    * reference's single-goroutine arrival order is reproduced
    * deterministically by (time, message) sort inside the bucket.
    * `seriesCol` (optional) carries each event's Data series fragments
    * (an array column) for the concatenation. */
  def aggregateEvents(events: DataFrame, intervalUs: Long, aggId: String,
      outTopic: String,
      messageTemplate: String = "Received {{ .Count }} events in the last {{.Interval}}.",
      timeUsCol: String = "time_us", levelCol: String = "level",
      durationUsCol: String = "duration_us", messageCol: String = "message",
      seriesCol: Option[String] = None): DataFrame = {
    require(intervalUs > 0, "aggregate interval must be positive")
    val bucket = floor(col(timeUsCol) / intervalUs)
    val folds = aggFoldExprs(timeUsCol, levelCol, durationUsCol, messageCol,
      seriesCol)
    val base = events.groupBy(bucket.as("__bkt"))
      .agg(folds.head, folds.tail: _*)
    renderAggregate(base, intervalUs, aggId, outTopic, messageTemplate,
      timeUsCol, levelCol, durationUsCol, messageCol, seriesCol)
  }

  /** STREAMING rendering of the same handler: tumbling event-time windows
    * (epoch-aligned, ≡ the batch `floor(time/interval)` buckets) close at
    * the watermark and emit their single synthetic event in append mode —
    * the ticker as a watermark. `timeCol` is a timestamp column; the
    * member fold, message template, and output shape are byte-identical
    * to [[aggregateEvents]] (StreamingParitySpec pins it). */
  def aggregateEventsStream(events: DataFrame, intervalUs: Long,
      aggId: String, outTopic: String,
      messageTemplate: String = "Received {{ .Count }} events in the last {{.Interval}}.",
      timeCol: String = "time", watermark: String = "0 seconds",
      timeUsCol: String = "time_us", levelCol: String = "level",
      durationUsCol: String = "duration_us", messageCol: String = "message",
      seriesCol: Option[String] = None): DataFrame = {
    require(intervalUs > 0, "aggregate interval must be positive")
    val folds = aggFoldExprs(timeUsCol, levelCol, durationUsCol, messageCol,
      seriesCol)
    val base = events
      .withColumn(timeUsCol, unix_micros(col(timeCol)))
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), s"$intervalUs microseconds").as("__w"))
      .agg(folds.head, folds.tail: _*)
    renderAggregate(base, intervalUs, aggId, outTopic, messageTemplate,
      timeUsCol, levelCol, durationUsCol, messageCol, seriesCol)
  }

  /** The per-interval member fold both renderings share: count, max
    * level/time/duration, (time, message)-sorted members, optional series
    * concatenation. */
  private def aggFoldExprs(timeUsCol: String, levelCol: String,
      durationUsCol: String, messageCol: String,
      seriesCol: Option[String]): Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("__n"),
    max(col(levelCol)).as(levelCol),
    max(col(timeUsCol)).as(timeUsCol),
    max(col(durationUsCol)).as(durationUsCol),
    sort_array(collect_list(struct(col(timeUsCol), col(messageCol))))
      .as("__msgs"),
    seriesCol.map(c =>
        flatten(sort_array(collect_list(struct(col(timeUsCol).as("t"),
          col(c).as("v")))).getField("v")).as("__series"))
      .getOrElse(lit(null).as("__series")))

  private def renderAggregate(base: DataFrame, intervalUs: Long,
      aggId: String, outTopic: String, messageTemplate: String,
      timeUsCol: String, levelCol: String, durationUsCol: String,
      messageCol: String, seriesCol: Option[String]): DataFrame = {
    val message = messageTemplate
      .replace("{{ .Count }}", "\u0000C").replace("{{.Count}}", "\u0000C")
      .replace("{{ .Interval }}", goDurationUs(intervalUs))
      .replace("{{.Interval}}", goDurationUs(intervalUs))
    val msgCol = {
      val parts = message.split("\u0000C", -1)
      val cols = parts.zipWithIndex.flatMap { case (p, i) =>
        (if (i == 0) Seq.empty[org.apache.spark.sql.Column]
         else Seq(col("__n").cast("string"))) :+ lit(p)
      }
      concat(cols: _*)
    }
    val out = base.select(
      lit(outTopic).as("topic"),
      lit(aggId).as("id"),
      col(timeUsCol), col(levelCol), col(durationUsCol),
      msgCol.as(messageCol),
      concat_ws("\n", col(s"__msgs.$messageCol")).as("details"),
      lit(false).as("recoverable"),
      col("__series").as(seriesCol.getOrElse("__series")))
    if (seriesCol.isDefined) out else out.drop("__series")
  }

  /** The PUBLISH topic handler (handlers.go:312-334): republish every
    * event to each configured topic. */
  def publishEvents(events: DataFrame, topics: Seq[String],
      topicCol: String = "topic"): DataFrame =
    events.withColumn(topicCol,
      explode(array(topics.map(lit(_)): _*)))
}
