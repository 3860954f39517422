package graft.tick

import java.time.{LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

/** The Flux-task cron dialect and schedule alignment.
  *
  * Matches the reference's scheduling time arithmetic
  * (task/backend/scheduler/scheduler.go:55-102, which composes the
  * public influxdata/cron parser with Flux duration literals):
  *
  *  - 5-field crons `min hour dom month dow`,
  *  - 6-field crons `sec min hour dom month dow`,
  *  - 7-field crons `sec min hour dom month dow year`,
  *  - `@every <flux-duration>` fixed/calendar intervals,
  *  - `@yearly @annually @monthly @weekly @daily @midnight @hourly`.
  *
  * All times are UTC unix SECONDS — the scheduler stores fire times as
  * `nt.UTC().Unix()` (treescheduler.go:354), so sub-second cron
  * resolution never survives a scheduling step in the reference either.
  *
  * [[newSchedule]] reproduces scheduler.go:55-86 `NewSchedule`: the
  * last-scheduled time is truncated to the second and, for `@every`
  * schedules, aligned DOWN to a multiple of the interval measured from
  * Go's zero time (year 1, UTC) — Go `time.Truncate` semantics, hence
  * the [[GoZeroOffsetSec]] constant. That alignment is what makes
  * "@every 1m" fire exactly on minute boundaries (scheduler_test.go:62).
  */
object FluxCron {

  /** Seconds from Go's time zero (0001-01-01T00:00:00Z) to the unix
    * epoch: (1969*365 + 1969/4 - 1969/100 + 1969/400) * 86400. */
  val GoZeroOffsetSec: Long = 62135596800L

  /** Go time.Truncate on unix seconds: round down to a multiple of
    * `stepSec` measured from Go's zero time. */
  def goTruncate(unixSec: Long, stepSec: Long): Long =
    if (stepSec <= 0) unixSec
    else {
      val abs = unixSec + GoZeroOffsetSec
      abs - java.lang.Math.floorMod(abs, stepSec) - GoZeroOffsetSec
    }

  sealed trait Schedule {
    /** Next fire time STRICTLY after `fromSec` (unix seconds, UTC). */
    def next(fromSec: Long): Long
  }

  /** `@every` schedule: fixed `secs` plus calendar `months` (Flux
    * duration `mo`/`y` units are calendar-aware, like
    * options.Duration.DurationFrom). */
  final case class Every(secs: Long, months: Int) extends Schedule {
    require(secs > 0 || months > 0, s"@every interval must be positive")
    def next(fromSec: Long): Long =
      if (months == 0) fromSec + secs
      else
        LocalDateTime
          .ofEpochSecond(fromSec, 0, ZoneOffset.UTC)
          .plusMonths(months.toLong)
          .plusSeconds(secs)
          .toEpochSecond(ZoneOffset.UTC)

    /** The concrete span of one interval starting at `fromSec` —
      * options.Duration.DurationFrom, used for @every alignment. */
    def durationFromSec(fromSec: Long): Long =
      if (months == 0) secs else next(fromSec) - fromSec
  }

  /** Field-set cron. `dom`/`dow` follow the classic rule: when BOTH are
    * restricted the day matches if EITHER does; a `*` field is
    * unrestricted. `dow` 0=Sunday (7 also accepted as Sunday). */
  final case class Cron(
      seconds: Set[Int],
      minutes: Set[Int],
      hours: Set[Int],
      dom: Set[Int],
      domStar: Boolean,
      months: Set[Int],
      dow: Set[Int],
      dowStar: Boolean,
      years: Option[Set[Int]])
      extends Schedule {

    private def dayMatches(dt: LocalDateTime): Boolean = {
      // java DayOfWeek: MONDAY=1..SUNDAY=7 → cron 0=Sunday
      val cronDow = dt.getDayOfWeek.getValue % 7
      val inDom = dom.contains(dt.getDayOfMonth)
      val inDow = this.dow.contains(cronDow)
      if (!domStar && !dowStar) inDom || inDow
      else inDom && inDow
    }

    def next(fromSec: Long): Long = {
      var dt = LocalDateTime.ofEpochSecond(fromSec + 1, 0, ZoneOffset.UTC)
      val startYear = dt.getYear
      var guard = 0
      while (true) {
        guard += 1
        // a schedule that never matches (e.g. Feb 30) would loop forever;
        // 8 years covers every leap/dow alignment for a satisfiable cron
        if (dt.getYear > startYear + 8 && years.isEmpty)
          throw new IllegalArgumentException(
            s"cron schedule never fires after $fromSec")
        if (years.exists(ys => ys.forall(_ < dt.getYear)))
          throw new IllegalArgumentException(
            s"cron schedule has no remaining years after $fromSec")
        if (years.exists(ys => !ys.contains(dt.getYear)))
          dt = LocalDateTime.of(dt.getYear + 1, 1, 1, 0, 0, 0)
        else if (!months.contains(dt.getMonthValue))
          dt = LocalDateTime
            .of(dt.getYear, dt.getMonthValue, 1, 0, 0, 0)
            .plusMonths(1)
        else if (!dayMatches(dt))
          dt = dt.plusDays(1).truncatedTo(ChronoUnit.DAYS)
        else if (!hours.contains(dt.getHour))
          dt = dt.plusHours(1).truncatedTo(ChronoUnit.HOURS)
        else if (!minutes.contains(dt.getMinute))
          dt = dt.plusMinutes(1).truncatedTo(ChronoUnit.MINUTES)
        else if (!seconds.contains(dt.getSecond))
          dt = dt.plusSeconds(1)
        else
          return dt.toEpochSecond(ZoneOffset.UTC)
        if (guard > 1000000)
          throw new IllegalStateException("cron next-time search diverged")
      }
      0L // unreachable
    }
  }

  private val monthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val dowNames =
    Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  /** Flux duration literal → (whole seconds, calendar months). Multi-
    * part literals compose ("1h30m"); sub-second parts accumulate in ns
    * and floor to seconds (the scheduler's own resolution). */
  def parseDuration(s: String): (Long, Int) = {
    val re = "(\\d+)(mo|ms|us|µs|ns|y|w|d|h|m|s)".r
    val trimmed = s.trim
    var months = 0L
    var ns = 0L
    var consumed = 0
    for (m <- re.findAllMatchIn(trimmed)) {
      require(m.start == consumed,
        s"invalid duration literal '$s' at offset $consumed")
      consumed = m.end
      val n = m.group(1).toLong
      m.group(2) match {
        case "y"  => months += n * 12
        case "mo" => months += n
        case "w"  => ns += n * 7L * 86400L * 1000000000L
        case "d"  => ns += n * 86400L * 1000000000L
        case "h"  => ns += n * 3600L * 1000000000L
        case "m"  => ns += n * 60L * 1000000000L
        case "s"  => ns += n * 1000000000L
        case "ms" => ns += n * 1000000L
        case "us" | "µs" => ns += n * 1000L
        case "ns" => ns += n
      }
    }
    require(consumed == trimmed.length && consumed > 0,
      s"invalid duration literal '$s'")
    require(months <= Int.MaxValue, s"duration '$s' months overflow")
    (ns / 1000000000L, months.toInt)
  }

  private def parseField(
      raw: String,
      lo: Int,
      hi: Int,
      names: Seq[String]): (Set[Int], Boolean) = {
    // 7 = Sunday in the dow field, by convention — but only normalize
    // AFTER range expansion, so "5-7" (Fri-Sun) and "0-7" stay valid
    // ranges instead of becoming (5,0)/(0,0).
    val isDow = names == dowNames
    val hiTok = if (isDow) 7 else hi
    def num(tok: String): Int = {
      val up = tok.toUpperCase
      val byName = names.indexOf(up)
      val v =
        if (byName >= 0) byName + (if (names == monthNames) 1 else 0)
        else tok.toInt
      require(v >= lo && v <= hiTok, s"cron field value $tok out of [$lo,$hiTok]")
      v
    }
    var star = false
    val out = scala.collection.mutable.Set[Int]()
    raw.split(",").foreach { item =>
      val (range, step) = item.split("/") match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron item '$item'")
      }
      require(step >= 1, s"bad cron step in '$item'")
      val (a, b) =
        if (range == "*") { if (step == 1) star = true; (lo, hi) }
        else
          range.split("-") match {
            case Array(x)    => if (step == 1) { val v = num(x); (v, v) }
                                else (num(x), hiTok) // "a/step" runs to the max
            case Array(x, y) => (num(x), num(y))
            case _ => throw new IllegalArgumentException(s"bad cron range '$range'")
          }
      require(a <= b, s"inverted cron range '$item'")
      (a to b by step).foreach(v => out += (if (isDow && v == 7) 0 else v))
    }
    (out.toSet, star)
  }

  private val predefined = Map(
    "@yearly"   -> "0 0 1 1 *",
    "@annually" -> "0 0 1 1 *",
    "@monthly"  -> "0 0 1 * *",
    "@weekly"   -> "0 0 * * 0",
    "@daily"    -> "0 0 * * *",
    "@midnight" -> "0 0 * * *",
    "@hourly"   -> "0 * * * *")

  /** Parse a cron string in the influxdata/cron dialect (see object
    * scaladoc). Throws IllegalArgumentException on malformed input. */
  def parse(unparsed: String): Schedule = {
    val s0 = unparsed.trim
    if (s0.startsWith("@every ")) {
      val (secs, months) = parseDuration(s0.stripPrefix("@every "))
      return Every(secs, months)
    }
    val s = predefined.getOrElse(s0, s0)
    val f = s.split("\\s+").filter(_.nonEmpty)
    val (sec, min, hour, dom, mon, dow, year) = f.length match {
      case 5 => ("0", f(0), f(1), f(2), f(3), f(4), None)
      case 6 => (f(0), f(1), f(2), f(3), f(4), f(5), None)
      case 7 => (f(0), f(1), f(2), f(3), f(4), f(5), Some(f(6)))
      case n =>
        throw new IllegalArgumentException(
          s"cron string must have 5, 6 or 7 fields, got $n: '$unparsed'")
    }
    val (secS, _) = parseField(sec, 0, 59, Nil)
    val (minS, _) = parseField(min, 0, 59, Nil)
    val (hourS, _) = parseField(hour, 0, 23, Nil)
    val (domS, domStar) = parseField(dom, 1, 31, Nil)
    val (monS, _) = parseField(mon, 1, 12, monthNames)
    val (dowS, dowStar) = parseField(dow, 0, 6, dowNames)
    val yearS = year.map(y => parseField(y, 0, 9999, Nil)._1)
    Cron(secS, minS, hourS, domS, domStar, monS, dowS, dowStar, yearS)
  }

  /** scheduler.go:55-86 NewSchedule: parse + align the last-scheduled
    * time. For `@every` the time is aligned down to a multiple of the
    * interval (Go Truncate from the zero time); otherwise it is returned
    * second-truncated as-is. Returns (schedule, alignedLastScheduled). */
  def newSchedule(unparsed: String, lastScheduledAtSec: Long): (Schedule, Long) = {
    val sch = parse(unparsed)
    sch match {
      case e: Every =>
        val stepSec = e.durationFromSec(lastScheduledAtSec)
        (sch, goTruncate(lastScheduledAtSec, stepSec))
      case _ => (sch, lastScheduledAtSec)
    }
  }
}
