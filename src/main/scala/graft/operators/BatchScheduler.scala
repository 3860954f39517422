package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's batch `query()` scheduling (batch.go:170-360): a ticker
  * (`every` with optional align, or a cron expression) fires at times T;
  * each tick runs the task's SELECT with injected bounds
  * `time >= T-offset-period AND time < T-offset` (query.go:37-70, period
  * stepping batch.go:277-306), producing one framed batch per tick.
  *
  * Spark rendering: scheduling is metadata, not data — the tick sequence is
  * a pure function of (schedule, start, stop). Two paths:
  *
  *  - [[assignEveryTicks]] — fully declarative for `every` schedules: each
  *    row computes its covering tick indices in closed form (the same
  *    explode-bounded-ticks shape as Pipe.windowAligned), so a 100 TB
  *    backfill is one scan with the time predicate pushed down, no driver
  *    loop, no collect.
  *  - [[queries]] — the literal Queries(start, stop) loop (batch.go:
  *    277-306) over any [[Ticker]] incl. cron, for spec parity and for
  *    driving externally-scheduled incremental reads; bounds come from the
  *    schedule config, never from a data action.
  */
object BatchScheduler {

  sealed trait Ticker {
    /** Next tick strictly after `tSec` (epoch seconds) — batch.go:511-517. */
    def next(tSec: Long): Long
  }

  /** every + align (batch.go:449-517): next = t+every, rounded (Go
    * time.Round — nearest multiple, half away from zero) when aligned. */
  final case class EveryTicker(everySec: Long, align: Boolean = false) extends Ticker {
    require(everySec > 0)
    def next(tSec: Long): Long = {
      val n = tSec + everySec
      if (align) {
        val q = Math.floorDiv(n, everySec)
        val r = Math.floorMod(n, everySec)
        (if (2 * r >= everySec) q + 1 else q) * everySec
      } else n
    }
  }

  /** Five-field cron (minute hour day-of-month month day-of-week), UTC —
    * the subset of cronexpr the reference's tests exercise. Supports `*`,
    * lists, ranges and `/step`; when both dom and dow are restricted the
    * standard OR rule applies. */
  final case class CronTicker(expr: String) extends Ticker {
    private val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron must have 5 fields: $expr")
    private def parse(f: String, lo: Int, hi: Int): Set[Int] =
      f.split(',').flatMap { part =>
        val (rangePart, step) = part.split('/') match {
          case Array(r, s) => (r, s.toInt)
          case Array(r)    => (r, 1)
        }
        val (a, b) = rangePart match {
          case "*"                    => (lo, hi)
          case r if r.contains('-')   => val Array(x, y) = r.split('-'); (x.toInt, y.toInt)
          case v                      => val i = v.toInt; (i, i)
        }
        a to b by step
      }.toSet
    private val mins = parse(fields(0), 0, 59)
    private val hours = parse(fields(1), 0, 23)
    private val doms = parse(fields(2), 1, 31)
    private val months = parse(fields(3), 1, 12)
    private val dows = parse(fields(4), 0, 6) // 0 = Sunday
    private val domStar = fields(2) == "*"
    private val dowStar = fields(4) == "*"

    def next(tSec: Long): Long = {
      var t = (Math.floorDiv(tSec, 60) + 1) * 60 // next whole minute
      val cap = tSec + 5L * 366 * 86400
      while (t < cap) {
        val z = java.time.Instant.ofEpochSecond(t).atZone(java.time.ZoneOffset.UTC)
        val domOk = doms.contains(z.getDayOfMonth)
        val dowOk = dows.contains(z.getDayOfWeek.getValue % 7)
        val dayOk =
          if (!domStar && !dowStar) domOk || dowOk
          else domOk && dowOk
        if (mins.contains(z.getMinute) && hours.contains(z.getHour) &&
          months.contains(z.getMonthValue) && dayOk) return t
        t += 60
      }
      throw new IllegalArgumentException(s"cron '$expr' has no match within 5 years")
    }
  }

  /** The Queries(start, stop) loop verbatim (batch.go:277-306): tick
    * sequence strictly after `startSec` up to `stopSec`, each yielding
    * (tick, qstart, qstop) with qstop = tick-offset, qstart = qstop-period;
    * ticks whose qstop is after `nowSec` stop the loop. */
  def queries(
      ticker: Ticker,
      startSec: Long,
      stopSec: Long,
      periodSec: Long,
      offsetSec: Long = 0,
      nowSec: Long = Long.MaxValue): Vector[(Long, Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long, Long)]
    var current = startSec
    var continue = true
    while (continue) {
      current = ticker.next(current)
      if (current > stopSec) continue = false
      else {
        val qstop = current - offsetSec
        if (qstop > nowSec) continue = false
        else out += ((current, qstop - periodSec, qstop))
      }
    }
    out.result()
  }

  /** Declarative period assignment for `every` schedules: stamp each row
    * with every tick whose query window [tick-offset-period, tick-offset)
    * contains it, as `tick_us`. Ticks run from the first tick after the
    * data's min time (the task start) through max time (now). One
    * stats-broadcast + one bounded explode (≤ ⌈period/every⌉ ticks/row) —
    * the whole backfill is a single declarative plan. */
  def assignEveryTicks(
      df: DataFrame,
      timeCol: String,
      everySeconds: Long,
      align: Boolean,
      periodSeconds: Long,
      offsetSeconds: Long = 0,
      as: String = "tick_us"): DataFrame = {
    val evU = everySeconds * 1000000L
    val offU = offsetSeconds * 1000000L
    val pU = periodSeconds * 1000000L
    val us = unix_micros(col(timeCol))
    val stats = df.agg(min(us).as("__mn"), max(us).as("__mx"))
    val d = df.crossJoin(broadcast(stats)).withColumn("__us", us)
    // tick base: aligned ticks sit on multiples of every; unaligned ticks on
    // mn + j*every (ticker stepping from the task start at mn)
    val b: Column = if (align) lit(0L) else col("__mn")
    val jFirst: Column =
      if (align) {
        // Round(mn+every, every), half away from zero (batch.go:511-517)
        val q = floor(col("__mn") / evU).cast("long")
        val r = col("__mn") - q * evU
        when(r * 2 >= evU, q + 2).otherwise(q + 1)
      } else lit(1L)
    // membership: qstart <= us < qstop  ⟺  us+off < T <= us+off+period
    val jLo = (floor((col("__us") + offU - b) / evU) + 1).cast("long")
    val jHi = floor((col("__us") + offU + pU - b) / evU).cast("long")
    val lo = greatest(jLo, jFirst)
    val js = when(jHi >= lo, sequence(lo, jHi)).otherwise(array().cast("array<long>"))
    d.withColumn("__j", explode(js))
      .withColumn(as, b + col("__j") * evU)
      .filter(col(as) <= col("__mx")) // ticker stops at stop=now=max
      .drop("__mn", "__mx", "__us", "__j")
  }
}
