package graft

import graft.operators.BatchScheduler
import graft.operators.BatchScheduler.{CronTicker, EveryTicker}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Batch query() scheduling parity (reference batch.go:234-306 +
  * query.go:37-70): ticker stepping over a fake clock, cron alignment, and
  * the union-of-period-frames ≡ one-bounded-query invariant. */
class BatchSchedulerSpec extends SparkSpec {
  import spark.implicits._

  test("EveryTicker aligns like Go time.Round (nearest, half away from zero)") {
    val t = EveryTicker(60, align = true)
    assert(t.next(0) == 60)
    assert(t.next(29) == 60)   // 89 rounds down
    assert(t.next(30) == 120)  // 90 is half → away from zero
    assert(t.next(31) == 120)  // 91 rounds up
    val u = EveryTicker(60, align = false)
    assert(u.next(17) == 77)
  }

  test("queries() reproduces the Queries(start, stop) period stepping") {
    // every=10s aligned, offset=2s, period=10s from start=5 to stop=45:
    // next(5) = Round(15) = 20 (half away from zero), then 30, 40;
    // windows are [t-12, t-2)
    val qs = BatchScheduler.queries(EveryTicker(10, align = true), 5, 45,
      periodSec = 10, offsetSec = 2, nowSec = 45)
    assert(qs == Vector((20L, 8L, 18L), (30L, 18L, 28L), (40L, 28L, 38L)))
    // qstop > now stops the loop early
    val cut = BatchScheduler.queries(EveryTicker(10, align = true), 5, 45,
      periodSec = 10, offsetSec = 2, nowSec = 27)
    assert(cut.map(_._1) == Vector(20L))
  }

  test("cron ticker: minute steps, hour alignment, dom/dow OR rule") {
    // every 5 minutes
    val c5 = CronTicker("*/5 * * * *")
    assert(c5.next(0) == 300 && c5.next(300) == 600 && c5.next(301) == 600)
    // daily at 01:30 UTC
    val daily = CronTicker("30 1 * * *")
    assert(daily.next(0) == 5400 && daily.next(5400) == 86400 + 5400)
    // 1970-01-01 is a Thursday (dow 4); dom=2 OR dow=4 fires same day
    val or = CronTicker("0 0 2 * 4")
    assert(or.next(60) == 86400) // midnight Jan 2 (dom=2 also Friday)
    // cron-driven queries() stepping
    val qs = BatchScheduler.queries(CronTicker("*/10 * * * *"), 0, 1800, periodSec = 600)
    assert(qs == Vector((600L, 0L, 600L), (1200L, 600L, 1200L), (1800L, 1200L, 1800L)))
  }

  test("union of per-period bounded reads ≡ one bounded query; matches assignEveryTicks") {
    val df = (0L until 300L by 7).map(sec => (sec, new Timestamp(sec * 1000), sec * 1.5))
      .toDF("id", "time", "v")
    val ticker = EveryTicker(60, align = true)
    val mn = 0L; val mx = 294L
    val windows = BatchScheduler.queries(ticker, mn, mx, periodSec = 60, nowSec = mx)
    // per-tick bounded reads (the scheduler's per-period frames), unioned
    val perPeriod = windows.map { case (tick, qstart, qstop) =>
      df.filter(unix_timestamp(col("time")) >= qstart && unix_timestamp(col("time")) < qstop)
        .withColumn("tick_us", lit(tick * 1000000L))
    }.reduce(_ unionByName _)
    val expected = perPeriod.select("tick_us", "id").as[(Long, Long)].collect().toSet
    // one declarative pass
    val declarative = BatchScheduler.assignEveryTicks(df, "time",
      everySeconds = 60, align = true, periodSeconds = 60)
      .select("tick_us", "id").as[(Long, Long)].collect().toSet
    assert(declarative == expected)
    // and it equals the single bounded query over the covered range
    val covered = df.filter(unix_timestamp(col("time")) < windows.last._3)
      .select("id").as[Long].collect().toSet
    assert(declarative.map(_._2) == covered)
  }

  test("assignEveryTicks with period > every duplicates rows into overlapping frames") {
    val df = Seq((1L, new Timestamp(65 * 1000), 1.0)).toDF("id", "time", "v")
      .union(Seq((2L, new Timestamp(250 * 1000), 2.0)).toDF("id", "time", "v"))
    val out = BatchScheduler.assignEveryTicks(df, "time",
      everySeconds = 60, align = true, periodSeconds = 120)
      .select(col("id"), (col("tick_us") / 1000000L).cast("long")).as[(Long, Long)]
      .collect().toSet
    // point at 65s is read by ticks 120 and 180 ([0,120) and [60,180));
    // ticks stop at mx=250 → point 250 not yet read
    assert(out == Set((1L, 120L), (1L, 180L)))
  }
}
