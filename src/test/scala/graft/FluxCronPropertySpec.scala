package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.tick.FluxCron

/** Property checks for the cron engine: the field-advance `next` must
  * agree with a brute-force second-scanner on random schedules, and
  * `@every` alignment must be idempotent and grid-exact. */
class FluxCronPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Naive oracle: scan forward one second at a time. */
  private def bruteNext(c: FluxCron.Cron, from: Long, bound: Long): Option[Long] = {
    var t = from + 1
    while (t <= bound) {
      val dt = java.time.LocalDateTime.ofEpochSecond(t, 0, java.time.ZoneOffset.UTC)
      val cronDow = dt.getDayOfWeek.getValue % 7
      val dayOk =
        if (!c.domStar && !c.dowStar)
          c.dom.contains(dt.getDayOfMonth) || c.dow.contains(cronDow)
        else c.dom.contains(dt.getDayOfMonth) && c.dow.contains(cronDow)
      if (c.seconds.contains(dt.getSecond) && c.minutes.contains(dt.getMinute) &&
        c.hours.contains(dt.getHour) && dayOk && c.months.contains(dt.getMonthValue) &&
        c.years.forall(_.contains(dt.getYear)))
        return Some(t)
      t += 1
    }
    None
  }

  // random field subsets dense enough that a match lands within the
  // scan bound (a couple of days)
  private val genCron: Gen[FluxCron.Cron] = for {
    secs <- Gen.nonEmptyListOf(Gen.choose(0, 59)).map(_.toSet)
    mins <- Gen.nonEmptyListOf(Gen.choose(0, 59)).map(_.toSet)
    hours <- Gen.someOf(0 to 23).suchThat(_.size >= 6).map(_.toSet)
    domAll <- Gen.oneOf(true, false)
    dom <- if (domAll) Gen.const((1 to 31).toSet)
           else Gen.someOf(1 to 28).suchThat(_.size >= 10).map(_.toSet)
    dowAll <- Gen.oneOf(true, false)
    dow <- if (dowAll) Gen.const((0 to 6).toSet)
           else Gen.someOf(0 to 6).suchThat(_.size >= 3).map(_.toSet)
  } yield FluxCron.Cron(secs, mins, hours, dom, domAll, (1 to 12).toSet,
    dow, dowAll, None)

  test("field-advance next ≡ brute-force second scan on random crons") {
    val genFrom = Gen.choose(1400000000L, 1700000000L)
    holds(Prop.forAll(genCron, genFrom) { (c, from) =>
      val bound = from + 3 * 86400L
      bruteNext(c, from, bound) match {
        case Some(exp) => c.next(from) == exp
        case None => true // too sparse for the scan bound — skip
      }
    })
  }

  test("next is strictly increasing and idempotent from its own output") {
    val genFrom = Gen.choose(1400000000L, 1700000000L)
    holds(Prop.forAll(genCron, genFrom) { (c, from) =>
      val n1 = c.next(from)
      val n2 = c.next(n1)
      n1 > from && n2 > n1 && c.next(n1 - 1) == n1
    })
  }

  test("@every alignment is idempotent, grid-exact, and never in the future") {
    val genStep = Gen.oneOf(1L, 5L, 30L, 60L, 420L, 3600L, 10800L, 86400L)
    val genT = Gen.choose(0L, 1800000000L)
    holds(Prop.forAll(genStep, genT) { (step, t) =>
      val a = FluxCron.goTruncate(t, step)
      a <= t && t - a < step &&
        FluxCron.goTruncate(a, step) == a &&
        java.lang.Math.floorMod(a + FluxCron.GoZeroOffsetSec, step) == 0L
    })
  }

  test("dow 7 normalizes to Sunday per expanded element, not per range endpoint") {
    // "0-7" is every day — a restricted set covering the full range
    val all = FluxCron.parse("0 0 * * 0-7").asInstanceOf[FluxCron.Cron]
    assert(all.dow == (0 to 6).toSet)
    assert(!all.dowStar)
    // "5-7" is Fri..Sun, not an inverted range
    val friSun = FluxCron.parse("0 0 * * 5-7").asInstanceOf[FluxCron.Cron]
    assert(friSun.dow == Set(5, 6, 0))
    // single 7 is Sunday; "7/2" starts at Sunday-as-7 and runs to max
    assert(FluxCron.parse("0 0 * * 7").asInstanceOf[FluxCron.Cron].dow == Set(0))
    assert(FluxCron.parse("0 0 * * 7/2").asInstanceOf[FluxCron.Cron].dow == Set(0))
    // a Fri-Sun schedule actually fires on Sunday (2023-10-01 was one)
    val dt = java.time.LocalDateTime.of(2023, 9, 30, 23, 59, 59)
    val sun = java.time.LocalDateTime.ofEpochSecond(
      friSun.next(dt.toEpochSecond(java.time.ZoneOffset.UTC)), 0,
      java.time.ZoneOffset.UTC)
    assert(sun.getDayOfWeek == java.time.DayOfWeek.SUNDAY)
    // 8 is still out of range
    intercept[IllegalArgumentException](FluxCron.parse("0 0 * * 8"))
  }

  test("fire sequence from an aligned start stays on the @every grid") {
    val genStep = Gen.oneOf(60L, 420L, 3600L)
    val genT = Gen.choose(1400000000L, 1700000000L)
    holds(Prop.forAll(genStep, genT) { (step, t) =>
      val (sch, last) = FluxCron.newSchedule(s"@every ${step}s", t)
      val fires = Iterator.iterate(sch.next(last))(sch.next).take(5).toSeq
      fires.zipWithIndex.forall { case (f, i) => f == last + (i + 1) * step } &&
        java.lang.Math.floorMod(last + FluxCron.GoZeroOffsetSec, step) == 0L
    })
  }
}
