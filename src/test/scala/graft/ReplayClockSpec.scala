package graft

import graft.sources.ReplayClock
import org.apache.spark.sql.functions._

/** Replay clock pacing laws (clock/clock.go + replay.go:49-79/183-230)
  * — all computed as data, no wall-clock sleeps anywhere. */
class ReplayClockSpec extends SparkSpec {

  private val Zero = 5_000_000_000L // replay start wall, µs

  private def pts(times: Long*) = {
    val sparkS = spark
    import sparkS.implicits._
    times.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("seq", "t_us")
  }

  private def sched(df: org.apache.spark.sql.DataFrame, mode: ReplayClock.Mode,
      recTime: Boolean) =
    ReplayClock.streamSchedule(df, "t_us", "seq", Zero, mode, recTime,
        recordingIdCol = None)
      .orderBy("seq")
      .select("t_us", "emit_wall_us", "eff_time_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("Fast clock ≡ the batch path: everything emits at zero, recTime keeps stamps") {
    val recorded = Seq(100L, 250L, 900L, 1000L)
    val out = sched(pts(recorded: _*), ReplayClock.Fast, recTime = true)
    assert(out.map(_._2) === Seq.fill(4)(Zero))       // Until is a no-op
    assert(out.map(_._3) === recorded)                // points untouched
  }

  test("Real clock yields the recorded inter-point gaps, anchored at zero") {
    val out = sched(pts(100L, 250L, 900L, 1000L), ReplayClock.Real, recTime = true)
    val walls = out.map(_._2)
    assert(walls.head === Zero) // first point lands at the replay start
    // consecutive wall gaps == recorded gaps
    assert(walls.sliding(2).map(p => p(1) - p(0)).toSeq === Seq(150L, 650L, 100L))
  }

  test("recTime=false re-stamps points onto the replay timeline (waitTime)") {
    val out = sched(pts(100L, 250L, 900L), ReplayClock.Real, recTime = false)
    assert(out.map(_._3) === Seq(Zero, Zero + 150L, Zero + 800L))
    // and Fast mode applies the SAME rewrite (SetTime precedes Until)
    val fast = sched(pts(100L, 250L, 900L), ReplayClock.Fast, recTime = false)
    assert(fast.map(_._3) === Seq(Zero, Zero + 150L, Zero + 800L))
  }

  test("out-of-order recording: wall clamps to the running max, the rewrite does not") {
    // head is NOT the oldest point — t_first = 500 (file order), the
    // reference anchors diff on it and Until returns immediately for the
    // straggler at 300
    val out = sched(pts(500L, 800L, 300L, 900L), ReplayClock.Real, recTime = false)
    assert(out.map(_._2) === Seq(Zero, Zero + 300L, Zero + 300L, Zero + 400L))
    // SetTime uses the unclamped waitTime: the straggler is re-stamped
    // BEFORE the replay start
    assert(out.map(_._3) === Seq(Zero, Zero + 300L, Zero - 200L, Zero + 400L))
  }

  // ------------------------------------------------------------- batches

  private def batches(rows: (Long, Option[Long], Option[Long], Option[Long])*) = {
    val sparkS = spark
    import sparkS.implicits._
    rows.toSeq.toDF("seq", "begin_us", "first_us", "last_us")
  }

  private def bsched(df: org.apache.spark.sql.DataFrame, mode: ReplayClock.Mode,
      recTime: Boolean) =
    ReplayClock.batchSchedule(df, "seq", "begin_us", "first_us", "last_us",
        Zero, mode, recTime, recordingIdCol = None)
      .orderBy("seq").select("emit_wall_us", "eff_tmax_us")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq

  test("batch Real: Until(lastTime) — wall identical under BOTH recTime modes") {
    val b = batches(
      (0L, Some(120L), Some(100L), Some(120L)),
      (1L, Some(400L), Some(200L), Some(380L)),
      (2L, Some(900L), Some(600L), Some(900L)))
    val rec = bsched(b, ReplayClock.Real, recTime = true)
    val now = bsched(b, ReplayClock.Real, recTime = false)
    assert(rec.map(_._1) === now.map(_._1)) // replay.go computes the same instant both ways
    assert(rec.map(_._1) === Seq(Zero + 20L, Zero + 280L, Zero + 800L))
  }

  test("batch begin raised to the last point's EFFECTIVE time; begin itself unshifted") {
    val b = batches((0L, Some(110L), Some(100L), Some(120L))) // begin lags last point
    assert(bsched(b, ReplayClock.Real, recTime = true).head._2 === Some(120L))
    // recTime=false: last point re-stamped to Zero+20, begin (unshifted,
    // 110) lags it → raised to the shifted value
    assert(bsched(b, ReplayClock.Real, recTime = false).head._2 === Some(Zero + 20L))
    // begin AHEAD of the last point survives untouched
    val ahead = batches((0L, Some(500L), Some(100L), Some(120L)))
    assert(bsched(ahead, ReplayClock.Real, recTime = true).head._2 === Some(500L))
  }

  test("empty batches: skip Until, keep begin, inherit tmax when begin is Go-zero") {
    val b = batches(
      (0L, None, None, None),                       // empty before any points
      (1L, Some(120L), Some(100L), Some(120L)),
      (2L, None, None, None),                       // Go-zero begin → inherit
      (3L, Some(50L), None, None),                  // empty WITH a begin → keeps it
      (4L, Some(900L), Some(600L), Some(900L)))
    val out = bsched(b, ReplayClock.Real, recTime = true)
    assert(out(0) === (Zero, None))                 // nothing emitted yet → wall = zero
    assert(out(2) === (Zero + 20L, Some(120L)))     // wall unchanged, tmax inherited
    assert(out(3) === (Zero + 20L, Some(50L)))      // recorded begin kept
    assert(out(4) === (Zero + 800L, Some(900L)))
    // Fast clock: every batch at zero, tmax laws unchanged
    val fast = bsched(b, ReplayClock.Fast, recTime = true)
    assert(fast.map(_._1) === Seq.fill(5)(Zero))
    assert(fast.map(_._2) === out.map(_._2))
  }

  test("N recordings with recordingIdCol schedule independently (stream + batch)") {
    val sparkS = spark
    import sparkS.implicits._
    // two recordings interleaved in one frame; each must get its own
    // clock anchor and running max, identical to scheduling it alone
    val recA = Seq(100L, 250L, 900L)
    val recB = Seq(7000L, 7100L, 9000L)
    val multi = (recA.zipWithIndex.map { case (t, i) => ("a", i.toLong, t) } ++
        recB.zipWithIndex.map { case (t, i) => ("b", i.toLong, t) })
      .toDF("rec", "seq", "t_us")
      .repartition(4) // arbitrary physical layout must not matter
    val out = ReplayClock.streamSchedule(multi, "t_us", "seq", Zero,
        ReplayClock.Real, recTime = false, recordingIdCol = Some("rec"))
      .orderBy("rec", "seq")
      .select("rec", "emit_wall_us", "eff_time_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def solo(times: Seq[Long]) = sched(pts(times: _*), ReplayClock.Real, recTime = false)
    assert(out.filter(_._1 == "a").map(t => (t._2, t._3)) ===
      solo(recA).map(t => (t._2, t._3)))
    assert(out.filter(_._1 == "b").map(t => (t._2, t._3)) ===
      solo(recB).map(t => (t._2, t._3)))
    // batch side: same independence law
    val bm = Seq(
      ("a", 0L, Some(120L), Some(100L), Some(120L)),
      ("b", 0L, Some(900L), Some(600L), Some(900L)),
      ("a", 1L, Some(400L), Some(200L), Some(380L)))
      .toDF("rec", "seq", "begin_us", "first_us", "last_us").repartition(3)
    val bout = ReplayClock.batchSchedule(bm, "seq", "begin_us", "first_us",
        "last_us", Zero, ReplayClock.Real, recTime = true, recordingIdCol = Some("rec"))
      .orderBy("rec", "seq").select("rec", "emit_wall_us")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // recording b anchors its OWN t0 (600), not recording a's: its single
    // batch emits at Zero + (900 − 600), same as scheduling it alone
    assert(bout === Seq(("a", Zero + 20L), ("a", Zero + 280L), ("b", Zero + 300L)))
  }

  test("batchPointTime matches the stream rewrite arithmetic") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(100L, 250L).toDF("t_us")
      .withColumn("eff", ReplayClock.batchPointTime(col("t_us"), 100L, Zero, recTime = false))
    assert(df.select("eff").as[Long].collect().toSeq === Seq(Zero, Zero + 150L))
    val keep = Seq(100L, 250L).toDF("t_us")
      .withColumn("eff", ReplayClock.batchPointTime(col("t_us"), 100L, Zero, recTime = true))
    assert(keep.select("eff").as[Long].collect().toSeq === Seq(100L, 250L))
  }
}
