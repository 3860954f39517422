package graft

import graft.operators.{Barrier, WindowFSM}
import org.apache.spark.sql.functions._

/** Randomized differential test for the batch barrier simulator: the Spark
  * operator (repartition + secondary sort + streaming-fold mapPartitions,
  * plus the barrier-aware window FSM) must agree with a PLAIN SEQUENTIAL
  * in-test simulator of the reference's barrier.go + window.go semantics on
  * arbitrary (data time, arrival time) timelines across multiple groups.
  * The two implementations share only the semantics, not the execution
  * substrate — partition handling, group flushing, and the pending-queue
  * iterator are exactly what this fuzzes. */
class BarrierPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: barrier generation (idle or periodic) for one
    * group's (dataUs, arrivalUs) points, arrival-ordered. Returns the
    * surviving points and the barrier (dataUs, wallUs) events, merged in
    * wall order. */
  private def simulate(
      pts: Seq[(Long, Long)], everyUs: Long, endWallUs: Long,
      periodic: Boolean): Seq[(Long, Boolean)] = {
    val out = Seq.newBuilder[(Long, Boolean)] // (dataUs, isBarrier) in wall order
    var lastPoint = 0L
    var lastBarrier = Long.MinValue
    var deadline = 0L
    var started = false
    def fire(upTo: Long): Unit =
      while (deadline <= upTo) {
        val bt = if (periodic) deadline else lastPoint + everyUs
        if (!periodic) lastPoint = bt
        lastBarrier = bt
        out += ((bt, true))
        deadline += everyUs
      }
    pts.sortBy(p => (p._2, p._1)).foreach { case (t, a) =>
      if (!started) {
        started = true
        lastPoint = t; deadline = a + everyUs
        out += ((t, false))
      } else {
        fire(a)
        if (t >= lastBarrier) {
          out += ((t, false))
          lastPoint = t
          if (!periodic) deadline = a + everyUs
        }
      }
    }
    if (started) fire(endWallUs)
    out.result()
  }

  /** Sequential window FSM over the merged message stream. Returns the
    * multiset of (emitUs, batchSize). */
  private def windows(
      msgs: Seq[(Long, Boolean)], periodUs: Long, everyUs: Long): Seq[(Long, Int)] = {
    val out = Seq.newBuilder[(Long, Int)]
    var nextEmit = 0L
    var started = false
    val buf = scala.collection.mutable.ArrayDeque.empty[Long]
    msgs.foreach { case (t, isBarrier) =>
      if (!started) { started = true; nextEmit = t + everyUs }
      else if (t >= nextEmit) {
        val oldest = nextEmit - periodUs
        while (buf.nonEmpty && buf.head < oldest) buf.removeHead()
        if (buf.nonEmpty) out += ((nextEmit, buf.size)) // rows can't be empty batches
        nextEmit = t + everyUs
      }
      if (!isBarrier) buf.append(t)
    }
    out.result()
  }

  test("Barrier.idle/periodic + WindowFSM ≡ a sequential reference simulator (randomized)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 25) {
      val periodic = trial % 2 == 0
      val everyS = 1 + rnd.nextInt(4)
      val winEveryS = 1 + rnd.nextInt(4)
      val winPeriodS = winEveryS + rnd.nextInt(8)
      val groups = 1 + rnd.nextInt(3)
      val flood = rnd.nextBoolean()
      val rows = for {
        g <- 0 until groups
        n = 2 + rnd.nextInt(10)
        i <- 0 until n
      } yield {
        val t = rnd.nextInt(25).toLong * 1000000L
        val a = if (flood) 26000000L else t // live replay or instant flood
        (s"g$g", new java.sql.Timestamp(t / 1000), a, i.toLong)
      }
      val maxArrival = rows.map(_._3).max
      val endWall = maxArrival + rnd.nextInt(15).toLong * 1000000L
      val df = rows.toDF("grp", "time", "arrival_us", "pid")

      // +1µs keeps barrier fire times off the integer-second arrival grid,
      // so the (wall evt, data) sort order is strict and both substrates
      // process messages identically (real ties are a goroutine race in the
      // reference — nothing deterministic to pin there)
      val everyOff = everyS + 1e-6
      val msgs =
        if (periodic) Barrier.periodic(df, "time", "arrival_us", Seq("grp"), everyOff, endWall)
        else Barrier.idle(df, "time", "arrival_us", Seq("grp"), everyOff, endWall)
      val w = WindowFSM.windowByTime(msgs, "time", Seq("grp"),
        winPeriodS, winEveryS, barrierCol = Some("__barrier"), orderCol = Some("__evt_us"))
      val got = w.groupBy("grp", "wemit_us").count()
        .as[(String, Long, Long)].collect()
        .map { case (g, e, c) => (g, e, c.toInt) }.toSet

      val expected = (0 until groups).flatMap { g =>
        val pts = rows.filter(_._1 == s"g$g")
          .map(r => (r._2.getTime * 1000L, r._3))
        val merged = simulate(pts, everyS * 1000000L + 1L, endWall, periodic)
        windows(merged, winPeriodS * 1000000L, winEveryS * 1000000L)
          .map { case (e, c) => (s"g$g", e, c) }
      }.toSet

      assert(got == expected,
        s"trial $trial (periodic=$periodic every=$everyS win=$winPeriodS/$winEveryS " +
          s"flood=$flood endWall=$endWall):\n got=$got\n exp=$expected\n rows=$rows")
    }
  }
}
