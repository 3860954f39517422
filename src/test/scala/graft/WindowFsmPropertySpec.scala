package graft

import graft.operators.WindowFSM
import org.apache.spark.sql.functions._

/** Randomized parity of the UNALIGNED WindowFSM against a direct
  * sequential port of the Go window law (window.go:122/193-217: nextEmit
  * anchors at first+every; a trigger point emits [nextEmit−period,
  * nextEmit) stamped nextEmit, then nextEmit = t+every; the trigger
  * inserts AFTER the emit). The aligned variant's property lives in
  * PropertySpec; this covers the anchor-on-first-point branch the
  * KapacitorLoopback goldens hand-derived. Empty batches are excluded on
  * both sides (rows can't express them — documented WindowFSM deviation). */
class WindowFsmPropertySpec extends SparkSpec {
  import spark.implicits._

  private def goUnaligned(times: Seq[Long], periodS: Long, everyS: Long): Seq[(Long, Seq[Long])] = {
    val out = Seq.newBuilder[(Long, Seq[Long])]
    var buf = Vector.empty[Long]
    var nextEmit = 0L
    var first = true
    for (t <- times) {
      if (first) { nextEmit = t + everyS; first = false }
      if (t >= nextEmit) {
        val oldest = nextEmit - periodS
        buf = buf.dropWhile(_ < oldest)
        out += ((nextEmit, buf))
        nextEmit = t + everyS
      }
      buf :+= t
    }
    out.result()
  }

  test("windowByTime (unaligned) ≡ sequential Go window law on random point sets") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(50)
      val times = Seq.fill(n)(rnd.nextInt(400).toLong).distinct.sorted
      val every = 1L + rnd.nextInt(12)
      val period = 1L + rnd.nextInt(30)
      val expected = goUnaligned(times, period, every)
        .filter(_._2.nonEmpty)
        .map { case (e, pts) => (e * 1000000L, pts.map(_ * 1000000L)) }
      val df = times.map(t => Tuple1(new java.sql.Timestamp(t * 1000L))).toDF("time")
      val got = WindowFSM.windowByTime(df, "time", Nil, period, every)
        .select(col("wemit_us"), unix_micros(col("time")).as("t"))
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val exp = expected.toMap
      assert(got == exp,
        s"trial=$trial period=$period every=$every times=$times\n got=$got\n exp=$exp")
    }
  }
}
