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

  test("salted aggregation composes with windowByTime on a planted hot group") {
    // The FSM layer repartitions by the group dims — a hot group streams
    // through ONE task there by design (O(1) FSM state, wall bounded by the
    // group's own size). The skew surface that remains is the DOWNSTREAM
    // aggregation of the emitted windows: a hot (group, emit) key funnels
    // its rows into one final-agg partition unless the partial phase has
    // collapsed them. Salt.saltedSumCount is that guard — this pins that it
    // composes with WindowFSM output and reproduces the plain aggregate
    // exactly (values are integer-valued doubles, so sums are
    // order-independent and the equality is bitwise).
    val hot = (0 until 20000).map(i => ("hot", i.toLong, (i % 97).toDouble))
    val cold = for (g <- 0 until 20; i <- 0 until 60)
      yield (s"g$g", i.toLong * 7, (i % 13).toDouble)
    val df = (hot ++ cold).toDF("group", "sec", "value")
      .withColumn("time", timestamp_micros($"sec" * 1000000L))
    val windows = WindowFSM.windowByTime(df, "time", Seq("group"),
      periodSeconds = 60, everySeconds = 60)

    val plain = windows.groupBy($"group", $"wemit_us")
      .agg(sum($"value").as("sum_v"), count(lit(1)).as("cnt"))
      .withColumn("mean_v", $"sum_v" / $"cnt")
      .as[(String, Long, Double, Long, Double)].collect().toSet
    val salted = graft.operators.Salt
      .saltedSumCount(windows, Seq("group", "wemit_us"), "value", salts = 8)
      .select($"group", $"wemit_us", $"sum_v", $"cnt", $"mean_v")
      .as[(String, Long, Double, Long, Double)].collect().toSet
    assert(salted == plain)

    // the salt really spread the hot group's rows: its windows use several
    // sub-keys, so the final agg sees ≤ salts rows per hot key instead of
    // the window's full row count
    val spread = windows.filter($"group" === "hot")
      .select(pmod(crc32($"value".cast("string")), lit(8))).distinct().count()
    assert(spread >= 4, s"salt spread only $spread of 8 sub-keys")
    // and the hot group dominates the row volume — the skew was real
    assert(hot.size >= 10 * cold.size)
  }
}
