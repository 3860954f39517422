package graft

import graft.streaming.AlertStream._
import graft.streaming.{AlertStream, WindowStream}
import graft.streaming.WindowStream.{CountPoint, CountWindowAgg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000000L

  private def pt(g: String, t: Long, level: Int): AlertPoint =
    AlertPoint(g, t * us, level >= 1, level >= 2, level >= 3)

  test("alert FSM emits on non-OK and on recovery, with run duration") {
    val points = Seq(pt("g", 1, 0), pt("g", 2, 1), pt("g", 3, 1), pt("g", 4, 3), pt("g", 5, 0), pt("g", 6, 0))
    val out = runBatch(points.toDS(), AlertConfig()).collect().sortBy(_.timeUs).toSeq
    assert(out.map(e => (e.timeUs / us, e.levelName, e.durationUs / us, e.changed)) == Seq(
      (2L, "INFO", 0L, true),
      (3L, "INFO", 1L, false),
      (4L, "CRITICAL", 2L, true),
      (5L, "OK", 3L, true))) // recovery emitted once; t=6 silent
  }

  test("stateChangesOnly suppresses repeats") {
    val points = Seq(pt("g", 1, 1), pt("g", 2, 1), pt("g", 3, 2), pt("g", 4, 2), pt("g", 5, 0))
    val out = runBatch(points.toDS(), AlertConfig(stateChangesOnly = true))
      .collect().sortBy(_.timeUs).toSeq
    assert(out.map(e => (e.timeUs / us, e.level)) == Seq((1L, 1), (3L, 2), (5L, 0)))
  }

  test("stateChangesOnly maxInterval re-emits stale unchanged state") {
    val cfg = AlertConfig(stateChangesOnly = true, stateChangesOnlyMaxIntervalUs = 3 * us)
    val points = Seq(pt("g", 1, 1), pt("g", 2, 1), pt("g", 5, 1), pt("g", 6, 1))
    val out = runBatch(points.toDS(), cfg).collect().sortBy(_.timeUs).toSeq
    // t=1 emits (change), t=2 suppressed, t=5 re-emits (3s since last
    // emit), t=6 suppressed again
    assert(out.map(_.timeUs / us) == Seq(1L, 5L))
  }

  test("noRecoveries drops the OK event but keeps the run") {
    val points = Seq(pt("g", 1, 1), pt("g", 2, 0), pt("g", 3, 1))
    val out = runBatch(points.toDS(), AlertConfig(noRecoveries = true))
      .collect().sortBy(_.timeUs).toSeq
    assert(out.map(_.level) == Seq(1, 1))
    assert(out.map(_.durationUs / us) == Seq(0L, 0L)) // second run restarts
  }

  test("reset expression holds the level (hysteresis)") {
    val cfg = AlertConfig(resetDefined = Seq(true, false, false))
    val points = Seq(
      AlertPoint("g", 1 * us, pass1 = true, pass2 = false, pass3 = false),
      // pass1 now false but reset1 also false → INFO held
      AlertPoint("g", 2 * us, pass1 = false, pass2 = false, pass3 = false, reset1 = false),
      // reset passes → falls back to OK
      AlertPoint("g", 3 * us, pass1 = false, pass2 = false, pass3 = false, reset1 = true))
    val out = runBatch(points.toDS(), cfg).collect().sortBy(_.timeUs).toSeq
    assert(out.map(e => (e.timeUs / us, e.level)) == Seq((1L, 1), (2L, 1), (3L, 0)))
  }

  test("flapping suppresses rapidly alternating levels") {
    val points = (1 to 40).map(i => pt("g", i, i % 2)) // OK/INFO every point
    val out = runBatch(points.toDS(), AlertConfig(useFlapping = true, historyLen = 5))
      .collect().sortBy(_.timeUs).toSeq
    // alternation drives percentChange to 1.0 > 0.5 quickly → later points suppressed
    assert(out.nonEmpty && out.length < 20)
    assert(out.forall(_.timeUs / us <= 5))
  }

  test("percentChange weights recent changes more") {
    // all-same history → 0. Alternating ring of 5 (idx=2): the three
    // youngest pairs differ (weights 0.8, 0.9, 1.0), the wrap pair matches
    // → (0.8+0.9+1.0)/4 = 0.675
    assert(AlertStream.percentChange(Vector(0, 0, 0, 0, 0), 2) == 0.0)
    assert(math.abs(AlertStream.percentChange(Vector(0, 1, 0, 1, 0), 2) - 0.675) < 1e-9)
  }

  test("streaming alert FSM matches batch across micro-batches") {
    implicit val ctx = spark.sqlContext
    val cfg = AlertConfig(stateChangesOnly = true)
    val all = Seq(pt("g", 1, 1), pt("g", 2, 1), pt("g", 3, 2), pt("h", 1, 0),
      pt("g", 4, 0), pt("h", 2, 3))
    val ms = MemoryStream[AlertPoint]
    val q = runStreaming(ms.toDS(), cfg).writeStream
      .format("memory").queryName("alerts_t").outputMode("update").start()
    try {
      ms.addData(all.take(3)); q.processAllAvailable()
      ms.addData(all.drop(3)); q.processAllAvailable()
      val streamed = spark.table("alerts_t").as[AlertEvent].collect()
        .map(e => (e.group, e.timeUs, e.level, e.durationUs)).toSet
      val batch = runBatch(all.toDS(), cfg).collect()
        .map(e => (e.group, e.timeUs, e.level, e.durationUs)).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("count window emits every m-th point over the last n") {
    implicit val ctx = spark.sqlContext
    val pts = (1 to 5).map(i => CountPoint("g", i * us, i.toDouble))
    val ms = MemoryStream[CountPoint]
    val q = WindowStream.countWindowMean(ms.toDS(), n = 3, m = 2).writeStream
      .format("memory").queryName("cw_t").outputMode("update").start()
    try {
      ms.addData(pts.take(2)); q.processAllAvailable()
      ms.addData(pts.drop(2)); q.processAllAvailable()
      val out = spark.table("cw_t").as[CountWindowAgg].collect().sortBy(_.timeUs)
      assert(out.map(a => (a.timeUs / us, a.n, a.mean)).toSeq == Seq(
        (2L, 2, 1.5), // seen=2 → last 2
        (4L, 3, 3.0))) // seen=4 → last 3 (2,3,4)
    } finally q.stop()
  }

  test("fillPeriod waits for a full window before emitting") {
    implicit val ctx = spark.sqlContext
    val pts = (1 to 4).map(i => CountPoint("g", i * us, i.toDouble))
    val ms = MemoryStream[CountPoint]
    val q = WindowStream.countWindowMean(ms.toDS(), n = 3, m = 2, fillPeriod = true)
      .writeStream.format("memory").queryName("cw_fp").outputMode("update").start()
    try {
      ms.addData(pts); q.processAllAvailable()
      val out = spark.table("cw_fp").as[CountWindowAgg].collect().sortBy(_.timeUs)
      assert(out.map(a => (a.timeUs / us, a.n)).toSeq == Seq((4L, 3)))
    } finally q.stop()
  }

  test("full pipeline runs identically in batch and streaming (M5)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // stream: filter(value > 50) |window(60s tumbling)| mean per group
    val ms = MemoryStream[CountPoint]
    val stream = ms.toDS().toDF()
      .withColumn("time", timestamp_micros($"timeUs"))
      .filter($"value" > 50)
    val agg = WindowStream.windowedMeanCount(stream, "time", "value", Seq("group"), 60, 60, "10 seconds")
    val q = agg.writeStream.format("memory").queryName("e2e_t").outputMode("append").start()
    try {
      val batch1 = Seq(
        CountPoint("a", 10 * us, 60.0), CountPoint("a", 20 * us, 80.0),
        CountPoint("a", 30 * us, 40.0), // filtered out
        CountPoint("b", 15 * us, 100.0))
      ms.addData(batch1); q.processAllAvailable()
      // late-ish batch advances the watermark past the first minute
      ms.addData(Seq(CountPoint("a", 400 * us, 70.0))); q.processAllAvailable()
      ms.addData(Seq(CountPoint("a", 600 * us, 70.0))); q.processAllAvailable()
      val streamed = spark.table("e2e_t")
        .select($"group", unix_timestamp($"wstart").as("ws"), $"cnt", $"mean_v")
        .as[(String, Long, Long, Double)].collect().toSet
      // batch rendering of the same pipeline over the same rows
      val all = (batch1 ++ Seq(CountPoint("a", 400 * us, 70.0), CountPoint("a", 600 * us, 70.0))).toDS()
        .toDF().withColumn("time", timestamp_micros($"timeUs")).filter($"value" > 50)
      val expected = all
        .groupBy($"group", window($"time", "60 seconds").as("w"))
        .agg(count(lit(1)).as("cnt"), avg($"value").as("mean_v"))
        .select($"group", unix_timestamp($"w.start").as("ws"), $"cnt", $"mean_v")
        .as[(String, Long, Long, Double)].collect().toSet
      // streaming emits only watermark-finalized windows → subset equality,
      // and the first-minute windows must be present and identical
      assert(streamed.subsetOf(expected))
      assert(streamed.exists(r => r._1 == "a" && r._2 == 0 && r._3 == 2 && r._4 == 70.0))
      assert(streamed.exists(r => r._1 == "b" && r._2 == 0 && r._3 == 1 && r._4 == 100.0))
    } finally q.stop()
  }

  test("streaming sliding window mean with watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[CountPoint]
    val df = ms.toDS().toDF()
      .withColumn("time", org.apache.spark.sql.functions.timestamp_micros($"timeUs"))
    val agg = WindowStream.windowedMeanCount(df, "time", "value", Seq("group"), 20, 10, "5 seconds")
    val q = agg.writeStream.format("memory").queryName("wm_t").outputMode("update").start()
    try {
      ms.addData(Seq(CountPoint("g", 1 * us, 10.0), CountPoint("g", 11 * us, 20.0)))
      q.processAllAvailable()
      val rows = spark.table("wm_t").collect()
      assert(rows.nonEmpty) // each point lands in two sliding windows
      val cnts = rows.map(r => r.getAs[Long]("cnt")).sorted.toSeq
      assert(cnts.contains(2L)) // the window covering both points
    } finally q.stop()
  }
}
