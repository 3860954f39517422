package graft

import graft.api.Pipe
import graft.operators.WindowFSM
import graft.sources.{LineProtocol, ResultRenderer}
import graft.streaming.AlertStream
import org.apache.spark.sql.functions._

/** The reference's golden-replay test shape (integrations/streamer_test.go:
  * fixture replay → TICKscript pipeline → httpOut Result compare), here:
  * line-protocol fixture → Pipe pipeline → ResultRenderer golden compare.
  * Mirrors the README cpu_alert example: stream|from('cpu')|window|mean|
  * alert(crit: usage > 70). */
class GoldenReplaySpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    "cpu,host=serverA usage=40.0 0",
    "cpu,host=serverA usage=60.0 5000000000",
    "cpu,host=serverA usage=80.0 10000000000",
    "cpu,host=serverA usage=90.0 15000000000",
    "cpu,host=serverB usage=10.0 0",
    "cpu,host=serverB usage=20.0 5000000000",
    "mem,host=serverA used=99.0 0") // different measurement: filtered out

  private def points = {
    val parsed = LineProtocol.toPointFrame(LineProtocol.parse(fixture.toDS()))
    parsed
      .filter(col("measurement") === "cpu")
      .select(
        col("time"),
        expr("tags['host']").as("host"),
        expr("fieldsFloat['usage']").as("usage"))
  }

  test("replayed fixture through window|mean matches the golden Result") {
    val p = Pipe(points, timeCol = "time", dims = Seq("host"))
      .windowTumbling(10, "bucket_s")
    val agg = p.df.groupBy("host", "bucket_s")
      .agg(avg("usage").as("mean_usage"))
      .orderBy("host", "bucket_s")
    val result = ResultRenderer.render(agg, "cpu", Seq("host"))
    // golden: serverA → buckets 0s (mean 50) and 10s (mean 85); serverB → 15
    assert(result.series.map(_.tags("host")) == Seq("serverA", "serverB"))
    val a = result.series.head
    assert(a.columns == Seq("bucket_s", "mean_usage"))
    assert(a.values == Seq(Seq(0L, 50.0), Seq(10L, 85.0)))
    val b = result.series(1)
    assert(b.values == Seq(Seq(0L, 15.0)))
    // and the JSON tap renders the same shape the reference serves
    val json = ResultRenderer.toJson(result)
    assert(json.contains(""""tags":{"host":"serverA"}""") && json.contains("85.0"))
  }

  test("reference TestStream_ChangeDetect fixture reproduces the reference's golden Result") {
    // integrations/testdata/TestStream_ChangeDetect.srpl through the
    // TestStream_ChangeDetect pipeline (streamer_test.go:169-216):
    //   stream |from().measurement('packets') |changeDetect('value')
    //          |window().period(10s).every(10s) |httpOut(...)
    // Expected (from the reference test, first full window):
    //   t=0 bad, t=1 good, t=2 bad, t=5 good, t=7 bad, t=8 good
    val srpl = graft.sources.Replay.readSrpl(spark,
      "/root/reference/integrations/testdata/TestStream_ChangeDetect.srpl")
    // fixture timestamps are whole seconds; the tracked field is a string
    val pts = srpl.select(
      col("measurement"),
      timestamp_seconds(col("ts_ns")).as("time"),
      expr("fieldsStr['value']").as("value"))
      .filter(col("measurement") === "packets")
      // reference changeDetect skips points missing the tracked field
      // (change_detect.go logs and drops them)
      .filter(col("value").isNotNull)
    val p = Pipe(pts, timeCol = "time", dims = Nil)
      .changeDetect("value")
      .windowTumbling(10)
    val firstWindow = p.df.filter(col("bucket_s") === 0)
      .orderBy("time")
      .select(unix_timestamp(col("time")).as("t"), col("value"))
      .as[(Long, String)].collect().toSeq
    assert(firstWindow == Seq(
      (0L, "bad"), (1L, "good"), (2L, "bad"), (5L, "good"), (7L, "bad"), (8L, "good")))
  }

  // ---- reference window integration fixtures (streamer_test.go:796-1580).
  // The replay harness re-bases the first point onto the fake clock's zero
  // (ReplayStreamFromIO with precision "s"), so times become 0-based seconds;
  // httpOut caches the LAST emitted batch, which is what each test compares.
  private def srplValues(name: String, host: String = "serverA") = {
    val df = graft.sources.Replay.readSrpl(spark,
      s"/root/reference/integrations/testdata/$name.srpl")
      .filter(col("measurement") === "cpu" && expr("tags['host']") === host)
      .select(col("ts_ns").as("ts"), expr("fieldsFloat['value']").as("value"))
    val mn = df.agg(min("ts")).head.getLong(0)
    df.withColumn("time", timestamp_seconds(col("ts") - mn)).drop("ts")
  }

  private def lastBatch(name: String, period: Long, every: Long,
      align: Boolean, fillPeriod: Boolean): (Long, Seq[(Long, Double)]) = {
    val w = WindowFSM.windowByTime(srplValues(name), "time", Nil, period, every,
      align = align, fillPeriod = fillPeriod)
    val last = w.agg(max("wemit_us")).head.getLong(0)
    (last / 1000000L,
      w.filter(col("wemit_us") === last).orderBy("time")
        .select(unix_timestamp(col("time")), col("value"))
        .as[(Long, Double)].collect().toSeq)
  }

  test("TestStream_Window golden: period 10s / every 10s final window") {
    val (emit, batch) = lastBatch("TestStream_Window", 10, 10, align = false, fillPeriod = false)
    assert(emit == 10L)
    assert(batch == Seq(0L -> 97.1, 1L -> 92.6, 2L -> 95.6, 3L -> 93.1, 4L -> 92.6,
      5L -> 95.8, 6L -> 92.7, 7L -> 96.0, 8L -> 93.4, 9L -> 95.3))
  }

  test("TestStream_Window_FillPeriod golden: first emit waits a full period") {
    val (emit, batch) = lastBatch("TestStream_Window_FillPeriod", 14, 10, align = false, fillPeriod = true)
    assert(emit == 14L)
    assert(batch.map(_._1) == (0L to 13L) &&
      batch.map(_._2) == Seq(93.1, 97.1, 92.6, 95.6, 93.1, 92.6, 95.8, 92.7, 96.0, 93.4, 95.3, 96.4, 95.1, 91.1))
  }

  test("TestStream_Window_FillPeriod_Aligned golden: aligned first boundary after t0+period") {
    val (emit, batch) = lastBatch("TestStream_Window_FillPeriod_Aligned", 14, 10, align = true, fillPeriod = true)
    assert(emit == 20L)
    assert(batch.map(_._1) == (6L to 19L) &&
      batch.map(_._2) == Seq(95.8, 92.7, 96.0, 93.4, 95.3, 96.4, 95.1, 91.1, 95.7, 96.2, 96.6, 91.2, 98.2, 96.1))
  }

  test("TestStream_WindowMissing golden: sparse data emits at trigger-derived times") {
    val (emit, batch) = lastBatch("TestStream_WindowMissing", 3, 2, align = false, fillPeriod = false)
    assert(emit == 11L && batch.size == 3) // count('value') == 3.0 at 00:00:11
    assert(batch.map(_._1) == Seq(8L, 9L, 10L))
  }

  test("TestStream_WindowMissingAligned golden: aligned sparse emission") {
    val (emit, batch) = lastBatch("TestStream_WindowMissing", 3, 2, align = true, fillPeriod = false)
    assert(emit == 10L && batch.size == 3) // count('value') == 3.0 at 00:00:10
    assert(batch.map(_._1) == Seq(7L, 8L, 9L))
  }

  test("declarative windowAligned reproduces the aligned FSM emission set exactly") {
    for (name <- Seq("TestStream_WindowMissing", "TestStream_Window_FillPeriod_Aligned");
         fp <- Seq(false, true)) {
      val pts = srplValues(name)
      val fsm = WindowFSM.windowByTime(pts, "time", Nil, 3, 2, align = true, fillPeriod = fp)
        .select(col("wemit_us") / 1000000L, col("time"), col("value"))
        .as[(Double, java.sql.Timestamp, Double)].collect().toSet
      val decl = Pipe(pts, timeCol = "time", dims = Nil)
        .windowAligned(3, 2, fillPeriod = fp).df
        .select(col("wemit_s").cast("double"), col("time"), col("value"))
        .as[(Double, java.sql.Timestamp, Double)].collect().toSet
      assert(decl == fsm, s"fixture $name fillPeriod=$fp")
    }
  }

  test("replayed fixture through the alert FSM matches the golden events") {
    import AlertStream._
    val pts = points.select(
      col("host").as("group"),
      unix_micros(col("time")).as("timeUs"),
      (col("usage") > 50).as("pass1"),
      (col("usage") > 70).as("pass2"),
      (col("usage") > 85).as("pass3"),
      lit(true).as("reset1"), lit(true).as("reset2"), lit(true).as("reset3"))
      .as[AlertPoint]
    val events = runBatch(pts, AlertConfig(stateChangesOnly = true))
      .collect().sortBy(e => (e.group, e.timeUs))
      .map(e => (e.group, e.timeUs / 1000000, e.levelName)).toSeq
    // initial OK points never emit under stateChangesOnly (history starts
    // at OK, unchanged); serverB stays OK throughout → silent
    assert(events == Seq(
      ("serverA", 5L, "INFO"),
      ("serverA", 10L, "WARNING"),
      ("serverA", 15L, "CRITICAL")))
  }
}
