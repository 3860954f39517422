package graft

import graft.tick.{FluxRunStorage, FluxTasks}
import graft.tick.FluxTasks.{Run, RunLog, TaskCreate}
import graft.sources.Replay
import org.apache.spark.sql.functions._

/** Flux-task run history as data: the run_recorder.go point shape, the
  * runReader parse-back, the AnalyticalStorage FindRuns combine laws,
  * and the Spark/sink composition (history rides the .srpl recorder). */
class FluxRunStorageSpec extends SparkSpec {

  private val run = Run(
    id = 0x2aL, taskId = 0x07L, status = "success",
    scheduledForS = 1446225252L, runAtS = 1446225252L,
    startedAtS = Some(1446225253L), finishedAtS = Some(1446225255L),
    requestedAtS = None,
    logs = Vector(
      RunLog(0x2aL, 1446225253L, "Started task from script: \"fx\""),
      RunLog(0x2aL, 1446225255L, "Completed(success)")))

  test("recordPoint matches the run_recorder.go point shape") {
    val p = FluxRunStorage.recordPoint(run)
    assert(p.measurement === "runs")
    assert(p.tags === Map("status" -> "success",
      "taskID" -> "0000000000000007"))
    assert(p.fieldsStr("runID") === "000000000000002a")
    assert(p.fieldsStr("startedAt") === "2015-10-30T17:14:13Z")
    assert(p.fieldsStr("finishedAt") === "2015-10-30T17:14:15Z")
    assert(p.fieldsStr("scheduledFor") === "2015-10-30T17:14:12Z")
    assert(p.fieldsStr("requestedAt") === "0001-01-01T00:00:00Z")
    assert(p.fieldsStr("logs") ===
      """[{"runID":"000000000000002a","time":"2015-10-30T17:14:13Z","message":"Started task from script: \"fx\""},""" +
      """{"runID":"000000000000002a","time":"2015-10-30T17:14:15Z","message":"Completed(success)"}]""")
    assert(p.timeNs === 1446225253L * 1000000000L, "point time = startedAt")
  }

  test("readRun inverts recordPoint (the runReader parse)") {
    val back = FluxRunStorage.readRun(FluxRunStorage.recordPoint(run))
    assert(back === run.copy(runAtS = 0L)) // runAt is not recorded
  }

  test("AnalyticalStore.findRuns: live + history, desc order, limit, combine") {
    var now = 1000L
    val service = new FluxTasks.FluxTaskService(() => now)
    val store = new FluxRunStorage.AnalyticalStore(service)
    val t = service.createTask(TaskCreate(name = "n", every = "1m"))
    // three finished runs at increasing scheduledFor
    for (sf <- Seq(2000L, 3000L, 4000L)) {
      val r = service.createRun(t.id, sf, sf)
      service.updateRunState(t.id, r.id, sf + 1, FluxTasks.RunStatus.Started)
      service.updateRunState(t.id, r.id, sf + 2,
        if (sf == 3000L) FluxTasks.RunStatus.Failed else FluxTasks.RunStatus.Success)
      store.finishRun(t.id, r.id)
    }
    // one still-running run
    val live = service.createRun(t.id, 5000L, 5000L)
    val got = store.findRuns(t.id)
    assert(got.map(_.scheduledForS) === Seq(5000L, 4000L, 3000L, 2000L),
      "live first, history newest-first")
    assert(got.map(_.status) === Seq("scheduled", "success", "failed", "success"))
    assert(store.findRuns(t.id, limit = 2).map(_.scheduledForS) === Seq(5000L, 4000L))
    // combineRuns: once the live run finishes, its history copy shadows it
    service.updateRunState(t.id, live.id, 5001L, FluxTasks.RunStatus.Started)
    service.updateRunState(t.id, live.id, 5002L, FluxTasks.RunStatus.Success)
    store.finishRun(t.id, live.id)
    val after = store.findRuns(t.id)
    assert(after.count(_.id == live.id) === 1, "no duplicate live+history entry")
    assert(after.head.status === "success")
    intercept[IllegalArgumentException] { store.findRuns(t.id, limit = 0) }
    intercept[IllegalArgumentException] { store.findRuns(t.id, limit = 501) }
  }

  test("the whole system records through the onRunFinished seam") {
    var now = 1000L
    val store = new FluxRunStorage.AnalyticalStore(
      new FluxTasks.FluxTaskService(() => 0L)) // standalone store; system below
    var sysStore: FluxRunStorage.AnalyticalStore = null
    val sys = new FluxTasks.FluxTaskSystem(
      () => now, (_, sf) => if (sf % 120 == 0) Left("bad") else Right(()),
      onRunFinished = r => sysStore.record(r))
    sysStore = new FluxRunStorage.AnalyticalStore(sys.service)
    val t = sys.createTask(TaskCreate(name = "n", flux = "fx", every = "60s"))
    now = 1000 + 300
    sys.advanceTo(now) // fires 1020..1260 (aligned catch-up)
    val hist = sysStore.findRuns(t.id, limit = 100)
    assert(hist.map(_.scheduledForS) === Seq(1260L, 1200L, 1140L, 1080L, 1020L))
    assert(hist.map(_.status) ===
      Seq("success", "failed", "success", "failed", "success")) // 1200, 1080 % 120 == 0
    // the failed run kept its full log tail in history
    assert(hist.find(_.status == "failed").get.logs.map(_.message) ===
      Vector("Started task from script: \"fx\"", "Completed(failed)", "bad"))
  }

  test("run history rides the existing sinks: srpl round-trip + Spark frame") {
    val sparkS = spark
    import sparkS.implicits._
    val service = new FluxTasks.FluxTaskService(() => 1000L)
    val store = new FluxRunStorage.AnalyticalStore(service)
    val t = service.createTask(TaskCreate(name = "n", every = "1m"))
    for (sf <- Seq(2000L, 3000L)) {
      val r = service.createRun(t.id, sf, sf)
      service.updateRunState(t.id, r.id, sf + 1, FluxTasks.RunStatus.Started)
      service.addRunLog(t.id, r.id, sf + 1, s"run at $sf")
      service.updateRunState(t.id, r.id, sf + 2, FluxTasks.RunStatus.Success)
      store.finishRun(t.id, r.id)
    }
    // record the history bucket as a .srpl stream and read it back
    val path = java.io.File.createTempFile("graft_runs", ".srpl").getAbsolutePath
    val recs = store.points.map(p =>
      Replay.RecordedPoint(FluxRunStorage.DefaultBucket, "autogen", p))
    Replay.writeSrpl(recs.toDS(), path)
    val back = Replay.readSrpl(spark, path)
    assert(back.count() === 2)
    val parsed = back
      .select("measurement", "tags", "fieldsFloat", "fieldsInt", "fieldsBool",
        "fieldsStr", "ts_ns")
      .as[(String, Map[String, String], Map[String, Double], Map[String, Long],
        Map[String, Boolean], Map[String, String], Long)]
      .collect()
      .map { case (m, tg, ff, fi, fb, fs, ts) =>
        FluxRunStorage.readRun(graft.sources.LineProtocol.LinePoint(m, tg, ff, fi, fb, fs, ts)) }
      .sortBy(_.scheduledForS)
    assert(parsed.map(_.scheduledForS).toSeq === Seq(2000L, 3000L))
    assert(parsed.head.logs.map(_.message) === Vector("run at 2000"))
    // and as a frame: the FindRuns flux script restated on columns
    val frame = FluxRunStorage.runsFrame(spark, store.points)
    val found = FluxRunStorage.findRunsFrame(frame, t.id, limit = 1)
      .select("scheduled_for", "status").as[(String, String)].collect()
    assert(found.toSeq === Seq(("1970-01-01T00:50:00Z", "success")))
  }
}
