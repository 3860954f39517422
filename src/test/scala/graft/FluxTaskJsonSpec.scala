package graft

import graft.tick.FluxTaskJson
import graft.tick.FluxTasks.{Run, RunLog, Task, TaskFilter}
import org.scalatest.funsuite.AnyFunSuite

/** The flux-task HTTP wire documents (task/http/task_service.go). */
class FluxTaskJsonSpec extends AnyFunSuite {

  private val B = "/kapacitor/v1/api/v2/tasks"

  test("customParseDuration: the h/m/s fold with whole-unit early returns") {
    import FluxTaskJson.customParseDuration
    val S = 1000000000L
    assert(customParseDuration(0L) === "")
    assert(customParseDuration(3600 * S) === "1h")
    assert(customParseDuration(5400 * S) === "1h30m")
    assert(customParseDuration(3661 * S) === "1h1m1s")
    assert(customParseDuration(90 * S) === "1m30s")
    assert(customParseDuration(60 * S) === "1m")
    assert(customParseDuration(30 * S) === "30s")
    assert(customParseDuration(-90 * S) === "-1m30s")
    // sub-second remainders are silently dropped (:316-319)
    assert(customParseDuration(30 * S + 500000000L) === "30s")
  }

  private def task(id: Long) = Task(id = id, name = "cpu check",
    status = "active", flux = "option task = {name: \"cpu check\", every: 1h}",
    every = "1h", cron = "", offsetS = 0, createdAtS = 0, updatedAtS = 0,
    latestCompletedS = 0, latestScheduledS = 0)

  test("taskDoc: struct order, omitempty elisions, nil labels as null") {
    val minimal = FluxTaskJson.taskDoc(task(5))
    assert(minimal ===
      s"""{"links":{"logs":"$B/0000000000000005/logs","runs":"$B/0000000000000005/runs","self":"$B/0000000000000005"},""" +
      """"labels":null,"id":"0000000000000005","ownerID":"","orgID":"","name":"cpu check",""" +
      """"status":"active","flux":"option task = {name: \"cpu check\", every: 1h}","every":"1h"}""")
    // full: every optional field present, offset through customParseDuration
    val full = FluxTaskJson.taskDoc(
      task(5).copy(cron = "0 * * * *", every = "", offsetS = 90,
        createdAtS = 1700000000L, updatedAtS = 1700000100L,
        latestCompletedS = 1700003600L,
        lastRunStatus = "failed", lastRunError = "boom"),
      owner = "admin", description = "d",
      metadata = Seq("b" -> graft.tick.TickJson.JInt(2),
        "a" -> graft.tick.TickJson.JStr("x")))
    assert(full.contains(""""ownerID":"admin","orgID":"","name":"cpu check","description":"d""""))
    assert(full.contains(""""cron":"0 * * * *","offset":"1m30s","latestCompleted":"2023-11-14T23:13:20Z""""))
    assert(full.contains(""""lastRunStatus":"failed","lastRunError":"boom","createdAt":"2023-11-14T22:13:20Z","updatedAt":"2023-11-14T22:15:00Z""""))
    // metadata map keys sort
    assert(full.endsWith(""""metadata":{"a":"x","b":2}}"""))
  }

  test("tasksDoc: paging links carry only after/username/limit; next on a full page") {
    val ts = Seq(task(1), task(2))
    // page not full: self only (name/status filters never reach the links)
    val one = FluxTaskJson.tasksDoc(ts, TaskFilter(name = Some("x"),
      status = Some("active"), limit = 100))
    assert(one.startsWith(s"""{"links":{"self":"$B?limit=100"},"tasks":[{"links":"""))
    // full page: next re-encodes with after = last-on-page id; the Go
    // Encoder HTML-escapes the querystring '&' to & inside JSON
    val two = FluxTaskJson.tasksDoc(ts,
      TaskFilter(after = Some(1L), limit = 2), username = Some("bob"))
    assert(two.startsWith(
      s"""{"links":{"self":"$B?after=0000000000000001\\u0026limit=2\\u0026username=bob",""" +
      s""""next":"$B?after=0000000000000002\\u0026limit=2\\u0026username=bob"},"tasks":["""))
    // an empty page is [] (make()'d slice), never null
    assert(FluxTaskJson.tasksDoc(Nil, TaskFilter(limit = 100)) ===
      s"""{"links":{"self":"$B?limit=100"},"tasks":[]}""")
  }

  test("runDoc/runsDoc/logsDoc: pointer scheduledFor, zero elisions, nil events") {
    val r = Run(id = 9, taskId = 5, status = "success", scheduledForS = 100,
      runAtS = 100, startedAtS = Some(101), finishedAtS = Some(102),
      logs = Vector(RunLog(9, 101, "started task")))
    assert(FluxTaskJson.runDoc(r) ===
      s"""{"links":{"logs":"$B/0000000000000005/runs/0000000000000009/logs",""" +
      s""""retry":"$B/0000000000000005/runs/0000000000000009/retry",""" +
      s""""self":"$B/0000000000000005/runs/0000000000000009",""" +
      s""""task":"$B/0000000000000005"},""" +
      """"id":"0000000000000009","taskID":"0000000000000005","status":"success",""" +
      """"scheduledFor":"1970-01-01T00:01:40Z","startedAt":"1970-01-01T00:01:41Z",""" +
      """"finishedAt":"1970-01-01T00:01:42Z",""" +
      """"log":[{"runID":"0000000000000009","time":"1970-01-01T00:01:41Z","message":"started task"}]}""")
    // scheduled-only run: requestedAt/startedAt/finishedAt/log all elided
    val bare = FluxTaskJson.runDoc(r.copy(startedAtS = None,
      finishedAtS = None, logs = Vector.empty))
    assert(bare.endsWith(""""status":"success","scheduledFor":"1970-01-01T00:01:40Z"}"""))
    assert(FluxTaskJson.runsDoc(Seq(r), 5L).startsWith(
      s"""{"links":{"self":"$B/0000000000000005/runs","task":"$B/0000000000000005"},"runs":[{"""))
    assert(FluxTaskJson.runsDoc(Nil, 5L).endsWith(""""runs":[]}"""))
    assert(FluxTaskJson.logsDoc(Nil) === """{"events":null}""")
    assert(FluxTaskJson.logsDoc(Seq(RunLog(0, 7, "m"))) ===
      """{"events":[{"time":"1970-01-01T00:00:07Z","message":"m"}]}""")
  }
}
