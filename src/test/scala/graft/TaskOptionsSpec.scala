package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tick.{FluxTasks, TaskOptions}
import graft.tick.TaskOptions.{Options, OptionsException}

/** Pins the `option task = {...}` header laws to the reference's
  * options_test.go vectors (TestFromScriptAST:62-126, TestValidate). */
class TaskOptionsSpec extends AnyFunSuite {

  private def err(script: String): String =
    intercept[OptionsException](TaskOptions.fromScript(script)).getMessage

  test("FromScriptAST vectors (options_test.go:62-126)") {
    // name0: all options
    val o0 = TaskOptions.fromScript(
      """option task = {name: "name0", cron: "* * * * *", concurrency: 2, retry: 3, offset: -1m}
        |SELECT 1""".stripMargin)
    assert(o0 === Options(name = "name0", cron = "* * * * *",
      offset = Some("-1m"), concurrency = 2, retry = 3))
    assert(o0.offsetSeconds === -60L)
    // name1/name2: defaults concurrency=1 retry=1
    val o1 = TaskOptions.fromScript("""option task = {name: "name1", every: 5s}""")
    assert(o1 === Options(name = "name1", every = "5s"))
    assert(o1.effectiveCron === "@every 5s")
    val o2 = TaskOptions.fromScript("""option task = {name: "name2", cron: "* * * * *"}""")
    assert(o2.concurrency === 1L && o2.retry === 1L)
    // name3: both cron and every
    assert(err("""option task = {name: "name3", every: 1h, cron: "* * * * *"}""")
      .contains("cron and every"))
    // name4: concurrency over max
    assert(err("""option task = {name: "name4", concurrency: 1000, every: 1h}""")
      .contains("concurrency exceeded max of 100"))
    // name5: concurrency 0
    assert(err("option task = {\n  name: \"name5\",\n  concurrency: 0,\n  every: 1m0s,\n\n}\n\nSELECT 1")
      .contains("concurrency must be at least 1"))
    // name6: bare-int every is not a duration
    assert(err("option task = {\n  name: \"name6\",\n  concurrency: 1,\n  every: 1,\n\n}")
      .contains("failed to parse field every"))
    // name7/name8: retry bounds
    assert(err("""option task = {name: "name7", retry: 20, every: 1h}""")
      .contains("retry exceeded max of 10"))
    assert(err("option task = {\n  name: \"name8\",\n  retry: 0,\n  every: 1m0s,\n\n}")
      .contains("retry must be at least 1"))
    // name9: no schedule; empty: no name
    assert(err("""option task = {name: "name9"}""").contains("cron or every"))
    assert(err("""option task = {}""").contains("missing required option: name"))
    // name10/name11: trailing commas, multi-line, offset larger than every
    val o10 = TaskOptions.fromScript(
      "option task = {\n\tname: \"name10\",\n\tevery: 1d,\n\toffset: 1m,\n}\nSELECT 1")
    assert(o10 === Options(name = "name10", every = "1d", offset = Some("1m")))
    val o11 = TaskOptions.fromScript(
      "option task = {\n\tname: \"name11\",\n\tevery: 1m,\n\toffset: 1d,\n}")
    assert(o11.offsetSeconds === 86400L)
    // smoke: single-line header followed by the body
    val oS = TaskOptions.fromScript(
      """option task = {name:"test_task_smoke_name", every:30s} SELECT * FROM t""")
    assert(oS.name === "test_task_smoke_name" && oS.every === "30s")
  }

  test("header multiplicity and every floor") {
    assert(err("SELECT 1").contains("no task options defined"))
    assert(err(
      """option task = {name: "a", every: 1m}
        |option task = {name: "b", every: 2m}""".stripMargin)
      .contains("multiple task options defined"))
    assert(err("""option task = {name: "a", every: 500ms}""")
      .contains("at least 1 second"))
    assert(err("""option task = {name: "a", cron: "not a cron"}""")
      .contains("cron invalid"))
  }

  test("comments and unknown keys tolerated") {
    val o = TaskOptions.fromScript(
      """option task = {
        |  name: "c", // the task name
        |  every: 2m, // schedule
        |  owner: "ops",
        |}
        |SELECT 1""".stripMargin)
    assert(o === Options(name = "c", every = "2m"))
  }

  test("comment stripping honors escaped quotes inside string values") {
    // `\"` must not toggle string state: a // inside the string stays,
    // a // after the value is cut
    val o = TaskOptions.fromScript(
      "option task = {\n" +
        "  name: \"say \\\"hi\\\"\", // greeting\n" +
        "  every: 1m,\n" +
        "}\nSELECT 1")
    assert(o.name === "say \"hi\"")
    val o2 = TaskOptions.fromScript(
      "option task = {\n" +
        "  name: \"a\\\"//not-a-comment\",\n" +
        "  every: 1m,\n" +
        "}\nSELECT 1")
    assert(o2.name === "a\"//not-a-comment")
  }

  test("the script path wires into the task system with its own concurrency") {
    var now = 1000L
    var ran = 0
    val sys = new FluxTasks.FluxTaskSystem(
      () => now, (_, _) => { ran += 1; Right(()) },
      concurrencyOf = TaskOptions.concurrencyOf)
    val script = """option task = {name: "self", every: 60s, offset: 2s, concurrency: 1}
                   |SELECT 1""".stripMargin
    val t = sys.createTask(TaskOptions.taskCreateFromScript(script))
    assert(t.name === "self" && t.every === "60s" && t.offsetS === 2L)
    assert(t.effectiveCron === "@every 60s")
    now = 1000L + 182
    sys.advanceTo(now) // aligned 960 → fires 1020+2, 1080+2, 1140+2 eligible
    assert(ran === 3)
    assert(sys.service.findTaskByID(t.id).latestCompletedS === 1140L)
    // explicit-field tasks have no header → unlimited (None)
    assert(TaskOptions.concurrencyOf(t) === Some(1))
    assert(TaskOptions.concurrencyOf(t.copy(flux = "SELECT 1")) === None)
  }
}
