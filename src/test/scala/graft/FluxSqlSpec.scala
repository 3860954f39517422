package graft

import graft.tick.{FluxSql, FluxTasks}
import graft.tick.FluxTasks.TaskCreate

/** Flux tasks running real Spark SQL per fire: the `:now` logical-time
  * binding (now = run.ScheduledFor, executor.go:470), the
  * `:last_success` extern (NULL before the first success), incremental
  * windows, and query errors folding into the run FSM. */
class FluxSqlSpec extends SparkSpec {

  test("a scheduled SQL task sees logical time, not the wall clock") {
    val sparkS = spark
    import sparkS.implicits._
    (1 to 600).map(i => (java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(i.toLong)), i.toLong))
      .toDF("ts", "v").createOrReplaceTempView("flux_sql_events")

    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var now = 0L
    val sys = new FluxTasks.FluxTaskSystem(
      () => now,
      FluxSql.sqlQueryRunner(spark, (task, sf, df) =>
        seen += ((sf, df.collect().head.getLong(0)))))
    sys.createTask(TaskCreate(name = "counter",
      flux = "SELECT count(*) AS n FROM flux_sql_events WHERE ts <= :now",
      every = "120s"))
    now = 480L
    sys.advanceTo(now)
    // aligned last = 0; fires at 120, 240, 360, 480 — each counts rows
    // up to ITS OWN scheduledFor (logical time), not the final clock
    assert(seen.toSeq === Seq((120L, 120L), (240L, 240L), (360L, 360L), (480L, 480L)))
  }

  test("incremental task: :last_success starts NULL, then advances") {
    val sparkS = spark
    import sparkS.implicits._
    (1 to 600).map(i => (java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(i.toLong)), i.toLong))
      .toDF("ts", "v").createOrReplaceTempView("flux_sql_incr")

    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var now = 0L
    val sys = new FluxTasks.FluxTaskSystem(
      () => now,
      FluxSql.sqlQueryRunner(spark, (task, sf, df) =>
        batches += ((sf, df.collect().head.getLong(0)))))
    sys.createTask(TaskCreate(name = "incr",
      flux = """SELECT count(*) AS n FROM flux_sql_incr
                WHERE ts > coalesce(:last_success, timestamp'1970-01-01')
                  AND ts <= :now""",
      every = "180s"))
    now = 540L
    sys.advanceTo(now)
    // fire 1 (sf=180): last_success NULL → full window 1..180 = 180 rows;
    // fires 2,3: exactly one 180s increment each — no gaps, no overlap
    assert(batches.toSeq === Seq((180L, 180L), (360L, 180L), (540L, 180L)))
  }

  test("stripTaskHeader strips exactly what TaskOptions.fromScript parses") {
    // header after a leading SQL comment: the parser accepts it, so the
    // stripper must remove it there too (not just at offset 0)
    val prefixed =
      "-- daily etl\noption task = {name: \"t\", every: 1h}\nSELECT 1 AS one"
    assert(graft.tick.TaskOptions.fromScript(prefixed).name == "t")
    assert(FluxSql.stripTaskHeader(prefixed) == "-- daily etl\n\nSELECT 1 AS one")
    // braces inside string values don't end the header early
    val braces =
      "option task = {name: \"a}b\", every: 1h}\nSELECT 2"
    assert(FluxSql.stripTaskHeader(braces) == "\nSELECT 2")
    // no header / unterminated header: script passes through unchanged
    assert(FluxSql.stripTaskHeader("SELECT 3") == "SELECT 3")
    val unterminated = "option task = {name: \"x\""
    assert(FluxSql.stripTaskHeader(unterminated) == unterminated)
  }

  test("a header-prefixed script runs end-to-end: parsed AND stripped coherently") {
    val script =
      "-- etl\noption task = {name: \"hdr\", every: 120s}\nSELECT 42L AS v"
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var now = 0L
    val sys = new FluxTasks.FluxTaskSystem(
      () => now,
      FluxSql.sqlQueryRunner(spark, (_, _, df) => seen += df.collect().head.getLong(0)))
    sys.createTask(graft.tick.TaskOptions.taskCreateFromScript(script))
    now = 240L
    sys.advanceTo(now)
    assert(seen.toSeq === Seq(42L, 42L))
    assert(sys.service.findTaskByID(1L).lastRunStatus === FluxTasks.RunStatus.Success)
  }

  test("a bad query fails the run with ErrQueryError semantics") {
    var now = 1000L
    val sys = new FluxTasks.FluxTaskSystem(
      () => now, FluxSql.sqlQueryRunner(spark))
    val t = sys.createTask(TaskCreate(name = "bad",
      flux = "SELECT * FROM table_that_does_not_exist_xyz", every = "60s"))
    now = 1000L + 120
    sys.advanceTo(now)
    val t2 = sys.service.findTaskByID(t.id)
    assert(t2.lastRunStatus === FluxTasks.RunStatus.Failed)
    assert(t2.latestFailureS.nonEmpty && t2.latestSuccessS.isEmpty)
  }
}
