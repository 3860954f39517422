package graft.tick

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The query-execution half of the Flux-task executor, Spark-first: a
  * [[FluxTasks.QueryRunner]] that runs a task's script as Spark SQL.
  *
  * The reference compiles each run's Flux with
  * `CompilerBuilderTimestamps{Now: run.ScheduledFor, LatestSuccess:
  * task.LatestSuccess}` (executor.go:457-476) — `now()` inside the
  * script is the run's LOGICAL time, not the wall clock, and the
  * `tasks.lastSuccessTime` option is injected when a previous success
  * exists (Extern, executor.go:79-94). The Spark analog binds the same
  * two timestamps as NAMED SQL PARAMETERS: `:now` and `:last_success`
  * (NULL until the first success — the reference omits the option then,
  * and a Flux script reading it would fall back; SQL's natural fallback
  * is `coalesce(:last_success, ...)`). Incremental tasks write exactly
  * the reference's idiom: `WHERE ts > coalesce(:last_success,
  * timestamp'1970-01-01') AND ts <= :now`.
  *
  * The result is drained like exhaustResultIterators (executor.go:576)
  * via the `onResult` action (default: count()); a query error becomes
  * the run's failure message, so the run FSM records it exactly as
  * ErrQueryError does. */
object FluxSql {

  /** Drop the `option task = {...}` header (quote-aware), leaving the
    * SQL body — the reference's compiler consumes the option statement
    * natively; SQL needs it stripped. Uses the SAME locator as
    * [[TaskOptions.fromScript]], so any script the parser accepts (the
    * header may sit after a leading `-- comment`) is stripped the same
    * way here — the two can never disagree. */
  def stripTaskHeader(script: String): String =
    TaskOptions.locateHeaders(script) match {
      case Seq((hs, _, he)) if he >= 0 =>
        script.substring(0, hs) + script.substring(he)
      case _ => script
    }

  /** Build a QueryRunner over `spark`. `onResult` is the result drain /
    * sink action (the task's side effect — write, alert, materialize);
    * it runs on the executor's thread per fire. */
  def sqlQueryRunner(
      spark: SparkSession,
      onResult: (FluxTasks.Task, Long, DataFrame) => Unit =
        (_, _, df) => { df.count(); () }): FluxTasks.QueryRunner =
    (task, scheduledForS) =>
      try {
        val df = spark.sql(stripTaskHeader(task.flux), Map(
          "now" -> java.time.Instant.ofEpochSecond(scheduledForS),
          "last_success" -> task.latestSuccessS
            .map(java.time.Instant.ofEpochSecond(_)).orNull))
        onResult(task, scheduledForS, df)
        Right(())
      } catch {
        case scala.util.control.NonFatal(e) =>
          Left(s"query error: ${e.getMessage}")
      }
}
