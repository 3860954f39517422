package graft.tick

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The Flux-task schedule as DATA: the TreeScheduler catch-up fold
  * (treescheduler.go:219-274 — fire every `next` with
  * `next + offset <= now`, advancing `next` through the cron after each
  * fire) expanded over a task table into one row per (task, fire).
  *
  * Scale shape: `@every` schedules — the dominant Flux-task form — are
  * pure column arithmetic (`sequence()` + `explode`, including the
  * Go-zero-time alignment of [[FluxCron.goTruncate]]): a generated
  * relation, partition-local, no driver loop, no shuffle. General
  * crons take the per-task [[FluxCron]] fold inside `flatMap` — each
  * task's fire sequence is independent, so the expansion is still
  * embarrassingly parallel with no shuffle; only genuinely irregular
  * calendars (month-day × weekday interactions) pay the iterator.
  */
object FluxSchedule {

  /** One schedulable task: `cron` in the [[FluxCron]] dialect,
    * `last_scheduled_s` the catch-up start (latestScheduled /
    * latestCompleted per coordinator.go:70-90), `offset_s` the run
    * delay added to each fire time. */
  case class FluxTaskDef(
      task_id: Long,
      cron: String,
      offset_s: Long,
      last_scheduled_s: Long)

  private val everyRe = "@every ([0-9a-zµ]+)".r

  /** All fire times with `run_at = scheduled_for + offset <= horizonS`,
    * per task, starting strictly after each task's (aligned) last
    * scheduled time. Columns: task_id, scheduled_for_s, run_at_s. */
  def fireTimes(tasks: Dataset[FluxTaskDef], horizonS: Long): DataFrame = {
    val spark = tasks.sparkSession
    import spark.implicits._

    val isPlainEvery = udf { (cron: String) =>
      cron.trim match {
        case everyRe(d) =>
          // months need the calendar fold; secs == 0 (sub-second or
          // empty interval) must take the general path so it raises
          // FluxCron's clear "@every interval must be positive" rather
          // than a DIV-by-zero in the column arithmetic below
          try { val (s, mo) = FluxCron.parseDuration(d); mo == 0 && s > 0 }
          catch { case _: Exception => false }
        case _ => false
      }
    }
    val everySecs = udf { (cron: String) =>
      FluxCron.parseDuration(cron.trim.stripPrefix("@every "))._1
    }

    val tagged = tasks.toDF().withColumn("__plain", isPlainEvery(col("cron")))

    // @every fast path: aligned = goTruncate(last, step); fires at
    // aligned + k*step (k >= 1) while fire + offset <= horizon.
    val go = lit(FluxCron.GoZeroOffsetSec)
    // integer DIV throughout — a double division here could misround
    // exactly-on-boundary alignments at large epoch offsets
    val every = tagged.filter(col("__plain"))
      .withColumn("__step", everySecs(col("cron")))
      .withColumn("__aligned",
        expr(s"((last_scheduled_s + ${FluxCron.GoZeroOffsetSec}) DIV __step)")
          * col("__step") - go)
      .withColumn("__first", col("__aligned") + col("__step"))
      .withColumn("__hi",
        col("__aligned") +
          expr(s"(($horizonS - offset_s - __aligned) DIV __step)") * col("__step"))
      .filter(col("__hi") >= col("__first"))
      .select(col("task_id"),
        explode(sequence(col("__first"), col("__hi"), col("__step")))
          .as("scheduled_for_s"),
        col("offset_s"))

    // general path: the FluxCron iterator per task, no shuffle
    val general = tagged.filter(!col("__plain"))
      .select(col("task_id"), col("cron"), col("offset_s"), col("last_scheduled_s"))
      .as[FluxTaskDef]
      .flatMap { t =>
        val (sch, last) = FluxCron.newSchedule(t.cron, t.last_scheduled_s)
        Iterator
          .iterate(sch.next(last))(sch.next)
          .takeWhile(_ + t.offset_s <= horizonS)
          .map(f => (t.task_id, f, t.offset_s))
      }
      .toDF("task_id", "scheduled_for_s", "offset_s")

    every.unionByName(general)
      .select(col("task_id"), col("scheduled_for_s"),
        (col("scheduled_for_s") + col("offset_s")).as("run_at_s"))
  }
}
