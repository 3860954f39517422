package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replay CLOCK pacing as data — the last semantic of the reference's
  * replay service (services/replay/service.go:408-434 chooses the clock;
  * clock/clock.go defines it; replay.go:49-79 paces streams and
  * replay.go:183-230 paces batches): a replay against a task runs either
  * on a **Fast** clock (`Until` is a no-op — every point is collected
  * immediately; the repo's batch-frame fixture replays are exactly this
  * path) or a **Real** wall clock (`Until(t)` sleeps, so points are
  * collected at their recorded inter-point intervals, shifted so the
  * first point lands at the replay's start).
  *
  * Rather than sleeping, the schedule is COMPUTED as columns — the same
  * move ScrapeScheduler/StatsEmit make for their wall grids — so a user
  * (or a spec) can inspect, aggregate, or drive an emitter from it:
  *
  *   - `emit_wall_us` — the wall-clock µs at which the collector receives
  *     the row. `replayStreamFromChan` computes `waitTime = t + diff`
  *     with `diff = zero − t_first` (t_first = the FIRST point in FILE
  *     order, not the minimum — a recording whose head is not its oldest
  *     point keeps that quirk) and calls `Until(waitTime)`, which returns
  *     immediately for past times — so the wall time actually observed is
  *     the RUNNING MAX of the schedule. Fast clock: always `zero`.
  *   - `eff_time_us` — the point's time as collected. With
  *     `recTime=false` (the default replay mode) the reference REWRITES
  *     each point's time to its (unclamped) `waitTime`, i.e. the
  *     recording is re-stamped onto the replay timeline; `recTime=true`
  *     keeps the recorded stamps.
  *
  * Scale shape: a recording replays strictly sequentially by definition
  * (the reference walks the file point by point against one clock), so
  * the window is ordered WITHIN one recording — bounded by recording
  * size, never corpus size. Both entry points take `recordingIdCol`:
  * pass `Some(col)` for a frame holding many recordings (each schedules
  * independently against its own clock, exactly N parallel replays) and
  * `None` only when the frame IS a single recording. The parameter has
  * no default on purpose — the caller must assert which shape they have,
  * so the single-partition global sort is never reached by accident.
  */
object ReplayClock {

  sealed trait Mode
  /** clock.Wall() — Until(t) sleeps until t arrives (clock.go:31-44). */
  case object Real extends Mode
  /** clock.Fast() — Until is a no-op (clock.go:47-62). */
  case object Fast extends Mode

  /** Stream pacing (replayStreamFromChan, replay.go:49-79). `points` must
    * carry the recording's FILE order in `orderCol` and the recorded time
    * as epoch-µs in `timeUsCol`. */
  def streamSchedule(
      points: DataFrame,
      timeUsCol: String,
      orderCol: String,
      zeroUs: Long,
      mode: Mode,
      recTime: Boolean,
      recordingIdCol: Option[String]): DataFrame = {
    val w = recordingIdCol.fold(Window.orderBy(col(orderCol)))(
        id => Window.partitionBy(col(id)).orderBy(col(orderCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t0 = first(col(timeUsCol)).over(w)
    // waitTime = p.Time() + (zero − start) — replay.go:59
    val wait = lit(zeroUs) + (col(timeUsCol) - t0)
    val emit: Column = mode match {
      case Fast => lit(zeroUs)
      // Until returns immediately for past times, so the observed wall is
      // the running max of the schedule (out-of-order recordings emit
      // their stragglers at the wall already reached)
      case Real => lit(zeroUs) + (max(col(timeUsCol)).over(w) - t0)
    }
    points
      .withColumn("emit_wall_us", emit)
      // SetTime uses the UNCLAMPED waitTime (replay.go:60-64)
      .withColumn("eff_time_us", if (recTime) col(timeUsCol) else wait)
  }

  /** Batch pacing (replayBatchFromChan, replay.go:183-230). One row per
    * batch DOCUMENT in file order: `beginUsCol` = the recorded tmax (Go
    * zero time → null), `firstPtUsCol`/`lastPtUsCol` = the recorded times
    * of the batch's first/last point (null for empty batches). Returns
    *   - `emit_wall_us`: the wall at which the batch is collected —
    *     non-empty batches `Until(lastTime)` with `lastTime = zero +
    *     (last_pt − t0)` (IDENTICAL under both recTime modes: the
    *     reference computes it pre-shift one way and post-shift the
    *     other, landing on the same instant), clamped to the running
    *     max; empty batches skip Until and emit at the wall reached so
    *     far (zero if nothing emitted yet). Fast clock: always `zero`.
    *   - `eff_tmax_us`: the batch's Begin/tmax as collected — a non-empty
    *     batch's begin is raised to its last point's EFFECTIVE time when
    *     it lags it (begin itself is never shifted — replay.go:221-224
    *     compares the unshifted begin against the possibly-shifted last
    *     point, a faithful quirk); an empty batch keeps its recorded
    *     begin, or inherits the previous batch's tmax when its begin is
    *     the Go zero time (replay.go:193-200). */
  def batchSchedule(
      batches: DataFrame,
      orderCol: String,
      beginUsCol: String,
      firstPtUsCol: String,
      lastPtUsCol: String,
      zeroUs: Long,
      mode: Mode,
      recTime: Boolean,
      recordingIdCol: Option[String]): DataFrame = {
    val w = recordingIdCol.fold(Window.orderBy(col(orderCol)))(
        id => Window.partitionBy(col(id)).orderBy(col(orderCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // start = first point of the first NON-EMPTY batch (replay.go:206-209)
    val t0 = first(col(firstPtUsCol), ignoreNulls = true).over(w)
    val emit: Column = mode match {
      case Fast => lit(zeroUs)
      case Real => coalesce(
        lit(zeroUs) + (max(col(lastPtUsCol)).over(w) - t0),
        lit(zeroUs))
    }
    // the last point's time as the collector sees it
    val effLast =
      if (recTime) col(lastPtUsCol)
      else lit(zeroUs) + (col(lastPtUsCol) - t0)
    val tmaxBase = when(col(lastPtUsCol).isNotNull,
        greatest(coalesce(col(beginUsCol), effLast), effLast))
      .otherwise(col(beginUsCol)) // empty: keep begin; null begin stays null
    batches
      .withColumn("emit_wall_us", emit)
      // empty batches with a Go-zero begin inherit the previous tmax —
      // last_value(ignoreNulls) over file order IS that inheritance (an
      // empty batch's own base is null exactly when it must inherit)
      .withColumn("eff_tmax_us", last(tmaxBase, ignoreNulls = true).over(w))
  }

  /** The per-point time rewrite batch replay applies under
    * `recTime=false` (replay.go:212-216): identical arithmetic to the
    * stream rewrite, with `t0` = the first non-empty batch's first point.
    * Exposed so a caller re-stamping batch POINTS uses the same column
    * the schedule used. */
  def batchPointTime(timeUs: Column, t0Us: Long, zeroUs: Long, recTime: Boolean): Column =
    if (recTime) timeUs else lit(zeroUs) + (timeUs - lit(t0Us))
}
