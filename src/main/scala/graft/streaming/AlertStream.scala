package graft.streaming

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The Kapacitor alert state machine (reference alert.go:1110-1295) as a
  * typed per-group FSM, runnable over static Datasets (flatMapGroups) and
  * streams (flatMapGroupsWithState, state-store backed — exactly the
  * per-group state the reference keeps in alertState).
  *
  * Faithful semantics, in order (reference alert.go Point handler):
  *   1. determineLevel: try levels above current first (crit→current);
  *      if the current level has a reset expression that fails, hold the
  *      level (hysteresis); otherwise first passing level below, else OK
  *      (alert.go:915-949).
  *   2. addEvent: changed := newest-history != level; push into the ring;
  *      update flapping via the weighted percent-change with low/high
  *      hysteresis (alert.go:1233-1287, weights ramp maxWeight/weightDiff →
  *      maxWeight = 0.8 → 1.2).
  *   3. suppress when flapping, or when stateChangesOnly and unchanged.
  *   4. on (level != OK || changed): triggered(t) — firstTriggered resets
  *      when the previous level was OK; duration = lastTriggered −
  *      firstTriggered; recoveries suppressed when noRecoveries.
  *
  * Levels: 0=OK 1=INFO 2=WARNING 3=CRITICAL.
  */
object AlertStream {

  /** Per-point predicate results: passN = level-N expression, resetN =
    * level-N reset expression (ignored unless cfg.resetDefined(N-1)). */
  case class AlertPoint(
      group: String, timeUs: Long,
      pass1: Boolean, pass2: Boolean, pass3: Boolean,
      reset1: Boolean = true, reset2: Boolean = true, reset3: Boolean = true)

  case class AlertEvent(
      group: String, timeUs: Long, level: Int, levelName: String,
      durationUs: Long, changed: Boolean, flapping: Boolean)

  case class FsmState(
      history: Seq[Int], idx: Int, flapping: Boolean,
      firstUs: Long, lastUs: Long)

  /** @param stateChangesOnlyMaxIntervalUs with stateChangesOnly, re-emit an
    *        unchanged state once this much event time has passed since the
    *        last emitted event (reference .stateChangesOnly(maxInterval),
    *        alert.go updateExpired:1289); 0 = never re-emit. */
  case class AlertConfig(
      historyLen: Int = 21,
      useFlapping: Boolean = false,
      flapLow: Double = 0.25,
      flapHigh: Double = 0.5,
      stateChangesOnly: Boolean = false,
      stateChangesOnlyMaxIntervalUs: Long = 0L,
      noRecoveries: Boolean = false,
      resetDefined: Seq[Boolean] = Seq(false, false, false)) {
    require(historyLen >= 2, "flapping history needs at least 2 entries")
  }

  val levelNames: Seq[String] = Seq("OK", "INFO", "WARNING", "CRITICAL")

  /** Level classification column (reference determineLevel's simple path,
    * for pipelines that don't need reset hysteresis). */
  def levelColumn(info: Column, warn: Column, crit: Column): Column =
    when(crit, 3).when(warn, 2).when(info, 1).otherwise(0)

  def initialState(cfg: AlertConfig): FsmState =
    FsmState(Vector.fill(cfg.historyLen)(0), 0, flapping = false, 0L, 0L)

  private def determineLevel(cfg: AlertConfig, cur: Int, p: AlertPoint): Int = {
    def passes(l: Int): Boolean = l match {
      case 1 => p.pass1; case 2 => p.pass2; case 3 => p.pass3; case _ => false
    }
    def resetPasses(l: Int): Boolean = l match {
      case 1 => p.reset1; case 2 => p.reset2; case 3 => p.reset3; case _ => true
    }
    val stop = math.max(cur - 1, 0)
    (3 until stop by -1).find(passes) match {
      case Some(higher) => higher
      case None =>
        if (cur > 0 && cfg.resetDefined(cur - 1) && !resetPasses(cur)) cur
        else (math.min(cur, 3) to 1 by -1).find(passes).getOrElse(0)
    }
  }

  /** Weighted fraction of level changes across the history ring
    * (reference percentChange, alert.go:1251-1273). */
  private[graft] def percentChange(history: Seq[Int], idx: Int): Double = {
    val l = history.length
    val maxWeight = 1.2
    val weightDiff = 1.5
    var weight = maxWeight / weightDiff
    val step = (maxWeight - weight) / (l - 1)
    var changes = 0.0
    var i = 0
    while (i < l - 1) {
      val c = (i + idx) % l
      val p = if (c - 1 < 0) l - 1 else c - 1
      if (history(c) != history(p)) changes += weight
      weight += step
      i += 1
    }
    changes / (l - 1)
  }

  /** A pre-leveled event point — what a windowed batch reduces to
    * (alert.go:1022-1060 BufferedBatch: one addEvent per batch). */
  case class LevelPoint(group: String, timeUs: Long, level: Int)

  /** One FSM transition; returns the new state and an optional event. */
  def step(cfg: AlertConfig, st: FsmState, p: AlertPoint): (FsmState, Option[AlertEvent]) = {
    val cur = st.history(st.idx)
    val level = determineLevel(cfg, cur, p)
    stepLevel(cfg, st, p.group, p.timeUs, level)
  }

  /** FSM transition from a precomputed level (batch path — the reference
    * determines one level per buffered batch then runs the same
    * addEvent/trigger logic, alert.go:1060-1090). */
  def stepLevel(cfg: AlertConfig, st: FsmState, group: String, timeUs: Long,
      level: Int): (FsmState, Option[AlertEvent]) = {
    val cur = st.history(st.idx)
    // addEvent
    val changed = cur != level
    val idx2 = (st.idx + 1) % cfg.historyLen
    val hist2 = st.history.updated(idx2, level)
    val flapping2 =
      if (!cfg.useFlapping) st.flapping
      else {
        val pc = percentChange(hist2, idx2)
        if (st.flapping && pc < cfg.flapLow) false
        else if (!st.flapping && pc > cfg.flapHigh) true
        else st.flapping
      }
    val st2 = st.copy(history = hist2, idx = idx2, flapping = flapping2)
    // expired: unchanged for maxInterval of event time → re-emit anyway
    val expired = !changed && cfg.stateChangesOnlyMaxIntervalUs != 0 &&
      timeUs - st.lastUs >= cfg.stateChangesOnlyMaxIntervalUs
    if ((cfg.useFlapping && flapping2) || (cfg.stateChangesOnly && !changed && !expired))
      (st2, None)
    else if (level != 0 || changed) {
      // triggered(t): previous level OK → new alert run begins now
      val first = if (cur == 0) timeUs else st.firstUs
      val st3 = st2.copy(firstUs = first, lastUs = timeUs)
      if (cfg.noRecoveries && level == 0) (st3, None)
      else
        (st3, Some(AlertEvent(group, timeUs, level, levelNames(level),
          timeUs - first, changed, flapping2)))
    } else (st2, None)
  }

  /** Reduce windowed batches to one level-event per batch
    * (alert.go:1022-1060 BufferedBatch, incl. `.all()`
    * pipeline/alert.go:490-496): per (group, batch) the batch level is the
    * lowest point level when `all` (every point must match) else the
    * highest; the event time is the batch time when `all` or the level is
    * OK, otherwise the time of the FIRST point carrying the highest level.
    * Declarative: one aggregate over (group, batch) — min/max for the
    * level, min_by over a (level-complement, time, id) key for the
    * highest-point time. Feed the result to [[runBatchLevels]].
    *
    * State-free determineLevel only (no reset hysteresis): the reference
    * evaluates resets per point against FSM state; batch alerts with reset
    * expressions are out of scope (documented). */
  def batchLevels(
      df: org.apache.spark.sql.DataFrame,
      groupCol: Column,
      batchTimeUs: Column,
      pointTimeUs: Column,
      idTiebreak: Column,
      level: Column,
      all: Boolean): org.apache.spark.sql.DataFrame = {
    // first point with the maximal level: min_by on (3-level, time, id)
    val ordKey = format_string("%01d%020d%010d", lit(3) - level, pointTimeUs, idTiebreak)
    val agg = df.groupBy(groupCol.as("group"), batchTimeUs.as("batch_us"))
      .agg(
        (if (all) min(level) else max(level)).as("level"),
        min_by(pointTimeUs, ordKey).as("high_us"))
    val t = if (all) col("batch_us") else when(col("level") === 0, col("batch_us")).otherwise(col("high_us"))
    agg.select(col("group"), t.as("time_us"), col("level"))
  }

  /** Batch-edge FSM over pre-leveled events, per group in time order.
    *
    * Memory-bounded: repartition by group + sortWithinPartitions gives each
    * group as a contiguous time-sorted run (secondary sort — the shuffle
    * writes sort spillable runs, never an in-memory group buffer), and the
    * FSM is a streaming fold over the partition iterator whose only state is
    * one FsmState. A skewed group costs sort spill, not executor OOM. */
  def runBatchLevels(points: Dataset[LevelPoint], cfg: AlertConfig): Dataset[AlertEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.repartition(col("group"))
      .sortWithinPartitions(col("group"), col("timeUs"))
      .mapPartitions { it =>
        var curGroup: String = null
        var st = initialState(cfg)
        it.flatMap { p =>
          if (p.group != curGroup) { curGroup = p.group; st = initialState(cfg) }
          val (st2, ev) = stepLevel(cfg, st, p.group, p.timeUs, p.level); st = st2; ev
        }
      }
  }

  /** Batch execution: per group in time order, fresh state. Secondary-sorted
    * partition fold — see [[runBatchLevels]] for the bounded-memory shape. */
  def runBatch(points: Dataset[AlertPoint], cfg: AlertConfig): Dataset[AlertEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.repartition(col("group"))
      .sortWithinPartitions(col("group"), col("timeUs"))
      .mapPartitions { it =>
        var curGroup: String = null
        var st = initialState(cfg)
        it.flatMap { p =>
          if (p.group != curGroup) { curGroup = p.group; st = initialState(cfg) }
          val (st2, ev) = step(cfg, st, p); st = st2; ev
        }
      }
  }

  /** Streaming execution: identical FSM, state kept in the state store and
    * carried across micro-batches (points within a batch are replayed in
    * time order). Output mode: Update. */
  def runStreaming(points: Dataset[AlertPoint], cfg: AlertConfig): Dataset[AlertEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.group)
      .flatMapGroupsWithState[FsmState, AlertEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[AlertPoint], gs: GroupState[FsmState]) =>
          var st = gs.getOption.getOrElse(initialState(cfg))
          // buffers one group's slice of ONE micro-batch (bounded by the
          // trigger interval); cross-batch state is just FsmState
          val out = it.toSeq.sortBy(_.timeUs).flatMap { p =>
            val (st2, ev) = step(cfg, st, p); st = st2; ev
          }
          gs.update(st)
          out.iterator
      }
  }
}
