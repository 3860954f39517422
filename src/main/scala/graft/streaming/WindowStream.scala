package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming window execution (SURVEY §2.4 / M5): time windows ride Spark's
  * native watermarked window aggregation; the Kapacitor-specific shapes —
  * count-based windows and idle barriers — are typed state-store FSMs, the
  * streaming analog of the reference's per-group ring buffers
  * (window.go:360-470) and barrier tracking (barrier.go:86-229).
  */
object WindowStream {

  /** window().period(p).every(e) + mean/count over a stream: Spark's
    * sliding window generator with an event-time watermark standing in for
    * the reference's barrier-driven emission. At scale this is the
    * canonical shape: state partitioned by (window, dims) in the state
    * store, late data dropped past the watermark. */
  def windowedMeanCount(
      stream: DataFrame,
      timeCol: String,
      valueCol: String,
      dims: Seq[String],
      periodSeconds: Long,
      everySeconds: Long,
      watermarkDelay: String): DataFrame = {
    val keys = window(col(timeCol), s"$periodSeconds seconds", s"$everySeconds seconds") +:
      dims.map(col)
    stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"), avg(valueCol).as("mean_v"))
      .select(
        col("window.start").as("wstart") +: col("window.end").as("wend") +:
          dims.map(col) :+ col("cnt") :+ col("mean_v"): _*)
  }

  case class CountPoint(group: String, timeUs: Long, value: Double)
  case class CountWindowAgg(group: String, timeUs: Long, n: Int, mean: Double)
  case class RingState(times: Seq[Long], values: Seq[Double], seen: Long)

  /** Count window periodCount=n everyCount=m (reference window.go:360-470):
    * every m-th point per group emits the aggregate of the last n points.
    * `fillPeriod` waits for a full n before the first emit. The ring buffer
    * lives in the state store, one per group — identical shape to the
    * reference's circularqueue, but sharded across executors. */
  def countWindowMean(
      points: Dataset[CountPoint],
      n: Int,
      m: Int,
      fillPeriod: Boolean = false): Dataset[CountWindowAgg] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.group)
      .flatMapGroupsWithState[RingState, CountWindowAgg](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, it: Iterator[CountPoint], gs: GroupState[RingState]) =>
          var st = gs.getOption.getOrElse(RingState(Vector.empty, Vector.empty, 0L))
          // the toSeq here buffers one group's slice of ONE micro-batch
          // (bounded by the trigger interval), not the group's history —
          // cross-batch state is only the n-point ring in the state store
          val out = it.toSeq.sortBy(_.timeUs).flatMap { p =>
            val times = (st.times :+ p.timeUs).takeRight(n)
            val values = (st.values :+ p.value).takeRight(n)
            val seen = st.seen + 1
            st = RingState(times, values, seen)
            val due = seen % m == 0 && (!fillPeriod || seen >= n)
            if (due) Some(CountWindowAgg(group, p.timeUs, values.length,
              values.sum / values.length))
            else None
          }
          gs.update(st)
          out.iterator
      }
  }

  case class BarrierEvent(group: String, emittedAtUs: Long, kind: String)
  case class IdleState(lastSeenUs: Long)
  case class PeriodicState(armWallUs: Long, fired: Long)

  /** barrier().period(d) (reference barrier.go:230-320): emit a barrier for
    * every group each `periodMs` of wall-clock regardless of traffic. The
    * timer re-arms on expiry instead of resetting on data (that's the
    * difference from [[idleBarrier]]).
    *
    * The barrier's DATA time is the wall TICK time — `emitBarrier`
    * stamps time.Now() (barrier.go:312-314), never the last point's data
    * time. A Go time.Ticker fires on the grid arm+k·period, so the stamp
    * is derived deterministically from the arming wall time and the fire
    * ordinal: the same law the batch simulator replays (Barrier.simulate's
    * `deadline` grid), which the streaming-vs-batch parity spec pins. */
  def periodicBarrier(
      points: Dataset[CountPoint],
      periodMs: Long): Dataset[BarrierEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.group)
      .flatMapGroupsWithState[PeriodicState, BarrierEvent](
        OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (group: String, it: Iterator[CountPoint], gs: GroupState[PeriodicState]) =>
          if (gs.hasTimedOut) {
            val st = gs.get
            val k = st.fired + 1
            gs.update(st.copy(fired = k))
            gs.setTimeoutDuration(periodMs)
            Iterator.single(
              BarrierEvent(group, st.armWallUs + k * periodMs * 1000L, "periodic"))
          } else {
            it.foreach(_ => ()) // drain; periodic ticks ignore data times
            if (gs.getOption.isEmpty) {
              // first message for the group starts its ticker (the batch
              // simulator anchors `deadline` at first arrival the same way)
              gs.update(PeriodicState(gs.getCurrentProcessingTimeMs() * 1000L, 0L))
              gs.setTimeoutDuration(periodMs)
            }
            Iterator.empty
          }
      }
  }

  /** barrier().idle(d) [.delete()] (reference barrier.go:86-229): when a
    * group has been idle for `idleMs` of wall clock, emit a barrier whose
    * DATA time is lastPointTime + idle — and that barrier becomes the new
    * lastPointTime, so continued silence yields barriers every `idle`
    * apart in data time (emitBarrier barrier.go:196-209; the same law the
    * batch Barrier simulator and the Barrier_Idle goldens pin). With
    * `delete`, the first barrier retires the group's state (DeleteGroup →
    * GroupState.remove). Timeout-driven via the processing-time clock, the
    * streaming analog of the reference's idle timers. */
  def idleBarrier(
      points: Dataset[CountPoint],
      idleMs: Long,
      deleteGroups: Boolean): Dataset[BarrierEvent] = {
    val spark = points.sparkSession
    import spark.implicits._
    val idleUs = idleMs * 1000L
    points.groupByKey(_.group)
      .flatMapGroupsWithState[IdleState, BarrierEvent](
        OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (group: String, it: Iterator[CountPoint], gs: GroupState[IdleState]) =>
          if (gs.hasTimedOut) {
            val last = gs.getOption.map(_.lastSeenUs).getOrElse(0L)
            val bt = last + idleUs // barrier data time = lastPointT + idle
            if (deleteGroups) gs.remove()
            else {
              gs.update(IdleState(bt)) // the barrier advances lastPointT
              gs.setTimeoutDuration(idleMs)
            }
            Iterator.single(BarrierEvent(group, bt, if (deleteGroups) "delete" else "barrier"))
          } else {
            val maxT = it.map(_.timeUs).foldLeft(
              gs.getOption.map(_.lastSeenUs).getOrElse(0L))(math.max)
            gs.update(IdleState(maxT))
            gs.setTimeoutDuration(idleMs)
            Iterator.empty
          }
      }
  }
}
