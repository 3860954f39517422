package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The stats service's ticker over a LIVE observation stream — the
  * streaming half of [[graft.sources.StatsEmit]] (reference
  * services/stats/service.go:104-136: every interval, snapshot each
  * statistic's current values into the stream):
  *
  * per statistic key, the state store holds the latest finalized value,
  * the last fire already emitted, and a small buffer of observations
  * still ahead of the watermark; as the event-time watermark passes each
  * interval boundary, one point per elapsed fire is emitted carrying the
  * value current AT THAT FIRE — including fires with no new observation
  * (the ticker reads the live expvar whether or not it changed), which
  * is exactly the fill-forward the batch as-of join computes. A
  * statistic emits nothing before its first observation (GetStatsData's
  * `len(values)==0` skip); an observation landing exactly ON a boundary
  * is included in that fire (at-or-before), matching the batch rule.
  *
  * Scale shape: the stat registry is bounded, so the state store holds a
  * handful of rows per statistic regardless of corpus size; the pending
  * buffer holds only observations newer than the watermark (bounded by
  * the disorder allowance). Event-time timeouts keep quiet stats ticking
  * with no new input.
  */
object StatsEmitStream {

  /** `time` mirrors `timeUs` as a timestamp: it is the WATERMARK CARRIER
    * — the caller's `.withWatermark` column must survive into the typed
    * row or Spark rejects the event-time timeout. */
  case class StatObs(key: String, timeUs: Long, value: Double,
      time: java.sql.Timestamp)
  case class StatPoint(fireUs: Long, key: String, value: Double)
  /** `last` = latest finalized value; `through` = last fire emitted
    * (MinValue before the first); `pending` = observations ahead of the
    * watermark. */
  case class TickState(last: Option[Double], through: Long,
      pending: Vector[(Long, Double)])

  /** Emit the ticker points for every fire (multiple of `intervalUs`)
    * the watermark has passed. The caller applies `.withWatermark` to
    * the source frame before converting to [[StatObs]]. */
  def statsPoints(obs: Dataset[StatObs], intervalUs: Long): Dataset[StatPoint] = {
    require(intervalUs > 0, "stats interval must be positive")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[TickState, StatPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[StatObs], gs: GroupState[TickState]) =>
          val prior = gs.getOption
            .getOrElse(TickState(None, Long.MinValue, Vector.empty))
          val wmMs = gs.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val pending = (prior.pending ++
            it.map(o => (o.timeUs, o.value))).sortBy(_._1)
          val (ripe, rest) = pending.partition(_._1 <= wmUs)
          var last = prior.last
          var through = prior.through
          val out = Seq.newBuilder[StatPoint]
          ripe.foreach { case (t, v) =>
            if (last.isEmpty) {
              // fires begin at the first boundary AT or after the first
              // observation (floor of t-1: an on-boundary obs is included
              // in that very fire)
              through = Math.floorDiv(t - 1, intervalUs) * intervalUs
            } else {
              // emit every fire strictly before this observation folds in
              var f = through + intervalUs
              while (f < t && f <= wmUs) {
                out += StatPoint(f, key, last.get); through = f
                f += intervalUs
              }
            }
            last = Some(v)
          }
          if (last.isDefined) {
            var f = through + intervalUs
            while (f <= wmUs) {
              out += StatPoint(f, key, last.get); through = f
              f += intervalUs
            }
          }
          gs.update(TickState(last, through, rest))
          if (last.isDefined) {
            val nextMs = (through + intervalUs) / 1000L
            gs.setTimeoutTimestamp(math.max(nextMs, wmMs + 1))
          } else if (rest.nonEmpty) {
            // nothing finalized yet: wake as soon as the watermark moves
            // so the pending buffer can ripen
            gs.setTimeoutTimestamp(wmMs + 1)
          }
          out.result().iterator
      }
  }
}
