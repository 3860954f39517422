package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Autoscale computation (reference autoscale.go:32-411 — the shared
  * engine behind k8sAutoscale/swarmAutoscale/ec2Autoscale): per resource,
  * in time order, evaluate the desired-replica expression against each
  * point (optionally reading the current replica count), clamp to
  * [min, max], and emit a scaling event `{old, new}` unless the change is
  * suppressed by the per-direction cooldown. Reference semantics
  * preserved exactly:
  *
  *   - the FIRST point of a resource queries its live replica count
  *     (autoscale.go:188-198) — injected here as `initialReplicas`, the
  *     moral equivalent of `autoscaler.Replicas(id)`;
  *   - `max <= 0` means unbounded above; desired is clamped to `min`
  *     below (autoscale.go:212-218), and min ≥ 1 is validated at
  *     definition (autoscale.go:84-86);
  *   - `new == current` emits nothing and changes nothing (:221-224);
  *   - an increase inside `lastIncrease + increaseCooldown` (a decrease
  *     inside the decrease cooldown) is DROPPED and does NOT update the
  *     stored current count (:231-252 — the value-copy state is only
  *     written back on success), so the next point re-evaluates against
  *     the pre-drop count;
  *   - the emitted event carries the point time and `{old, new}` fields
  *     (:264-283).
  *
  * The cluster connectors' SOCKETS stay out of the engine — `applyEvents`
  * takes the `setReplicas` side effect as an injectable transport, the
  * same seam as the alert handler runners in [[graft.sources.Sinks]] —
  * but the request SHAPES are first-class:
  * [[graft.functions.AutoscaleClients]] formats the k8s Scale
  * JSON-Patch, the swarm version-tagged Spec update, and the EC2
  * SetDesiredCapacity query byte-exactly, and its
  * `k8sSetReplicas`/`swarmSetReplicas`/`ec2SetReplicas` glue plugs
  * straight into `applyEvents`. Counters (increase_events,
  * decrease_events, cooldown_drops — autoscale.go:20-23) are optional
  * Spark accumulators, the distributed equivalent of the node's expvars.
  *
  * Scale shape: batch = repartition by resource + sortWithinPartitions +
  * a one-state partition fold (secondary sort, no in-memory group
  * buffer); streaming = the identical step function under
  * `flatMapGroupsWithState`, state-store backed. One shuffle either way.
  */
object AutoscaleStream {

  case class AutoscalePoint(resource: String, timeUs: Long, value: Double)

  case class ScaleEvent(resource: String, timeUs: Long, old: Long, replicas: Long)

  case class AutoscaleState(
      initialized: Boolean,
      current: Long,
      lastIncreaseUs: Long,
      lastDecreaseUs: Long)

  /** `replicas(pointValue, currentReplicas)` is the replicas lambda with
    * the reference's optional CurrentField already bound (pipeline
    * k8s_autoscale.go:100-122). `initialReplicas` answers the first-sight
    * resource query. */
  case class AutoscaleConfig(
      min: Long,
      max: Long,
      increaseCooldownUs: Long,
      decreaseCooldownUs: Long,
      replicas: (Double, Long) => Long,
      initialReplicas: String => Long)

  case class Counters(
      increases: Option[LongAccumulator] = None,
      decreases: Option[LongAccumulator] = None,
      cooldownDrops: Option[LongAccumulator] = None)

  private def initState = AutoscaleState(
    initialized = false, current = 0L,
    lastIncreaseUs = Long.MinValue / 2, lastDecreaseUs = Long.MinValue / 2)

  /** One point through the FSM — the autoscale.go:181-283 handlePoint
    * body minus the transports. */
  def step(
      cfg: AutoscaleConfig,
      st0: AutoscaleState,
      p: AutoscalePoint,
      ctr: Counters = Counters()): (AutoscaleState, Option[ScaleEvent]) = {
    val st =
      if (st0.initialized) st0
      else st0.copy(initialized = true, current = cfg.initialReplicas(p.resource))
    var desired = cfg.replicas(p.value, st.current)
    if (cfg.max > 0 && desired > cfg.max) desired = cfg.max
    if (desired < cfg.min) desired = cfg.min
    if (desired == st.current) (st, None)
    else if (desired > st.current) {
      if (p.timeUs < st.lastIncreaseUs + cfg.increaseCooldownUs) {
        ctr.cooldownDrops.foreach(_.add(1)); (st, None)
      } else {
        ctr.increases.foreach(_.add(1))
        (st.copy(current = desired, lastIncreaseUs = p.timeUs),
          Some(ScaleEvent(p.resource, p.timeUs, st.current, desired)))
      }
    } else {
      if (p.timeUs < st.lastDecreaseUs + cfg.decreaseCooldownUs) {
        ctr.cooldownDrops.foreach(_.add(1)); (st, None)
      } else {
        ctr.decreases.foreach(_.add(1))
        (st.copy(current = desired, lastDecreaseUs = p.timeUs),
          Some(ScaleEvent(p.resource, p.timeUs, st.current, desired)))
      }
    }
  }

  /** Batch execution: per resource in time order, fresh state. Points
    * sharing a timestamp fold in an unspecified order, matching the
    * reference's dependence on stream arrival order for simultaneous
    * points; feed a strictly ordered time axis for bit-stable output. */
  def runBatch(
      points: Dataset[AutoscalePoint],
      cfg: AutoscaleConfig,
      ctr: Counters = Counters()): Dataset[ScaleEvent] = {
    require(cfg.min >= 1, s"minimum count must be >= 1, got ${cfg.min}")
    val spark = points.sparkSession
    import spark.implicits._
    points.repartition(col("resource"))
      .sortWithinPartitions(col("resource"), col("timeUs"))
      .mapPartitions { it =>
        var curRes: String = null
        var st = initState
        it.flatMap { p =>
          if (p.resource != curRes) { curRes = p.resource; st = initState }
          val (st2, ev) = step(cfg, st, p, ctr); st = st2; ev
        }
      }
  }

  /** Streaming execution: identical FSM, state carried across
    * micro-batches in the state store. Output mode: Update. */
  def runStreaming(
      points: Dataset[AutoscalePoint],
      cfg: AutoscaleConfig,
      ctr: Counters = Counters()): Dataset[ScaleEvent] = {
    require(cfg.min >= 1, s"minimum count must be >= 1, got ${cfg.min}")
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.resource)
      .flatMapGroupsWithState[AutoscaleState, ScaleEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[AutoscalePoint], gs: GroupState[AutoscaleState]) =>
          var st = gs.getOption.getOrElse(initState)
          val out = it.toSeq.sortBy(_.timeUs).flatMap { p =>
            val (st2, ev) = step(cfg, st, p, ctr); st = st2; ev
          }
          gs.update(st)
          out.iterator
      }
  }

  /** Apply scaling events through an injectable transport — the
    * `autoscaler.SetReplicas` seam (autoscale.go:285-289) without the
    * cluster clients. Runs per partition on the executors, like
    * [[graft.sources.Sinks.execAlert]]. */
  def applyEvents(
      events: Dataset[ScaleEvent],
      setReplicas: (String, Long) => Unit): Unit =
    events.foreachPartition { (it: Iterator[ScaleEvent]) =>
      it.foreach(e => setReplicas(e.resource, e.replicas))
    }
}
