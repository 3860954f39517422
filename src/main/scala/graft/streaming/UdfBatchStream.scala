package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.UdfProto.{ProtoBatch, ProtoPoint}

/** Batch-edge assembly over a STREAMING point flow — the missing half of
  * the reference's stream→window→UDF batch tasks under Structured
  * Streaming: points buffer in keyed state per (name, group), and each
  * tumbling window's ProtoBatch emits EXACTLY ONCE, when the event-time
  * watermark passes the window end (the reference window node's emit;
  * window.go batch emission at period boundaries). Downstream,
  * [[graft.sources.UdfProto.pipeBatches]] is mapPartitions-shaped and
  * drives the BATCH agent per micro-batch — `assembleBatches ∘
  * pipeBatches` is the streaming equivalent of
  * `TickScript.protobufBatchUdf` on a static frame (UdfBatchStreamSpec
  * pins the parity).
  *
  * Scale shape: state per (name, group) holds only that group's OPEN
  * windows — closed windows leave state at emit, and `maxPointsPerWindow`
  * hard-caps a degenerate group so state cannot grow unboundedly
  * (overflow keeps the earliest points and counts the loss in an
  * accumulator, the [[DedupStream]] convention: observable, not silent).
  */
object UdfBatchStream {

  case class OpenWindow(startS: Long, points: Seq[ProtoPoint])
  case class WindowBuf(open: Seq[OpenWindow])
  /** Internal carrier: the watermark column must survive into the typed
    * groupByKey (not `private` — the Encoder's generated deserializer
    * needs a public constructor). */
  case class TimedPoint(ts: java.sql.Timestamp, p: ProtoPoint)

  /** One tumbling window of `periodS` per (name, group), emitted when the
    * watermark passes its end. Batch meta mirrors the window node: tags
    * from the group's points, `tmax` = the window END in ns (the emit
    * time a window batch carries), size = buffered count. `watermarkDelay`
    * is the usual lateness allowance (`withWatermark` syntax). */
  def assembleBatches(
      points: Dataset[ProtoPoint],
      periodS: Long,
      watermarkDelay: String = "0 seconds",
      maxPointsPerWindow: Int = 100000,
      overflow: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[ProtoBatch] = {
    require(periodS > 0, "periodS must be positive")
    val spark = points.sparkSession
    import spark.implicits._
    val overflowAcc = overflow.getOrElse(
      spark.sparkContext.longAccumulator("graft.udfbatch.windowOverflow"))
    val per = periodS
    val cap = maxPointsPerWindow
    val timed = points
      .withColumn("__ts", timestamp_micros(expr("time DIV 1000")))
      .select(col("__ts").as("ts"), struct(points.columns.map(col).toIndexedSeq: _*).as("p"))
      .withWatermark("ts", watermarkDelay)
      .as[TimedPoint]
    timed
      .groupByKey(tp => (tp.p.name, tp.p.group))
      .flatMapGroupsWithState[WindowBuf, ProtoBatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, String), it: Iterator[TimedPoint], gs: GroupState[WindowBuf]) =>
          val (name, group) = key
          var open = gs.getOption.map(_.open).getOrElse(Vector.empty).toVector
          // fold arriving points into their buckets (floor to the period
          // grid — the tumbling assignment of Pipe.windowTumbling)
          it.foreach { tp =>
            val startS = Math.floorDiv(Math.floorDiv(tp.p.time, 1000000000L), per) * per
            open.indexWhere(_.startS == startS) match {
              case -1 => open :+= OpenWindow(startS, Vector(tp.p))
              case i =>
                if (open(i).points.length < cap)
                  open = open.updated(i, open(i).copy(points = open(i).points :+ tp.p))
                else overflowAcc.add(1L)
            }
          }
          // windows the watermark has passed emit now, in window order;
          // in-window point order is event time (deterministic)
          val wmMs = gs.getCurrentWatermarkMs()
          val (ripe, still) = open.partition(w => (w.startS + per) * 1000L <= wmMs)
          val out = ripe.sortBy(_.startS).map { w =>
            val pts = w.points.sortBy(p => (p.time, p.tags.toSeq.sortBy(_._1).mkString))
            ProtoBatch(
              name = name, group = group,
              tags = pts.headOption.map(_.tags).getOrElse(Map.empty),
              byName = false, tmax = (w.startS + per) * 1000000000L,
              points = pts)
          }
          if (still.isEmpty) gs.remove()
          else {
            gs.update(WindowBuf(still))
            // wake when the earliest open window becomes ripe, even with
            // no new data for the group
            gs.setTimeoutTimestamp(still.map(w => (w.startS + per) * 1000L).min)
          }
          out.iterator
      }
  }
}
