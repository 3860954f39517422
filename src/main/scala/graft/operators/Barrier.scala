package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Batch rendering of `barrier().idle(d)` / `barrier().period(d)`
  * (reference barrier.go:86-320): the reference runs one timer goroutine
  * per group against the wall clock; replayed deterministically here from
  * each point's ARRIVAL time (wall) alongside its data timestamp — the two
  * differ whenever history is replayed, which is exactly what the
  * reference's barrier integration tests exercise.
  *
  * Semantics reproduced:
  *  - idle (barrier.go:86-229): a per-group timer of `idle` wall-seconds,
  *    reset on every forwarded point; on expiry the barrier's DATA time is
  *    lastPointTime + idle (and becomes the new lastPointTime, so
  *    continued silence yields barriers every `idle` apart in data time);
  *  - period (barrier.go:230-320): a per-group wall ticker started at the
  *    group's first arrival; the barrier's data time is the wall tick time;
  *  - points whose data time is older than the latest barrier are DROPPED
  *    (BatchPoint/Point guards, barrier.go:147-153/175-183);
  *  - the generator stops at `endWallUs` — the test-harness shutdown.
  *
  * Output: the surviving input rows plus barrier rows (`__barrier` true,
  * non-dim fields null, the time column carrying the barrier data time),
  * ordered per group by `__evt_us` (wall event order) — ready for
  * [[WindowFSM.windowByTime]]'s barrier-aware trigger path.
  *
  * Scale shape: identical to WindowFSM — repartition by dims, secondary
  * sort on arrival, one streaming pass per group with O(1) state; no
  * driver involvement.
  */
object Barrier {

  /** `barrier().idle(idle)`. `arrivalCol`: epoch-µs wall arrival. */
  def idle(
      df: DataFrame,
      timeCol: String,
      arrivalCol: String,
      dims: Seq[String],
      idleSeconds: Double,
      endWallUs: Long): DataFrame =
    simulate(df, timeCol, arrivalCol, dims, idleSeconds, endWallUs, periodic = false)

  /** `barrier().period(period)`. */
  def periodic(
      df: DataFrame,
      timeCol: String,
      arrivalCol: String,
      dims: Seq[String],
      periodSeconds: Double,
      endWallUs: Long): DataFrame =
    simulate(df, timeCol, arrivalCol, dims, periodSeconds, endWallUs, periodic = true)

  private def simulate(
      df: DataFrame,
      timeCol: String,
      arrivalCol: String,
      dims: Seq[String],
      everySeconds: Double,
      endWallUs: Long,
      periodic: Boolean): DataFrame = {
    require(everySeconds > 0, "barrier needs a positive idle/period")
    val everyUs = math.round(everySeconds * 1000000L)

    // arrival must already be an epoch-µs integer — a timestamp or string
    // would cast to the wrong unit silently, so refuse it loudly
    df.schema(arrivalCol).dataType match {
      case LongType | IntegerType => ()
      case t => throw new IllegalArgumentException(
        s"arrivalCol $arrivalCol must be an epoch-µs integer column, got $t")
    }
    // normalized to long so barrier rows can write the fire time into the
    // same slot whatever the caller's integer width was
    val staged = df
      .withColumn(arrivalCol, col(arrivalCol).cast("long"))
      .withColumn("__us", unix_micros(col(timeCol)))
    val part =
      if (dims.isEmpty) staged.repartition(lit(0)) else staged.repartition(dims.map(col): _*)
    val sorted = part.sortWithinPartitions(
      (dims.map(col) :+ col(arrivalCol)) :+ col("__us"): _*)

    val inSchema = sorted.schema
    // barrier rows null out the non-dim data fields
    val outSchema = StructType(inSchema.map(_.copy(nullable = true)))
      .add("__evt_us", LongType).add("__barrier", BooleanType)
    val usIdx = inSchema.fieldIndex("__us")
    val arrIdx = inSchema.fieldIndex(arrivalCol)
    val timeIdx = inSchema.fieldIndex(timeCol)
    val dimIdx = dims.map(inSchema.fieldIndex)
    val width = inSchema.length

    def tsOf(us: Long): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

    /** A barrier row: dims from the template, data time = btUs, rest null. */
    def barrierRow(template: Row, btUs: Long, evtUs: Long): Row = {
      val vals = new Array[Any](width + 2)
      dimIdx.foreach(i => vals(i) = template.get(i))
      vals(timeIdx) = tsOf(btUs)
      vals(usIdx) = btUs
      vals(arrIdx) = evtUs // the wall time the timer fired
      vals(width) = evtUs
      vals(width + 1) = true
      Row.fromSeq(vals.toIndexedSeq)
    }

    val out = sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var curKey: Seq[Any] = null
        private var template: Row = null
        private var lastPoint = 0L   // idle: data-time tracker (lastPointT)
        private var lastBarrier = Long.MinValue
        private var deadline = 0L    // wall time of the next timer expiry
        private val pending = mutable.Queue.empty[Row]

        /** Barriers due at wall time ≤ `upTo` under the current state. */
        private def fire(upTo: Long): Unit =
          while (deadline <= upTo) {
            val bt = if (periodic) deadline else lastPoint + everyUs
            if (!periodic) lastPoint = bt
            lastBarrier = bt
            pending.enqueue(barrierRow(template, bt, deadline))
            deadline += everyUs
          }

        private def flushGroupTail(): Unit = if (template != null) fire(endWallUs)

        private def advance(): Unit =
          while (pending.isEmpty && it.hasNext) {
            val row = it.next()
            val key = dimIdx.map(row.get)
            val a = row.getLong(arrIdx) // cast to long µs in `staged`
            val t = row.getLong(usIdx)
            if (key != curKey) {
              flushGroupTail() // emit the previous group's trailing barriers
              curKey = key
              template = row
              lastPoint = t
              lastBarrier = Long.MinValue
              deadline = a + everyUs
              pending.enqueue(Row.fromSeq(row.toSeq ++ Seq(a, false)))
            } else {
              fire(a) // timers that expired before this arrival
              if (t >= lastBarrier) {
                pending.enqueue(Row.fromSeq(row.toSeq ++ Seq(a, false)))
                lastPoint = t
                if (!periodic) deadline = a + everyUs // point resets the idle timer
              } // else: dropped — older than the last barrier
            }
          }

        override def hasNext: Boolean = {
          advance()
          if (pending.isEmpty && !it.hasNext) flushGroupTail()
          pending.nonEmpty
        }
        override def next(): Row = { hasNext; pending.dequeue() }
      }
    }(Encoders.row(outSchema))
    out.drop("__us")
  }
}
