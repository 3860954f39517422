package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Exact batch rendering of the reference's time-window emission FSM
  * (reference window.go:80-238 windowByTime): per group, points arrive in
  * time order; when a point's time reaches `nextEmit`, the buffered points
  * in `[nextEmit - period, nextEmit)` are emitted as one batch stamped with
  * the emit time, then `nextEmit` advances to the trigger's time plus
  * `every` (truncated to a multiple of `every` when `align` is set —
  * window.go:172-224). `fillPeriod` delays the first emission until a full
  * period has elapsed (window.go:108-126). The trigger point itself is
  * inserted after the emission, so windows are left-aligned `[oldest, now)`.
  *
  * Spark shape: repartition by the group dims + sortWithinPartitions gives
  * each group as a contiguous time-sorted run inside a partition (secondary
  * sort); the FSM is then a streaming fold over the partition iterator whose
  * only state is the ring buffer of the trailing `period` — the same bound
  * as the reference's windowTimeBuffer (window.go:245-252), so memory stays
  * O(points-per-period) per group regardless of group size. No driver
  * involvement; scales with the number of groups across executors.
  *
  * Alignment note: `align` truncates relative to the Unix epoch; Go's
  * `Time.Truncate` uses year-1 zero time. The two agree for any `every`
  * that divides 86400s evenly (the year-1→epoch offset is a whole number
  * of days), which covers every reference test and realistic schedule.
  *
  * Deviation (documented): a trigger with an empty buffer emits an empty
  * batch in the reference (window.go:188-224); rows can't represent an
  * empty batch, so empty windows surface via Fill/Deadman instead.
  */
object WindowFSM {

  /** Append `as` (emit time, epoch µs) to every row of every emitted batch.
    * Rows may repeat across batches when period > every (overlap), exactly
    * like the reference's buffered windows. */
  def windowByTime(
      df: DataFrame,
      timeCol: String,
      dims: Seq[String],
      periodSeconds: Long,
      everySeconds: Long,
      align: Boolean = false,
      fillPeriod: Boolean = false,
      idCol: Option[String] = None,
      as: String = "wemit_us",
      barrierCol: Option[String] = None,
      orderCol: Option[String] = None): DataFrame = {
    require(everySeconds > 0, "every=0 is the per-point window (Pipe.windowPerPoint)")
    val periodUs = periodSeconds * 1000000L
    val everyUs = everySeconds * 1000000L

    val staged = df.withColumn("__us", unix_micros(col(timeCol)))
    val part = if (dims.isEmpty) staged.repartition(lit(0)) else staged.repartition(dims.map(col): _*)
    // barrier inputs (Barrier.idle/periodic output) order by wall event
    // time — a replayed point's data time can lag the barrier clock
    val sortCols = dims.map(col) ++ orderCol.map(col).toSeq ++ Seq(col("__us")) ++ idCol.map(col)
    val sorted = part.sortWithinPartitions(sortCols: _*)

    val inSchema = sorted.schema
    val outSchema = inSchema.add(as, LongType)
    val usIdx = inSchema.fieldIndex("__us")
    val dimIdx = dims.map(inSchema.fieldIndex)
    val barIdx = barrierCol.map(inSchema.fieldIndex)

    val out = sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var nextEmit = 0L
      val buf = mutable.ArrayDeque.empty[Row]
      it.flatMap { row =>
        val key = dimIdx.map(row.get)
        val tUs = row.getLong(usIdx)
        val isBarrier = barIdx.exists(row.getBoolean)
        if (key != curKey) { // new group: reset FSM (edge/grouped.go lazy state)
          curKey = key
          buf.clear()
          nextEmit =
            if (fillPeriod) {
              // window.go:108-120 — align pushes to the first multiple of
              // `every` strictly after t0+period
              if (align) (tUs + periodUs) / everyUs * everyUs + everyUs
              else tUs + periodUs
            } else {
              if (align) (tUs + everyUs) / everyUs * everyUs
              else tUs + everyUs
            }
        }
        val emitted =
          if (tUs >= nextEmit) {
            val oldest = nextEmit - periodUs // left-aligned [oldest, nextEmit)
            while (buf.nonEmpty && buf.head.getLong(usIdx) < oldest) buf.removeHead()
            val batch = buf.iterator.map(r => Row.fromSeq(r.toSeq :+ nextEmit)).toVector
            nextEmit = if (align) (tUs + everyUs) / everyUs * everyUs else tUs + everyUs
            batch
          } else Vector.empty
        // insert after emit (window.go:197-227); a barrier only triggers —
        // it never joins the buffer (window.go Barrier path :149-181)
        if (!isBarrier) buf.append(row)
        emitted
      }
    }(Encoders.row(outSchema))
    out.drop("__us")
  }
}
