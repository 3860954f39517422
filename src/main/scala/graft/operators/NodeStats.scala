package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Node-stats introspection (reference stats.go:23-121 + node.go:377-401 —
  * the surface the `*Cardinality` integration tests assert): per-node
  * `collected` / `emitted` / `working_cardinality` as a queryable frame.
  *
  * Batch rendering: a compiled chain's per-node frames are known, so
  *  - `collected` — rows entering the node (= the previous node's output);
  *  - `emitted` — rows the node's downstream edge collects; a TERMINAL
  *    node reports 0, exactly like the reference, whose per-node "emitted"
  *    is the collected count of its output edge (node.go:384-386) and a
  *    terminal node has no output edge;
  *  - `working_cardinality` — groups the node holds state for: distinct
  *    dims of the input for a STATEFUL node, 0 for a stateless one (the
  *    reference reads the group map of the node's edge).
  *
  * This is a diagnostic tap: one count + one distinct-count per node,
  * driver-invoked on demand — never part of a query hot path. At scale
  * both actions are shuffle-light (partial counts; distinct over the dim
  * columns only).
  */
object NodeStats {

  /** One compiled node: its OUTPUT frame, its group dims, and whether the
    * operator holds per-group state (buffers, FSMs, per-group lambdas).
    *
    * `unitDf` — when the node's OUTPUT edge is a batch edge, the frame
    * whose ROW COUNT is the node's emission unit count (one row per emitted
    * batch; the reference counts batch-edge messages, not points —
    * edge/stats.go). `None` = point edge, count = `df.count`.
    *
    * `parents` — indices of this node's parent stages; `None` = the
    * previous stage (linear chain). A multi-parent node (join) collects
    * the SUM of its parents' emissions, and a multi-consumer node emits
    * once per child edge (task_master fan-out). */
  case class Stage(node: String, df: DataFrame, dims: Seq[String], stateful: Boolean,
      unitDf: Option[DataFrame] = None, parents: Option[Seq[Int]] = None)

  /** Node names that keep per-group state in the reference's executor —
    * their stats report the group map's size as working_cardinality.
    * Includes the whole InfluxQL aggregate/selector family (each holds a
    * per-group reducer, influxql.go:141-165) and httpOut (last-result
    * cache per group, http_out.go:29-176). */
  val statefulNodes: Set[String] = Set(
    "window", "where", "sample", "derivative", "difference", "elapsed",
    "movingAverage", "cumulativeSum", "changeDetect", "stateDuration",
    "stateCount", "flatten", "combine", "join", "barrier", "holtWinters",
    "sigma", "alert", "eval", "groupBy",
    "count", "sum", "mean", "median", "mode", "spread", "stddev",
    "distinct", "first", "last", "min", "max", "percentile", "top",
    "bottom", "httpOut")

  /** Per-node stats for a compiled DAG, in stage order. Counts run here
    * (bounded: one job per stage); the result is a small local frame.
    *
    * Laws (node.go:377-401, verified against the `*Cardinality` suite):
    *  - `collected` — sum of the parent edges' unit counts (root: own);
    *  - `emitted` — own unit count × number of child edges (a node with
    *    two consumers emits each message twice — JoinCardinality's
    *    stream0 emits 180 of 90 collected); terminal → 0;
    *  - `working_cardinality` — a single-input stateful node holds one
    *    state per distinct value of ITS dims over its input; a
    *    multi-input join holds one per distinct group of EACH parent's
    *    dims (join.go group state per source) — summed. */
  def stats(spark: SparkSession, stages: Seq[Stage]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val counts = stages.map(s => s.unitDf.getOrElse(s.df).count())
    val parentsOf: Seq[Seq[Int]] = stages.zipWithIndex.map { case (s, i) =>
      s.parents.getOrElse(if (i == 0) Nil else Seq(i - 1))
    }
    val childCount = Array.fill(stages.length)(0)
    parentsOf.foreach(_.foreach(p => childCount(p) += 1))
    stages.zipWithIndex.map { case (s, i) =>
      val ps = parentsOf(i)
      val collected = if (ps.isEmpty) counts(i) else ps.map(counts).sum
      val emitted = counts(i) * childCount(i)
      val card =
        if (!s.stateful) 0L
        else if (ps.length > 1)
          ps.map { p =>
            val st = stages(p)
            if (st.dims.isEmpty) 1L
            else st.df.select(st.dims.map(col): _*).distinct().count()
          }.sum
        else {
          // a re-dimensioning node (groupBy) tracks its OUTPUT groups; a
          // dims-ERASING node (flatten merges its .on() dims away) still
          // holds state per INPUT group — so: own dims when set, else the
          // parent's. A grouped edge with no dims at all has the single
          // nil group (models/point.go:82 — GroupByCardinality's
          // ungrouped window reports 1).
          val inStage = ps.headOption.map(stages(_))
          val effDims = if (s.dims.nonEmpty) s.dims else inStage.map(_.dims).getOrElse(Nil)
          if (effDims.isEmpty) 1L
          else inStage.map(_.df).getOrElse(s.df)
            .select(effDims.map(col): _*).distinct().count()
        }
      (s.node, collected, emitted, card)
    }.toDF("node", "collected", "emitted", "working_cardinality")
  }

  /** Streaming bridge: accumulates the same fields from
    * StreamingQueryListener progress — `collected` from numInputRows,
    * `working_cardinality` from the state operators' current row count
    * (the state store IS the group map in Structured Streaming). Register
    * with `spark.streams.addListener`; render with [[StreamingStats.frame]]. */
  final class StreamingStats extends StreamingQueryListener {
    private val collected = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    private val stateRows = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      collected.merge(name, p.numInputRows, (a, b) => a + b)
      stateRows.put(name, p.stateOperators.map(_.numRowsTotal).sum)
    }
    def frame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      collected.keySet().asScala.toSeq.sorted.map { q =>
        (q, collected.getOrDefault(q, 0L), stateRows.getOrDefault(q, 0L))
      }.toDF("query", "collected", "working_cardinality")
    }
  }
}
