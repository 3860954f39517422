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
    * operator holds per-group state (buffers, FSMs, per-group lambdas). */
  case class Stage(node: String, df: DataFrame, dims: Seq[String], stateful: Boolean)

  /** Node names that keep per-group state in the reference's executor —
    * their stats report the group map's size as working_cardinality. */
  val statefulNodes: Set[String] = Set(
    "window", "where", "sample", "derivative", "difference", "elapsed",
    "movingAverage", "cumulativeSum", "changeDetect", "stateDuration",
    "stateCount", "flatten", "combine", "join", "barrier", "holtWinters",
    "sigma", "alert", "eval", "groupBy")

  /** Per-node stats for a compiled chain, in chain order. Counts run here
    * (bounded: one job per stage); the result is a small local frame. */
  def stats(spark: SparkSession, stages: Seq[Stage]): DataFrame = {
    import spark.implicits._
    val counts = stages.map(_.df.count())
    stages.zipWithIndex.map { case (s, i) =>
      val collected = if (i == 0) counts(0) else counts(i - 1)
      val emitted = if (i == stages.length - 1) 0L else counts(i)
      val card =
        if (!s.stateful || s.dims.isEmpty) 0L
        else {
          val in = if (i == 0) s.df else stages(i - 1).df
          in.select(s.dims.map(org.apache.spark.sql.functions.col): _*).distinct().count()
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
