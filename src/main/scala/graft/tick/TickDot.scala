package graft.tick

import scala.collection.mutable.ArrayBuffer

/** The graphviz DOT view of a task pipeline — the `dot` field of
  * `kapacitor show` (reference pipeline/pipeline.go:203-216 `Dot`,
  * pipeline/node.go:196-200 per-node edges, task.go:374-411 `EDot` for
  * executing tasks, node.go:256-327 stat attributes).
  *
  * Laws matched (pinned against server_test.go's expected dot strings):
  *  - node names are `desc` + creation-order id (`stream0`, `from1` —
  *    pipeline.go:137 assignID at link time, node.go:126-131 Name);
  *  - a disabled task renders edges only: `parent -> child;` per child
  *    in link order, nodes visited in the pipeline's topological walk
  *    (DFS from sources in reverse creation order, post-order,
  *    reversed — pipeline.go:172-199);
  *  - the batch source node is invisible: BatchNode overrides both
  *    `dot` and `edot` to nothing (pipeline/batch.go:109, batch.go:159),
  *    so a batch task's graph starts at `query1`;
  *  - an executing task adds a `graph [throughput="0.00 points/s"];`
  *    attribute line (`batches/s` for batch tasks), per-node stat
  *    attributes sorted by key, and `processed` edge weights; with
  *    `labels=true` the stats render as `xlabel` and the throughput as
  *    a graph `label` (node.go:256-327);
  *  - `|stats(d)` and the `deadman` macro add the stats node as a NEW
  *    SOURCE (not a child — its points are meta-observations), plus a
  *    `noop` child on the observed node if it had none, so the observed
  *    node has somewhere to send data (pipeline/node.go:205-216);
  *    `deadman(t, d)` expands to stats|derivative|alert
  *    (pipeline/node.go:239-255).
  */
object TickDot {

  /** The reference's initial stat attributes for a just-started node
    * (kapacitor.node initial expvars, sorted by key). */
  val zeroStats: Seq[(String, String)] = Seq(
    "avg_exec_time_ns" -> "0s", "errors" -> "0", "working_cardinality" -> "0")

  private final class G(val id: Int, val desc: String, val hidden: Boolean) {
    val children = new ArrayBuffer[G]
    def name: String = s"$desc$id"
  }

  /** pipeline node desc strings that differ from the script method name. */
  private[tick] val descOverride = Map(
    "groupBy" -> "groupby", "httpOut" -> "http_out", "httpPost" -> "http_post",
    "influxDBOut" -> "influxdb_out", "kapacitorLoopback" -> "kapacitor_loopback",
    "stateDuration" -> "state_duration", "stateCount" -> "state_count",
    "k8sAutoscale" -> "k8s_autoscale", "swarmAutoscale" -> "swarm_autoscale",
    "ec2Autoscale" -> "ec2_autoscale")

  private final class Dag {
    var nextId = 0
    val sources = new ArrayBuffer[G]
    val all = new ArrayBuffer[G]
    def newNode(desc: String, hidden: Boolean = false): G = {
      val g = new G(nextId, desc, hidden); nextId += 1; all += g; g
    }
    def addSource(desc: String, hidden: Boolean = false): G = {
      val g = newNode(desc, hidden); sources += g; g
    }
    /** pipeline.go sort(): DFS from sources in reverse order,
      * post-order append, whole list reversed. */
    def topo: Seq[G] = {
      val done = new java.util.IdentityHashMap[G, G]
      val out = new ArrayBuffer[G]
      def visit(n: G): Unit = if (!done.containsKey(n)) {
        done.put(n, n)
        n.children.foreach(visit)
        out += n
      }
      sources.reverseIterator.foreach(visit)
      out.reverse.toSeq
    }
  }

  private def build(script: TickScript.Script): Dag = {
    val dag = new Dag
    val roots = script.chains.map(_.root).filter(r => r == "stream" || r == "batch").distinct
    require(roots.size == 1,
      s"task must be a single type, script has roots ${roots.mkString(", ")}")
    val isBatch = roots.head == "batch"
    val vars = scala.collection.mutable.Map.empty[String, G]

    // every textual `stream`/`batch` root is a fresh source node
    // (pipeline/tick/join_test.go's two-stream want implies distinct ids)
    def resolve(name: String): G = name match {
      case "stream" | "batch" => dag.addSource(name, hidden = isBatch)
      case other => vars.getOrElse(other,
        throw new IllegalArgumentException(s"chain from unknown var $other"))
    }

    // Stats() semantics: the stats node is a new source observing `cur`;
    // if `cur` has no children yet it gets a noop child.
    def statsOn(cur: G): G = {
      val st = dag.addSource("stats")
      if (cur.children.isEmpty) cur.children += dag.newNode("noop")
      st
    }

    for (ch <- script.chains) {
      var cur = resolve(ch.root)
      for (nd <- ch.nodes) nd.name match {
        case "stats" => cur = statsOn(cur)
        case "deadman" =>
          val st = statsOn(cur)
          val d = dag.newNode("derivative"); st.children += d
          val a = dag.newNode("alert"); d.children += a
          cur = a
        case "join" | "union" =>
          val parents = cur +: nd.args.collect {
            case TickScript.Ident(n) if vars.contains(n) => resolve(n)
            case a if vars.contains(a.toString) => resolve(a.toString) }
          val g = dag.newNode(nd.name)
          parents.foreach(_.children += g)
          cur = g
        case u if u.startsWith("@") =>
          val g = dag.newNode(u.substring(1)); cur.children += g; cur = g
        case other =>
          val g = dag.newNode(descOverride.getOrElse(other, other))
          cur.children += g
          cur = g
      }
      ch.varName.foreach(v => vars(v) = cur)
    }
    dag
  }

  /** The disabled-task view (Pipeline.Dot): edges only. */
  def dot(tickscript: String, name: String): String = {
    val dag = build(TickScript.parse(tickscript))
    val sb = new StringBuilder
    sb ++= "digraph "; sb ++= name; sb ++= " {\n"
    for (n <- dag.topo if !n.hidden; c <- n.children) {
      sb ++= n.name; sb ++= " -> "; sb ++= c.name; sb ++= ";\n"
    }
    sb ++= "}"
    sb.toString
  }

  /** The executing-task view (ExecutingTask.EDot): graph throughput
    * attribute, per-node stat attributes (sorted by key), `processed`
    * edge weights. `stats` supplies a node's attributes by node name
    * (default: the reference's initial zeros); `processed` supplies an
    * edge's collected count. `labels=true` renders the human view
    * (xlabel/label) instead of plain attributes. */
  def edot(tickscript: String, name: String, labels: Boolean = false,
      throughput: Double = 0.0,
      stats: String => Seq[(String, String)] = _ => zeroStats,
      processed: (String, String) => Long = (_, _) => 0L): String = {
    val script = TickScript.parse(tickscript)
    val dag = build(script)
    val isBatch = script.chains.exists(_.root == "batch")
    val unit = if (isBatch) "batches" else "points"
    val sb = new StringBuilder
    sb ++= "digraph "; sb ++= name; sb ++= " {\n"
    sb ++= "graph ["
    if (labels)
      sb ++= f"""label="Throughput: $throughput%.2f $unit/s" forcelabels=true pad="0.8,0.5""""
    else
      sb ++= f"""throughput="$throughput%.2f $unit/s""""
    sb ++= "];\n"
    for (n <- dag.topo if !n.hidden) {
      val kvs = stats(n.name).sortBy(_._1)
      if (labels) {
        sb ++= "\n"; sb ++= n.name; sb ++= " [xlabel=\""
        sb ++= kvs.map { case (k, v) => s"$k=$v" }.mkString("\\r")
        sb ++= "\"];\n"
        for (c <- n.children) {
          sb ++= n.name; sb ++= " -> "; sb ++= c.name
          sb ++= s""" [label="processed=${processed(n.name, c.name)}"];\n"""
        }
      } else {
        sb ++= "\n"; sb ++= n.name; sb ++= " ["
        kvs.foreach { case (k, v) => sb ++= s"""$k="$v" """ }
        sb ++= "];\n"
        for (c <- n.children) {
          sb ++= n.name; sb ++= " -> "; sb ++= c.name
          sb ++= s""" [processed="${processed(n.name, c.name)}"];\n"""
        }
      }
    }
    sb ++= "}"
    sb.toString
  }
}
