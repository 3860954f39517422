package graft.tick

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** The reference's `services/load` DIRECTORY TREE as data
  * (services/load/service.go:232-530): a kapacitor.conf `[load] dir`
  * points at `tasks/`, `templates/` and `handlers/` subdirectories that
  * the daemon bulk-defines at startup. Here the same tree populates a
  * [[TaskRegistry]] in one call — config as data, no daemon — so a
  * migrating user's load directory works unchanged:
  *
  *  - `templates/` `.tick` files — templates, id = filename stem;
  *  - `tasks/` `.tick` files — tasks, id = stem, enabled semantics are
  *    the caller's `registry.enable` (the reference enables on load);
  *  - `tasks/` `.yaml`/`.yml`/`.json` files — template-INSTANCE tasks:
  *    the client.TaskVars shape (template-id, dbrps, typed vars);
  *  - `handlers/` `.yaml`/`.yml`/`.json` files — topic handler specs
  *    (client.TopicHandlerOptions: topic/id/kind/match/options),
  *    returned as rows for the alert-topics fan-out to bind.
  *
  * Load order matches the reference's load(): templates, then .tick
  * tasks, then template-instance vars files, then handlers — so a vars
  * file can always see its template. Create-or-update: an existing
  * task/template is replaced IN PLACE — status and created-timestamp
  * preserved, and a failed validation leaves the old definition intact
  * (the reference's UpdateTask branch).
  *
  * Typed vars decode through the REAL script grammar: a duration value
  * `"1m"` or a lambda source `"\"mean\" < 30.0"` is parsed exactly as
  * the same text inside a script would be, so a duration binds as a
  * duration (UDF DURATION options, window periods) and a lambda as an
  * expression tree.
  */
object LoadDir {

  /** client.TopicHandlerOptions (client.go:2321-2327). Option values are
    * stringified scalars (containers stringify whole — the handler
    * binders take strings). */
  case class HandlerSpec(topic: String, id: String, kind: String,
      matchExpr: String, options: Map[String, String])

  case class Loaded(taskIds: Seq[String], templateIds: Seq[String],
      handlers: Seq[HandlerSpec])

  private lazy val yamlMapper = new ObjectMapper(new YAMLFactory())
  private lazy val jsonMapper = new ObjectMapper()

  private def stem(p: java.nio.file.Path): String = {
    val n = p.getFileName.toString
    val i = n.lastIndexOf('.')
    if (i < 0) n else n.substring(0, i)
  }

  private def files(dir: java.nio.file.Path, exts: Seq[String]): Seq[java.nio.file.Path] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        exts.exists(e => p.getFileName.toString.endsWith(e)))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  private def readText(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  private def readTree(p: java.nio.file.Path): JsonNode =
    if (p.getFileName.toString.endsWith(".json")) jsonMapper.readTree(readText(p))
    else yamlMapper.readTree(readText(p))

  /** Route a textual value through the real script grammar: the parsed
    * `var __v = <src>` default is exactly what the same text means
    * inside a script (durations → [[TickScript.Dur]], lambdas → Expr). */
  private def parseScriptValue(src: String): Any =
    TickScript.parse(s"var __v = $src\n").defaults("__v")

  /** One client.Var `{"type": t, "value": v}` (client.go Vars — the
    * typed template-var wire shape). */
  private[tick] def decodeVar(node: JsonNode): Any = {
    val tpeNode = node.get("type")
    require(tpeNode != null, s"var entry missing 'type': $node")
    val tpe = tpeNode.asText
    val v = node.get("value")
    require(v != null, s"var entry missing 'value': $node")
    tpe match {
      case "string" | "regex" => v.asText
      case "int"              => v.asLong
      case "float"            => v.asDouble
      case "bool"             => v.asBoolean
      case "star"             => "*"
      case "duration" =>
        // the client marshals durations as strings ("1m"); an int64 is
        // the raw nanosecond form. The nanos→Double-seconds conversion
        // follows the repo-wide Double-seconds convention and loses
        // sub-nanosecond fidelity for durations ≥ ~2^53 ns (~104 days);
        // exact nanos aren't load-bearing anywhere downstream.
        if (v.isNumber) TickScript.Dur(v.asLong / 1e9)
        else parseScriptValue(v.asText)
      case "lambda" => parseScriptValue("lambda: " + v.asText)
      case "list" =>
        (0 until v.size).map(i => decodeVar(v.get(i)))
      case other => throw new IllegalArgumentException(
        s"unsupported var type '$other' (client.go VarType)")
    }
  }

  def load(dir: String, registry: TaskRegistry): Loaded = {
    val base = java.nio.file.Paths.get(dir)
    require(java.nio.file.Files.isDirectory(base), s"no load directory at $dir")
    val templateIds = files(base.resolve("templates"), Seq(".tick")).map { p =>
      val id = stem(p)
      val script = readText(p)
      if (registry.getTemplate(id).isDefined) registry.redefineTemplate(id, script)
      else registry.defineTemplate(id, script)
      id
    }
    val tickTasks = files(base.resolve("tasks"), Seq(".tick")).map { p =>
      val id = stem(p)
      val script = readText(p)
      if (registry.get(id).isDefined) registry.redefine(id, script)
      else registry.define(id, script)
      id
    }
    val varTasks = files(base.resolve("tasks"), Seq(".yaml", ".yml", ".json")).map { p =>
      val id = stem(p)
      val tree = readTree(p)
      val tplId = Option(tree.get("template-id")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(s"$p: template task needs template-id"))
      val dbrps = Option(tree.get("dbrps")).map(d =>
        (0 until d.size).map(i =>
          (d.get(i).get("db").asText, d.get(i).get("rp").asText))).getOrElse(Nil)
      val vars = Option(tree.get("vars")).map { vs =>
        import scala.jdk.CollectionConverters._
        vs.fields().asScala.map(e => e.getKey -> decodeVar(e.getValue)).toMap
      }.getOrElse(Map.empty[String, Any])
      // create-or-update, status-preserving like the .tick branch (the
      // reference's UpdateTask path); a failed validation leaves the
      // previously loaded task intact
      if (registry.get(id).isDefined)
        registry.redefineFromTemplate(id, tplId, vars, dbrps.toSeq)
      else registry.defineFromTemplate(id, tplId, vars, dbrps.toSeq)
      id
    }
    val handlers = files(base.resolve("handlers"), Seq(".yaml", ".yml", ".json")).map { p =>
      val t = readTree(p)
      def str(k: String) = Option(t.get(k)).map(_.asText).getOrElse("")
      val opts = Option(t.get("options")).map { o =>
        import scala.jdk.CollectionConverters._
        o.fields().asScala.map(e =>
          e.getKey -> (if (e.getValue.isValueNode) e.getValue.asText
                       else e.getValue.toString)).toMap
      }.getOrElse(Map.empty[String, String])
      HandlerSpec(str("topic"), str("id"), str("kind"), str("match"), opts)
    }
    Loaded(tickTasks ++ varTasks, templateIds, handlers)
  }
}
