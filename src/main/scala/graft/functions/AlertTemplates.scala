package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Alert id/message templating (reference alert.go:106-120, 1349-1422;
  * pipeline/alert.go:155-248): Go text/template strings over the event
  * scope — `{{ .ID }}`, `{{ .Name }}`, `{{ .Group }}`, `{{ .Level }}`,
  * `{{ .TaskName }}`, `{{ .Time }}`, `{{ .Duration }}`, and
  * `{{ index .Tags "k" }}` / `{{ index .Fields "k" }}` — compiled here
  * into a single Catalyst `concat` so rendering stays inside codegen
  * (no per-row template interpretation, unlike the reference).
  */
object AlertTemplates {

  private val varRe = """\{\{\s*\.(\w+)\s*\}\}""".r
  private val indexRe = """\{\{\s*index\s+\.(Tags|Fields)\s+"([^"]+)"(?:\s*\|\s*printf\s+"([^"]+)")?\s*\}\}""".r
  private val ifEqRe =
    """(?s)\{\{\s*if eq \.(\w+) "([^"]*)"\s*\}\}(.*?)(?:\{\{\s*else\s*\}\}(.*?))?\{\{\s*end\s*\}\}""".r

  /** Go fmt verbs → java.util.Formatter: Go allows a zero flag without a
    * width (`%0.3f`), Java does not; `%v` is `%s` here. */
  private def goFmt(f: String): String =
    f.replace("%0.", "%.").replace("%v", "%s")

  /** Compile a template into a Column. `scope` maps simple variable names
    * (ID, Name, Level, …) to columns; `tags`/`fields` map columns provide
    * `index .Tags/.Fields "k"` lookups (with an optional `| printf "%f"`
    * pipeline); `{{ if eq .Var "lit" }}…{{ else }}…{{ end }}` compiles to
    * a `when` over recursively-compiled branches (the deadman default
    * message shape, pipeline/node.go:251). Unknown variables render
    * empty. */
  def compile(
      template: String,
      scope: Map[String, Column],
      tags: Option[Column] = None,
      fields: Option[Column] = None): Column = {
    // if-blocks first: recurse into the surrounding text and branches
    ifEqRe.findFirstMatchIn(template) match {
      case Some(m) =>
        val cond = scope.get(m.group(1)).map(_.cast("string") === lit(m.group(2)))
          .getOrElse(lit(m.group(2)) === lit(""))
        val thenC = compile(m.group(3), scope, tags, fields)
        val elseC = Option(m.group(4))
          .map(compile(_, scope, tags, fields)).getOrElse(lit(""))
        return concat(
          compile(template.substring(0, m.start), scope, tags, fields),
          when(cond, thenC).otherwise(elseC),
          compile(template.substring(m.end), scope, tags, fields))
      case None => ()
    }
    // Tokenize: find all template actions, keep literals between them.
    val actions = (varRe.findAllMatchIn(template).map(m => (m.start, m.end, Left(m.group(1)))) ++
      indexRe.findAllMatchIn(template).map(m =>
        (m.start, m.end, Right((m.group(1), m.group(2), Option(m.group(3)))))))
      .toSeq.sortBy(_._1)
    val parts = Seq.newBuilder[Column]
    var pos = 0
    actions.foreach { case (s, e, action) =>
      if (s > pos) parts += lit(template.substring(pos, s))
      action match {
        case Left(name) =>
          parts += scope.get(name).map(_.cast("string")).getOrElse(lit(""))
        case Right((kind, k, fmt)) =>
          val src = if (kind == "Tags") tags else fields
          // null-check BEFORE formatting: java.util.Formatter renders a
          // null arg as the string "null" (precision applies — "%.3f" of
          // null is "nul"), which would defeat the empty-render contract
          val render = (c: Column) => fmt match {
            case Some(f) => when(c.isNull, lit("")).otherwise(format_string(goFmt(f), c))
            case None => c.cast("string")
          }
          parts += src.map(m => coalesce(render(m.getItem(k)), lit("")))
            .getOrElse(lit(""))
      }
      pos = e
    }
    if (pos < template.length) parts += lit(template.substring(pos))
    val ps = parts.result()
    if (ps.isEmpty) lit("") else concat(ps: _*)
  }
}
