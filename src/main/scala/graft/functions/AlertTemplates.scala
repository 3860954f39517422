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
  private val indexRe = """\{\{\s*index\s+\.(Tags|Fields)\s+"([^"]+)"\s*\}\}""".r

  /** Compile a template into a Column. `scope` maps simple variable names
    * (ID, Name, Level, …) to columns; `tags`/`fields` map columns provide
    * `index .Tags/.Fields "k"` lookups. Unknown variables render empty. */
  def compile(
      template: String,
      scope: Map[String, Column],
      tags: Option[Column] = None,
      fields: Option[Column] = None): Column = {
    // Tokenize: find all template actions, keep literals between them.
    val actions = (varRe.findAllMatchIn(template).map(m => (m.start, m.end, Left(m.group(1)))) ++
      indexRe.findAllMatchIn(template).map(m => (m.start, m.end, Right((m.group(1), m.group(2))))))
      .toSeq.sortBy(_._1)
    val parts = Seq.newBuilder[Column]
    var pos = 0
    actions.foreach { case (s, e, action) =>
      if (s > pos) parts += lit(template.substring(pos, s))
      action match {
        case Left(name) =>
          parts += scope.get(name).map(_.cast("string")).getOrElse(lit(""))
        case Right(("Tags", k)) =>
          parts += tags.map(t => coalesce(t.getItem(k).cast("string"), lit(""))).getOrElse(lit(""))
        case Right(("Fields", k)) =>
          parts += fields.map(f => coalesce(f.getItem(k).cast("string"), lit(""))).getOrElse(lit(""))
        case Right(_) => parts += lit("")
      }
      pos = e
    }
    if (pos < template.length) parts += lit(template.substring(pos))
    val ps = parts.result()
    if (ps.isEmpty) lit("") else concat(ps: _*)
  }
}
