package graft.tick

import scala.collection.mutable

/** The server configuration file as DATA (reference `server/config.go`
  * + the shipped `etc/kapacitor/kapacitor.conf`): a TOML subset loader
  * covering exactly what the reference config uses — comments, top-level
  * keys, `[section]` tables, `[[section]]` array-of-tables (repeatable
  * service sections: influxdb, slack, kafka, mqtt, swarm, scraper, the
  * discovery families), one-level dotted sub-tables (`[influxdb
  * .subscriptions]` nests into the CURRENT array element, exactly like
  * Go toml decoding into the service struct), strings with `\"`/`\\`
  * escapes, booleans, integers, floats, and single-line arrays of
  * scalars.
  *
  * The result shape is [[ConfigOverride]]'s model — section name → list
  * of element option-maps — so file config, dynamic overrides, and
  * redaction compose: `load` the file, apply `ConfigOverride
  * .overrideConfig` records, render `redacted` views. Validated against
  * the reference's own shipped kapacitor.conf in ServerConfigSpec.
  */
object ServerConfig {

  /** Parsed config: section path → elements in file order. Top-level
    * keys land under the "" section's single element. A `[section]`
    * table is a one-element list; `[[section]]` accumulates. Sub-tables
    * nest into their parent element under the sub-key. */
  def parse(toml: String): Map[String, Vector[Map[String, Any]]] = {
    val sections = mutable.LinkedHashMap.empty[String, Vector[mutable.LinkedHashMap[String, Any]]]
    def newElem(): mutable.LinkedHashMap[String, Any] =
      mutable.LinkedHashMap.empty[String, Any]
    sections("") = Vector(newElem())
    // the map currently receiving keys, and the section ELEMENT it
    // belongs to (sub-tables always attach to the element, not to a
    // previous sub-table)
    var current: mutable.LinkedHashMap[String, Any] = sections("").head
    var element: mutable.LinkedHashMap[String, Any] = current
    var currentSection = ""

    toml.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          val name = line.substring(2, line.length - 2).trim
          val e = newElem()
          sections(name) = sections.getOrElse(name, Vector.empty) :+ e
          current = e; element = e; currentSection = name
        } else if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          val parent = name.takeWhile(_ != '.')
          if (name.contains('.') && sections.contains(parent) &&
              currentSection == parent) {
            // sub-table of the element being filled: nest under its key
            val sub = newElem()
            element.update(name.drop(parent.length + 1), sub)
            current = sub // keys now land in the sub-table
          } else {
            val e = newElem()
            sections(name) = sections.getOrElse(name, Vector.empty) :+ e
            current = e; element = e; currentSection = name
          }
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"config line ${ln + 1}: expected key = value: $raw")
          val key = line.take(eq).trim
          current.update(key, parseValue(line.drop(eq + 1).trim, ln + 1))
        }
      }
    }
    sections.map { case (k, es) => k -> es.map(_.toMap.map {
      case (n, m: mutable.LinkedHashMap[_, _]) =>
        n -> m.toMap.asInstanceOf[Map[String, Any]]
      case kv => kv
    }) }.toMap
  }

  /** Strip a `#` comment, respecting quoted strings. */
  private def stripComment(line: String): String = {
    var inStr = false; var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"' && (i == 0 || line.charAt(i - 1) != '\\')) inStr = !inStr
      else if (c == '#' && !inStr) return line.take(i)
      i += 1
    }
    line
  }

  private def parseValue(v: String, ln: Int): Any = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    case "true" => true
    case "false" => false
    case s if s.startsWith("[") && s.endsWith("]") =>
      val body = s.substring(1, s.length - 1).trim
      if (body.isEmpty) Vector.empty[Any]
      else splitTop(body).map(x => parseValue(x.trim, ln)).toVector
    case s if s.startsWith("{") && s.endsWith("}") =>
      // inline table: { k = v, k2 = v2 }
      val body = s.substring(1, s.length - 1).trim
      if (body.isEmpty) Map.empty[String, Any]
      else splitTop(body).map { kv =>
        val eq = kv.indexOf('=')
        require(eq > 0, s"config line $ln: expected key = value in inline table: $kv")
        kv.take(eq).trim -> parseValue(kv.drop(eq + 1).trim, ln)
      }.toMap
    case s =>
      s.toLongOption.getOrElse(s.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(
          s"config line $ln: unsupported value: $v")))
  }

  /** Split an array body on commas outside quotes. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var inStr = false
    s.foreach { c =>
      if (c == '"') { inStr = !inStr; cur += c }
      else if (c == ',' && !inStr) { out += cur.toString; cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().filter(_.trim.nonEmpty)
  }
}
