package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Prometheus scrape ingestion, data-plane half (reference
  * services/scraper/service.go:184-240): parse exposition-format text into
  * samples and apply the reference's sample→point transform — measurement
  * from `__name__`, db/rp/job decoded from the pipe-encoded `job` label
  * (config.go:121-134), remaining labels as tags, one `value` field, ms
  * timestamps, NaN samples and blacklisted instances dropped
  * (service.go:193-224). The scrape-loop daemon and target discovery (the
  * Prometheus scrape manager the reference embeds) are the declared
  * non-goal; any fetcher that lands exposition text on storage/Kafka feeds
  * this distributed parser.
  *
  * Exposition text syntax (public Prometheus format):
  *   metric_name[{label="value",...}] value [timestamp-ms]
  * with `\\`, `\"`, `\n` escapes in label values, `+Inf`/`-Inf`/`NaN`
  * specials, and `#` comment/HELP/TYPE lines ignored.
  */
object PrometheusScrape {

  case class PromSample(
      metric: String,
      labels: Map[String, String],
      value: Double,
      timeMs: Option[Long])

  /** Parse one exposition line; None for blanks/comments/malformed. */
  def parseLine(line: String): Option[PromSample] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    var i = 0
    val n = t.length
    def isNameChar(c: Char, first: Boolean): Boolean =
      c.isLetter || c == '_' || c == ':' || (!first && c.isDigit)
    if (!isNameChar(t.charAt(0), first = true)) return None
    while (i < n && isNameChar(t.charAt(i), first = false)) i += 1
    val metric = t.substring(0, i)
    var labels = Map.empty[String, String]
    if (i < n && t.charAt(i) == '{') {
      i += 1
      while (i < n && t.charAt(i) != '}') {
        while (i < n && (t.charAt(i) == ',' || t.charAt(i) == ' ')) i += 1
        if (i < n && t.charAt(i) == '}') {} // trailing comma
        else {
          val ks = i
          while (i < n && t.charAt(i) != '=') i += 1
          if (i >= n) return None
          val key = t.substring(ks, i).trim
          i += 1 // '='
          if (i >= n || t.charAt(i) != '"') return None
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            t.charAt(i) match {
              case '\\' if i + 1 < n =>
                t.charAt(i + 1) match {
                  case 'n'   => sb.append('\n')
                  case '"'  => sb.append('"')
                  case '\\' => sb.append('\\')
                  case c     => sb.append('\\').append(c)
                }
                i += 2
              case '"' => closed = true; i += 1
              case c   => sb.append(c); i += 1
            }
          }
          if (!closed) return None
          labels += key -> sb.result()
        }
      }
      if (i >= n) return None
      i += 1 // '}'
    }
    val rest = t.substring(i).trim.split("\\s+").filter(_.nonEmpty)
    if (rest.isEmpty) return None
    val value = rest(0) match {
      case "+Inf" | "Inf" => Double.PositiveInfinity
      case "-Inf"         => Double.NegativeInfinity
      case "NaN"          => Double.NaN
      case v              => v.toDoubleOption.getOrElse(return None)
    }
    val ts = if (rest.length >= 2) rest(1).toLongOption else None
    Some(PromSample(metric, labels, value, ts))
  }

  /** Distributed parse: exposition lines → samples (partition-local). */
  def parse(lines: Dataset[String]): Dataset[PromSample] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseLine(_))
  }

  /** The reference's Append transform (service.go:190-240) as one
    * declarative projection: drop NaN; split the `job` label `db|rp|name`
    * (rows with a malformed job are dropped like the reference errors
    * them); drop blacklisted (job, instance) pairs; measurement =
    * `__name__`; tags are ALL labels minus `job` — including `__name__`
    * itself, which the reference leaves in the point's tag set
    * (service.go:202-211 strips only `job` before using
    * `tags[model.MetricNameLabel]` as the name); field `value`; event
    * time from the ms timestamp (`defaultTimeMs` when absent). */
  def toPointFrame(
      samples: Dataset[PromSample],
      defaultTimeMs: Long = 0L,
      blacklist: Map[String, Set[String]] = Map.empty): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val bl = blacklist // serializable capture
    samples
      .filter(s => !s.value.isNaN)
      .flatMap { s =>
        // db/rp/job decode only applies when a `job` label is PRESENT; a
        // sample without one is still written with empty db/rp/job
        // (service.go:198-211 initializes all three to "" and only
        // decodeJobName's error path rejects). A present-but-malformed
        // job (not exactly db|rp|name) is dropped like the reference
        // errors it.
        val decoded: Option[(String, String, String)] =
          s.labels.get("job") match {
            case None => Some(("", "", ""))
            case Some(enc) => enc.split("\\|", -1) match {
              case Array(db, rp, job) => Some((db, rp, job))
              case _                  => None
            }
          }
        decoded.flatMap { case (db, rp, job) =>
          val instance = s.labels.getOrElse("instance", "")
          if (bl.getOrElse(job, Set.empty).contains(instance)) None
          else {
            // the scrape library carries the metric name as the
            // __name__ label; the exposition text carries it outside
            // the braces — normalize to the label form first
            val tags = (s.labels + ("__name__" ->
              s.labels.getOrElse("__name__", s.metric))) - "job"
            Some((tags("__name__"), db, rp, job, tags, s.value,
              s.timeMs.getOrElse(defaultTimeMs)))
          }
        }
      }
      .toDF("measurement", "db", "rp", "job", "tags", "value", "time_ms")
      .withColumn("time", timestamp_millis(col("time_ms")))
  }
}
