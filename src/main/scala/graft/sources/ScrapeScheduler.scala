package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The scrape LOOP as schedule-as-data — the in-engine half of the
  * reference's scraper service (services/scraper/service.go:246-320 +
  * config.go:16-71, which delegate to the embedded Prometheus scrape
  * manager): WHICH target to fetch WHEN becomes a DataFrame, and the HTTP
  * GET itself stays an injectable per-partition transport, the same seam
  * as the alert-handler runners and `AutoscaleStream.applyEvents`. This
  * shrinks the scraper non-goal to pure I/O: discovery is anything that
  * writes rows to the targets frame (file export, k8s API dump, service
  * registry), and a fetcher is one function.
  *
  * Semantics mirrored from the Prometheus model the reference embeds:
  *  - per-config `scrape-interval` (config.go:33, default 1m);
  *  - per-target PHASE STAGGER: each target's ticks are offset within the
  *    interval by a hash of its identity, exactly why Prometheus's scrape
  *    pool doesn't fire every target at t≡0 (mod interval) — at 10⁶
  *    targets the stagger is load-shaping, not cosmetics. The offset here
  *    is the repo-wide md5-derived h60 mod interval, deterministic and
  *    oracle-restatable;
  *  - scraped samples get the `job` label encoded `db|rp|name`
  *    (config.go:121-134 encodeJobName) and flow through the SAME
  *    [[PrometheusScrape.toPointFrame]] decode path as any other
  *    exposition payload — blacklist, NaN drop, missing-timestamp default
  *    (the scrape tick time, like the Prometheus scrape loop's wall time).
  *
  * Scale shape: the schedule is `sequence()` + `explode` — a generated
  * relation, no driver loop, no shuffle; a day of ticks for 10⁶ targets
  * is produced partition-locally and prunes by any pushed time filter.
  * Fetches run one partition at a time on executors
  * (`spark.sparkContext` never involved); a slow endpoint stalls its
  * task, not the schedule.
  */
object ScrapeScheduler {

  /** One scrape config × discovered target pair (the reference's
    * Pair(Scraper, Discoverer) flattened, service.go:399-431).
    * `intervalS` per config; db/rp route the points like `[scraper]`
    * TOML (config.go:16-44); `labels` are discovery target labels
    * attached to every scraped sample (sample labels win on conflict). */
  case class ScrapeTarget(
      job: String,
      url: String,
      db: String,
      rp: String,
      intervalS: Long,
      enabled: Boolean = true,
      labels: Map[String, String] = Map.empty)

  /** Discovery-as-data: load targets from the Prometheus `file_sd`
    * format (public spec: a JSON array of
    * `{"targets": ["host:port", ...], "labels": {...}}`) — the one
    * discovery mechanism that is already pure data at rest, so it maps
    * to a distributed read with no daemon. One [[ScrapeTarget]] per
    * (group, target) with `url = scheme://target metricsPath`. */
  def targetsFromFileSd(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      job: String,
      db: String,
      rp: String,
      intervalS: Long,
      scheme: String = "http",
      metricsPath: String = "/metrics"): Dataset[ScrapeTarget] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("targets", ArrayType(StringType)),
      StructField("labels", MapType(StringType, StringType))))
    spark.read.schema(schema).option("multiLine", "true").json(path)
      .select(explode(col("targets")).as("target"),
        coalesce(col("labels"), map().cast("map<string,string>")).as("labels"))
      .select(lit(job).as("job"),
        concat(lit(s"$scheme://"), col("target"), lit(metricsPath)).as("url"),
        lit(db).as("db"), lit(rp).as("rp"), lit(intervalS).as("intervalS"),
        lit(true).as("enabled"), col("labels"))
      .as[ScrapeTarget]
  }

  /** One `[[static-discovery]]` section of a reference config file
    * (services/static_discovery/config.go:12-20): a labeled group of
    * statically-listed targets, uniquely identified by `id`. */
  case class StaticDiscoveryConfig(
      id: String,
      enabled: Boolean = false,
      targets: Seq[String] = Nil,
      labels: Map[String, String] = Map.empty)

  /** Parse the `[[static-discovery]]` sections out of a reference TOML
    * config (the kapacitor.conf shape those sections live in). Subset
    * parser for exactly what that section uses — array-of-tables
    * headers, `enabled` bool, `id` string, `targets` string array, and
    * the `[static-discovery.labels]` sub-table — so an existing config
    * file is data, not a daemon: any other section header ends the
    * current static-discovery scope and is ignored. Inline `#` comments
    * are stripped (quote-aware, per the TOML rule); arrays must sit on
    * one line — the subset the reference's own config examples use. */
  def parseStaticDiscovery(toml: String): Seq[StaticDiscoveryConfig] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[StaticDiscoveryConfig]
    var cur: StaticDiscoveryConfig = null
    var inLabels = false
    def flush(): Unit = if (cur != null) { out += cur; cur = null }
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && t.head == '"' && t.last == '"')
        t.substring(1, t.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
      else t
    }
    // '#' outside a quoted string starts a comment (TOML); escapes
    // inside quotes are honored so `id = "a#b"` keeps its hash
    def stripComment(s: String): String = {
      var inStr = false
      var esc = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (esc) esc = false
        else if (inStr && c == '\\') esc = true
        else if (c == '"') inStr = !inStr
        else if (c == '#' && !inStr) return s.substring(0, i)
        i += 1
      }
      s
    }
    toml.linesIterator.foreach { raw =>
      val line = stripComment(raw).trim
      if (line.isEmpty || line.startsWith("#")) ()
      else if (line == "[[static-discovery]]") { flush(); cur = StaticDiscoveryConfig(""); inLabels = false }
      else if (line == "[static-discovery.labels]" && cur != null) inLabels = true
      else if (line.startsWith("[")) { flush(); inLabels = false } // any other section
      else if (cur != null && line.contains("=")) {
        val (k, vRaw) = line.splitAt(line.indexOf('='))
        val key = k.trim
        val v = vRaw.drop(1).trim
        if (inLabels) cur = cur.copy(labels = cur.labels + (key -> unquote(v)))
        else key match {
          case "enabled" =>
            // TOML booleans are exactly `true`/`false` — reject anything else
            require(v == "true" || v == "false",
              s"static-discovery: enabled must be true or false, got '$v'")
            cur = cur.copy(enabled = v == "true")
          case "id"      => cur = cur.copy(id = unquote(v))
          case "targets" =>
            val inner = v.stripPrefix("[").stripSuffix("]")
            val ts = inner.split(",").map(_.trim).filter(_.nonEmpty).map(unquote).toSeq
            cur = cur.copy(targets = ts)
          case _ => () // unknown keys tolerated, like TOML override layering
        }
      }
    }
    flush()
    out.toSeq
  }

  /** Discovery-as-data for static configs: each enabled section becomes
    * ScrapeTarget rows exactly like the Prometheus StaticConfig the
    * reference builds from it (config.go:41-66 PromConfig — one labeled
    * target group, Source = ID, one address per target; disabled
    * configs register nothing, service.go:73-80). `job = id`, group
    * labels attach to every target. Configs are config-scale (a TOML
    * file), so rows materialize driver-side into a Dataset that joins
    * the same [[schedule]]/[[runScrapes]] path as any discovery. */
  def targetsFromStaticDiscovery(
      spark: org.apache.spark.sql.SparkSession,
      configs: Seq[StaticDiscoveryConfig],
      db: String,
      rp: String,
      intervalS: Long,
      scheme: String = "http",
      metricsPath: String = "/metrics"): Dataset[ScrapeTarget] = {
    import spark.implicits._
    val rows = configs.filter(_.enabled).flatMap { c =>
      require(c.id.nonEmpty, "static discovery must be given a ID") // config.go:29-33
      c.targets.map(t => ScrapeTarget(
        c.id, s"$scheme://$t$metricsPath", db, rp, intervalS,
        enabled = true, labels = c.labels))
    }
    spark.createDataset(rows)
  }

  /** The tick grid: one row per (target, tick_s) over [startS, stopS),
    * tick_s ≡ h60(url) (mod intervalS). Columns: job, url, db, rp,
    * intervalS, tick_s. */
  def schedule(targets: Dataset[ScrapeTarget], startS: Long, stopS: Long): DataFrame = {
    require(stopS >= startS, s"stop $stopS before start $startS")
    val t = targets.filter(col("enabled") && col("intervalS") > 0).toDF()
    val offset = pmod(graft.llm.TextOps.h60(col("url")), col("intervalS"))
    // first tick ≥ startS in the target's phase
    val first = lit(startS) + pmod(offset - lit(startS), col("intervalS"))
    t.withColumn("tick_s",
        explode(when(first < lit(stopS),
            sequence(first, lit(stopS - 1), col("intervalS")))
          .otherwise(array().cast("array<long>"))))
      .drop("enabled")
  }

  /** Run the fetch seam over a schedule and parse results into the
    * canonical point frame. `fetch(url, tickS)` returns the exposition
    * text lines of one scrape (an HTTP GET in production; any fake in
    * tests — the parse, job encode/decode, blacklist, and timestamping
    * are what the engine owns). Samples without an explicit timestamp
    * default to the tick time, like the scrape loop stamping wall time. */
  def runScrapes(
      sched: DataFrame,
      fetch: (String, Long) => Seq[String],
      blacklist: Map[String, Set[String]] = Map.empty): DataFrame = {
    val spark = sched.sparkSession
    import spark.implicits._
    val f = fetch // serializable capture
    val hasLabels = sched.columns.contains("labels")
    val withLabels =
      if (hasLabels) sched
      else sched.withColumn("labels", map().cast("map<string,string>"))
    val samples = withLabels.select(
        col("url"), col("job"), col("db"), col("rp"), col("tick_s"), col("labels"))
      .as[(String, String, String, String, Long, Map[String, String])]
      .flatMap { case (url, job, db, rp, tick, tlabels) =>
        f(url, tick).iterator.flatMap(PrometheusScrape.parseLine).map { s =>
          // encodeJobName (config.go:121-134): the scraper stamps the
          // pipe-encoded job label; toPointFrame decodes it back.
          // Discovery target labels attach beneath the sample's own
          // (sample wins on conflict).
          s.copy(
            labels = tlabels ++ s.labels + ("job" -> s"$db|$rp|$job"),
            timeMs = s.timeMs.orElse(Some(tick * 1000L)))
        }
      }
    PrometheusScrape.toPointFrame(samples, defaultTimeMs = 0L, blacklist = blacklist)
  }
}
