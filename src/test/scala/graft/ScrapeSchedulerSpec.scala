package graft

import graft.sources.ScrapeScheduler
import graft.sources.ScrapeScheduler.ScrapeTarget
import org.apache.spark.sql.functions._

/** Schedule-as-data scrape loop (reference services/scraper +
  * config.go): the tick grid, per-target phase stagger, and the
  * fetch-seam → exposition-parse → job-decode round trip. */
class ScrapeSchedulerSpec extends SparkSpec {
  import spark.implicits._

  private val targets = Seq(
    ScrapeTarget("node", "http://h1:9100/metrics", "db", "rp", 60L),
    ScrapeTarget("node", "http://h2:9100/metrics", "db", "rp", 60L),
    ScrapeTarget("app", "http://h3:8080/metrics", "db2", "rp2", 30L),
    ScrapeTarget("off", "http://h4:9100/metrics", "db", "rp", 60L, enabled = false))

  test("tick grid: per-config interval, hash-phase stagger, range bounds") {
    val sched = ScrapeScheduler.schedule(targets.toDS(), 0L, 180L)
      .select("job", "url", "intervalS", "tick_s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // disabled target contributes nothing
    assert(!sched.exists(_._2.contains("h4")))
    val byUrl = sched.groupBy(_._2).view.mapValues(_.map(_._4).sorted.toSeq).toMap
    // 180s / 60s = 3 ticks; 180s / 30s = 6 ticks — regardless of phase
    assert(byUrl("http://h1:9100/metrics").size === 3)
    assert(byUrl("http://h2:9100/metrics").size === 3)
    assert(byUrl("http://h3:8080/metrics").size === 6)
    byUrl.foreach { case (url, ticks) =>
      val interval = sched.find(_._2 == url).get._3
      // consecutive ticks exactly one interval apart, all in [0, 180)
      assert(ticks.zip(ticks.tail).forall { case (a, b) => b - a == interval })
      assert(ticks.forall(t => t >= 0 && t < 180))
      // the phase IS h60(url) mod interval — deterministic stagger
      val expectedPhase = java.lang.Long.remainderUnsigned(
        graft.llm.TextOps.jvmH60(url), interval)
      assert(ticks.forall(t => t % interval == expectedPhase), url)
    }
    // the two same-interval node targets landed on different phases
    assert(byUrl("http://h1:9100/metrics").head !=
      byUrl("http://h2:9100/metrics").head)
  }

  test("empty range and never-firing windows yield zero rows, not errors") {
    assert(ScrapeScheduler.schedule(targets.toDS(), 100L, 100L).count() === 0)
    // a window narrower than any phase slot can still be empty
    val one = Seq(ScrapeTarget("j", "http://x/metrics", "d", "r", 3600L)).toDS()
    val n = ScrapeScheduler.schedule(one, 0L, 10L).count()
    assert(n <= 1)
  }

  test("file_sd discovery: targets + labels load as data and ride onto samples") {
    val sd = java.io.File.createTempFile("graft_file_sd", ".json")
    sd.deleteOnExit()
    java.nio.file.Files.writeString(sd.toPath,
      """[
        |  {"targets": ["h1:9100", "h2:9100"], "labels": {"dc": "east", "env": "prod"}},
        |  {"targets": ["h3:9100"], "labels": {"dc": "west"}},
        |  {"targets": ["h4:9100"]}
        |]""".stripMargin)
    val ts = ScrapeScheduler.targetsFromFileSd(spark, sd.getAbsolutePath,
      job = "node", db = "db", rp = "rp", intervalS = 60L)
      .collect().sortBy(_.url)
    assert(ts.map(_.url).toSeq === Seq(
      "http://h1:9100/metrics", "http://h2:9100/metrics",
      "http://h3:9100/metrics", "http://h4:9100/metrics"))
    assert(ts(0).labels === Map("dc" -> "east", "env" -> "prod"))
    assert(ts(2).labels === Map("dc" -> "west"))
    assert(ts(3).labels === Map.empty)
    // target labels attach to scraped samples; the sample's own label
    // wins on conflict
    val sched = ScrapeScheduler.schedule(
      spark.createDataset(ts.toSeq), 0L, 60L)
    val fetch = (url: String, tick: Long) =>
      Seq(s"""up{instance="${url.drop(7).takeWhile(_ != ':')}",dc="self"} 1""")
    val rows = ScrapeScheduler.runScrapes(sched, fetch)
      .selectExpr("tags['instance']", "tags['dc']", "tags['env']")
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
      .sortBy(_._1)
    assert(rows.map(_._2).forall(_ == "self")) // sample label wins
    assert(rows.filter(r => r._1 == "h1" || r._1 == "h2").forall(_._3 === Some("prod")))
    assert(rows.filter(r => r._1 == "h3" || r._1 == "h4").forall(_._3.isEmpty))
  }

  test("static-discovery config sections parse as data and become schedulable targets") {
    // the reference's [[static-discovery]] TOML shape
    // (services/static_discovery/config.go:12-20) inside a larger config
    // file — other sections, comments, disabled configs all in play
    val toml =
      """# kapacitor.conf excerpt
        |[http]
        |  bind-address = ":9092"
        |
        |[[static-discovery]]
        |  enabled = true  # primary group
        |  id = "static1"  # annotated, like a real ops config
        |  targets = ["localhost:9100", "host2:9100"] # scrape both
        |  [static-discovery.labels]
        |    region = "us-east"
        |    tier = "web"
        |    zone = "a#1"
        |
        |[[static-discovery]]
        |  enabled = false
        |  id = "disabled1"
        |  targets = ["ghost:9100"]
        |
        |[[static-discovery]]
        |  enabled = true
        |  id = "static2"
        |  targets = ["db1:9104"]
        |
        |[[scraper]]
        |  enabled = true
        |  name = "unrelated"
        |""".stripMargin
    val configs = ScrapeScheduler.parseStaticDiscovery(toml)
    assert(configs === Seq(
      ScrapeScheduler.StaticDiscoveryConfig("static1", enabled = true,
        Seq("localhost:9100", "host2:9100"),
        // inline comments stripped quote-aware: the "a#1" hash survives
        Map("region" -> "us-east", "tier" -> "web", "zone" -> "a#1")),
      ScrapeScheduler.StaticDiscoveryConfig("disabled1", enabled = false,
        Seq("ghost:9100"), Map.empty),
      ScrapeScheduler.StaticDiscoveryConfig("static2", enabled = true,
        Seq("db1:9104"), Map.empty)))
    // PromConfig semantics: job = id, one row per target, group labels on
    // every row; disabled configs register nothing (service.go:73-80)
    val ts = ScrapeScheduler.targetsFromStaticDiscovery(
      spark, configs, db = "db", rp = "rp", intervalS = 30L)
      .collect().sortBy(_.url)
    assert(ts.map(t => (t.job, t.url)).toSeq === Seq(
      ("static2", "http://db1:9104/metrics"),
      ("static1", "http://host2:9100/metrics"),
      ("static1", "http://localhost:9100/metrics")))
    assert(ts.filter(_.job == "static1").forall(
      _.labels === Map("region" -> "us-east", "tier" -> "web", "zone" -> "a#1")))
    assert(!ts.exists(_.job == "disabled1"))
    // the rows ride the same schedule grid as any discovery source
    val grid = ScrapeScheduler.schedule(
      spark.createDataset(ts.toSeq), 0L, 120L)
    assert(grid.groupBy("url").count().collect().forall(_.getLong(1) === 4L))
    // an id-less config is invalid, like config.go Validate
    val e = intercept[IllegalArgumentException] {
      ScrapeScheduler.targetsFromStaticDiscovery(spark,
        Seq(ScrapeScheduler.StaticDiscoveryConfig("", enabled = true, Seq("x:1"))),
        "db", "rp", 30L).collect()
    }
    assert(e.getMessage.contains("ID"))
  }

  test("fetch seam round-trip: job encode/decode, tick-time default, blacklist") {
    // deterministic fake fetcher: each (url, tick) yields one sample with
    // an explicit ms timestamp and one without (→ defaults to tick time),
    // plus an instance label derived from the url
    val fetch = (url: String, tick: Long) => {
      val host = url.stripPrefix("http://").takeWhile(_ != ':')
      Seq(
        s"""up{instance="$host"} 1 ${tick * 1000 + 5}""",
        s"""cpu_load{instance="$host",core="0"} ${tick / 10.0}""")
    }
    val sched = ScrapeScheduler.schedule(targets.toDS(), 0L, 120L)
    val pts = ScrapeScheduler.runScrapes(sched, fetch,
      blacklist = Map("app" -> Set("h3")))
    val rows = pts.selectExpr("measurement", "db", "rp", "job",
        "tags['instance']", "value", "time_ms")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getDouble(5), r.getLong(6)))
    // app/h3 is blacklisted entirely; node targets survive
    assert(rows.nonEmpty && !rows.exists(_._5 == "h3"))
    assert(rows.forall(r => r._2 == "db" && r._3 == "rp" && r._4 == "node"))
    // explicit timestamps kept; timestampless samples stamped tick*1000
    val ups = rows.filter(_._1 == "up")
    val loads = rows.filter(_._1 == "cpu_load")
    assert(ups.forall(r => r._7 % 1000 == 5))
    assert(loads.forall(r => r._7 % 1000 == 0 && r._6 == (r._7 / 1000) / 10.0))
    // volume: 2 node targets x 2 ticks each in [0,120) x 2 samples, minus nothing
    assert(rows.length === 2 * 2 * 2)
  }
}
