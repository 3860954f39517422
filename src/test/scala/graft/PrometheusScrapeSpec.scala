package graft

import graft.sources.PrometheusScrape
import graft.sources.PrometheusScrape.PromSample

/** Prometheus exposition parsing + the scraper's sample→point transform
  * (reference services/scraper/service.go:184-240, config.go:121-134). */
class PrometheusScrapeSpec extends SparkSpec {
  import spark.implicits._

  test("parseLine: metrics, labels with escapes, specials, timestamps, comments") {
    assert(PrometheusScrape.parseLine("# HELP http_requests_total count").isEmpty)
    assert(PrometheusScrape.parseLine("# TYPE http_requests_total counter").isEmpty)
    assert(PrometheusScrape.parseLine("").isEmpty)
    assert(PrometheusScrape.parseLine("http_requests_total 1027") ===
      Some(PromSample("http_requests_total", Map.empty, 1027.0, None)))
    assert(PrometheusScrape.parseLine(
      """http_requests_total{method="post",code="200"} 1027 1395066363000""") ===
      Some(PromSample("http_requests_total",
        Map("method" -> "post", "code" -> "200"), 1027.0, Some(1395066363000L))))
    // escaped label values: \" \\ \n
    assert(PrometheusScrape.parseLine(
      """msg_count{text="say \"hi\"\n",path="C:\\tmp"} 3""").get.labels ===
      Map("text" -> "say \"hi\"\n", "path" -> "C:\\tmp"))
    assert(PrometheusScrape.parseLine("up{job=\"j\"} +Inf").get.value.isPosInfinity)
    assert(PrometheusScrape.parseLine("up NaN").get.value.isNaN)
    // histogram/summary raw series parse as plain samples
    assert(PrometheusScrape.parseLine(
      """rpc_duration_seconds{quantile="0.99"} 7.6e-05""").get.value === 7.6e-05)
    assert(PrometheusScrape.parseLine(
      """rpc_duration_bucket{le="+Inf"} 144320""").get.labels === Map("le" -> "+Inf"))
    assert(PrometheusScrape.parseLine("{bad} 1").isEmpty)
    assert(PrometheusScrape.parseLine("metric_no_value").isEmpty)
  }

  test("toPointFrame mirrors the Append transform: job decode, NaN drop, blacklist") {
    val payload = Seq(
      """cpu_usage{job="mydb|autogen|scrapeA",instance="host1",core="0"} 0.5 1000""",
      """cpu_usage{job="mydb|autogen|scrapeA",instance="bad",core="1"} 0.9 1000""",
      """mem_free{job="mydb|autogen|scrapeA",instance="host1"} NaN 1000""",
      """disk_io{job="not-encoded",instance="host1"} 1.0 1000""",
      "# TYPE cpu_usage gauge",
      """cpu_usage{job="mydb|autogen|scrapeA",instance="host2"} 0.7""")
    val out = PrometheusScrape.toPointFrame(
      PrometheusScrape.parse(payload.toDS()),
      defaultTimeMs = 5000L,
      blacklist = Map("scrapeA" -> Set("bad")))
    val rows = out.selectExpr(
        "measurement", "db", "rp", "job", "tags['instance']", "tags['__name__']", "value", "time_ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getDouble(6), r.getLong(7)))
      .sortBy(t => (t._1, t._5))
    // NaN dropped (service.go:193), blacklisted instance dropped (:215-224),
    // malformed job dropped (:205-208), timestampless sample gets the default;
    // __name__ stays a tag exactly like the reference's tag set
    assert(rows === Array(
      ("cpu_usage", "mydb", "autogen", "scrapeA", "host1", "cpu_usage", 0.5, 1000L),
      ("cpu_usage", "mydb", "autogen", "scrapeA", "host2", "cpu_usage", 0.7, 5000L)))
    // the `job` label itself is stripped from tags
    assert(out.selectExpr("tags['job']").collect().forall(_.isNullAt(0)))
  }

  test("toPointFrame: a sample WITHOUT a job label is written with empty db/rp/job") {
    // service.go:198-211 initializes db/rp/job to "" and only decodes when
    // the label is present — absence is not an error, only a present-but-
    // malformed job is rejected
    val payload = Seq(
      """up{instance="host1"} 1 1000""",
      """up{job="db|rp|j",instance="host1"} 1 1000""",
      """up{job="malformed"} 1 1000""")
    val rows = PrometheusScrape.toPointFrame(PrometheusScrape.parse(payload.toDS()))
      .selectExpr("measurement", "db", "rp", "job", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getDouble(4)))
      .sortBy(_._2)
    assert(rows === Array(
      ("up", "", "", "", 1.0),
      ("up", "db", "rp", "j", 1.0)))
  }

  test("fuzz: render∘parse is identity over random labels with escapes and special values") {
    val rnd = new scala.util.Random(20260814L)
    def esc(v: String) = v.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case c    => c.toString
    }
    val labelChars = "abzXYZ09_ \"\\\n,={}漢字éπ"
    def randLabelValue() =
      (0 until rnd.nextInt(8)).map(_ => labelChars(rnd.nextInt(labelChars.length))).mkString
    (1 to 300).foreach { _ =>
      val metric = "m_" + rnd.nextInt(1000)
      val labels = (0 until rnd.nextInt(4))
        .map(i => s"l$i" -> randLabelValue()).toMap
      val value = rnd.nextInt(5) match {
        case 0 => Double.PositiveInfinity
        case 1 => Double.NegativeInfinity
        case 2 => rnd.nextDouble() * 1e6 - 5e5
        case 3 => rnd.nextInt(1000).toDouble
        case _ => rnd.nextDouble() * 1e-7
      }
      val ts = if (rnd.nextBoolean()) Some(rnd.nextLong() % (1L << 45)) else None
      def fmtV(d: Double) =
        if (d.isPosInfinity) "+Inf" else if (d.isNegInfinity) "-Inf" else d.toString
      val lbl =
        if (labels.isEmpty) ""
        else labels.map { case (k, v) => s"""$k="${esc(v)}"""" }.mkString("{", ",", "}")
      val line = s"$metric$lbl ${fmtV(value)}${ts.map(" " + _).getOrElse("")}"
      val got = PrometheusScrape.parseLine(line)
        .getOrElse(fail(s"failed to parse: $line"))
      assert(got.metric === metric, line)
      assert(got.labels === labels, line)
      assert(got.value === value, line)
      assert(got.timeMs === ts, line)
    }
  }

  test("round-trip into the Pipe algebra: scraped points aggregate like any stream") {
    val lines = (0 until 60).map { i =>
      s"""req_total{job="db|rp|j",instance="h${i % 3}"} ${i}.0 ${i * 1000}"""
    }
    val pts = PrometheusScrape.toPointFrame(PrometheusScrape.parse(lines.toDS()))
    val agg = graft.api.Pipe(pts, "time", Seq("measurement"))
      .windowTumbling(60).df
      .groupBy("measurement", "bucket_s").count()
      .collect()
    assert(agg.length === 1 && agg(0).getLong(2) === 60L)
  }
}
