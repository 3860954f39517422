package graft

import graft.sources.StatsEmit
import org.apache.spark.sql.functions._

/** The stats service's ticker emission rendered as data (reference
  * services/stats/service.go:104-136, server/vars/stats.go:74-141). */
class StatsEmitSpec extends SparkSpec {
  import spark.implicits._

  test("tick grid: fires at every interval multiple in (mn, mx]") {
    val bounds = Seq((150L, 1000L)).toDF("mn", "mx")
    assert(StatsEmit.tickGrid(bounds, 200L).as[Long].collect().toSeq ===
      Seq(200L, 400L, 600L, 800L, 1000L)) // 1000 = exact boundary included
    // mn exactly on a boundary: first fire is one full interval later
    val aligned = Seq((200L, 700L)).toDF("mn", "mx")
    assert(StatsEmit.tickGrid(aligned, 200L).as[Long].collect().toSeq ===
      Seq(400L, 600L))
  }

  test("as-of fill: latest observation at or before each fire; skip before first") {
    // stat (ingest, taskA, collected): observed 1 @t=50, 3 @t=250, 4 @t=600
    // stat (ingest, taskB, collected): observed 10 @t=450 only
    val obs = Seq(
      (50L, "ingest", "a", "collected", 1.0),
      (250L, "ingest", "a", "collected", 3.0),
      (600L, "ingest", "a", "collected", 4.0),
      (450L, "ingest", "b", "collected", 10.0))
      .toDF("time_us", "name", "task", "field", "value")
    val fires = Seq(200L, 400L, 600L).toDF("fire_us")
    val out = StatsEmit.statsPoints(obs, Seq("name", "task", "field"), fires,
        idTags = Map("host" -> "h1", "cluster_id" -> "c1"))
      .orderBy("task", "time_us")
      .select("time_us", "db", "rp", "name", "task", "field", "cluster_id",
        "host", "value")
      .as[(Long, String, String, String, String, String, String, String, Double)]
      .collect().toSeq
    assert(out === Seq(
      // fire 600 is AT the third observation's time: at-or-before includes it
      (200L, "_kapacitor", "autogen", "ingest", "a", "collected", "c1", "h1", 1.0),
      (400L, "_kapacitor", "autogen", "ingest", "a", "collected", "c1", "h1", 3.0),
      (600L, "_kapacitor", "autogen", "ingest", "a", "collected", "c1", "h1", 4.0),
      // task b: nothing before its first observation (len(values)==0 skip)
      (600L, "_kapacitor", "autogen", "ingest", "b", "collected", "c1", "h1", 10.0)))
  }

  test("uptime: seconds since service start at each fire") {
    val bounds = Seq((1000000L, 5000000L)).toDF("mn", "mx")
    val out = StatsEmit.uptimePoints(bounds, 2000000L)
      .orderBy("time_us")
      .select("time_us", "name", "field", "value")
      .as[(Long, String, String, Double)].collect().toSeq
    assert(out === Seq(
      (2000000L, "kapacitor", "uptime", 1.0),
      (4000000L, "kapacitor", "uptime", 3.0)))
  }
}
