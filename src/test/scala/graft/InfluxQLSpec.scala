package graft

import graft.api.Pipe
import graft.operators.InfluxQL
import java.sql.Timestamp

class InfluxQLSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000)

  private def pipe: Pipe = {
    val df = Seq(
      ("a", ts(0), 1.0, 1L), ("a", ts(10), 5.0, 2L), ("a", ts(20), 3.0, 3L),
      ("a", ts(30), 5.0, 4L),
      ("b", ts(0), 2.0, 5L), ("b", ts(10), 4.0, 6L))
      .toDF("g", "time", "v", "id")
    Pipe(df, timeCol = "time", dims = Seq("g"), idCol = Some("id"))
  }

  test("median averages the two middle values on even n") {
    val out = InfluxQL.median(pipe, Seq("g"), "v", "m")
      .as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 4.0, "b" -> 3.0))
  }

  test("mode picks the most frequent value, smallest on tie") {
    val out = InfluxQL.mode(pipe, Seq("g"), "v", "m")
      .as[(String, Double)].collect().toMap
    assert(out("a") == 5.0) // 5.0 appears twice
    assert(out("b") == 2.0) // tie 2.0/4.0 → smallest
  }

  test("spread is max minus min") {
    val out = InfluxQL.spread(pipe, Seq("g"), "v", "s")
      .as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 4.0, "b" -> 2.0))
  }

  test("first/last keep the boundary point's value and time") {
    val f = InfluxQL.first(pipe, Seq("g"), "v", "f")
      .select("g", "f").as[(String, Double)].collect().toMap
    assert(f == Map("a" -> 1.0, "b" -> 2.0))
    val l = InfluxQL.last(pipe, Seq("g"), "v", "l")
      .select("g", "l").as[(String, Double)].collect().toMap
    assert(l == Map("a" -> 5.0, "b" -> 4.0))
  }

  test("min/max selectors keep the earliest winning point's time") {
    val mx = InfluxQL.maxSel(pipe, Seq("g"), "v", "mx")
    val row = mx.filter($"g" === "a").select("mx", "time")
      .as[(Double, Timestamp)].head()
    assert(row == ((5.0, ts(10)))) // 5.0 at t=10 beats 5.0 at t=30
  }

  test("percentile uses nearest-rank and emits nothing when rank < 1") {
    // n=4, p50 → rank floor(4*0.5+0.5)=2 → second-smallest
    val p50 = InfluxQL.percentile(pipe, Seq("g"), "v", 50.0, "p")
      .as[(String, Double)].collect().toMap
    assert(p50("a") == 3.0)
    // n=2, p10 → rank floor(2*0.1+0.5)=0 → no row for group b
    val p10 = InfluxQL.percentile(pipe, Seq("g"), "v", 10.0, "p")
      .as[(String, Double)].collect().toMap
    assert(p10.get("b").isEmpty)
  }

  test("top keeps n ranked points with deterministic tie-break") {
    val out = InfluxQL.top(pipe, Seq("g"), "v", 2, "t")
      .filter($"g" === "a").select("t", "rk").as[(Double, Long)].collect().toSet
    assert(out == Set((5.0, 1L), (5.0, 2L)))
  }
}
