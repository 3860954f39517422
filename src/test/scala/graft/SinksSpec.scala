package graft

import graft.api.Pipe
import graft.sources.{LineProtocol, Sinks}
import graft.streaming.WindowStream
import graft.streaming.WindowStream.CountPoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("line protocol round-trips through writer and parser") {
    val df = Seq(("cpu", "host a", 0.5, 1000000000L)).toDF("m", "host", "usage", "ts")
    val line = df.select(Sinks.toLineProtocol(
      col("m"), Seq("host" -> col("host")), Seq("usage" -> col("usage")), col("ts"))).as[String].head()
    assert(line == "cpu,host=host\\ a usage=0.5 1000000000")
    val back = LineProtocol.parseLine(line).get
    assert(back.measurement == "cpu" && back.tags("host") == "host a" &&
      back.fieldsFloat("usage") == 0.5 && back.timeNs == 1000000000L)
  }

  test("influxOut writes measurement/day partitioned parquet") {
    val dir = Files.createTempDirectory("graft_out").toString
    val df = Seq(("cpu", new java.sql.Timestamp(86400L * 1000), 1.0))
      .toDF("measurement", "time", "v")
    Sinks.influxOut(df, dir, extraTags = Map("dc" -> "east"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1)
    assert(back.columns.toSet.contains("dc"))
    assert(back.select("measurement").as[String].head() == "cpu")
  }

  test("httpPost hands the Result JSON to the transport") {
    var posted: String = null
    val df = Seq(("a", 1.0)).toDF("host", "v")
    Sinks.httpPost(df, "m", Seq("host"), posted = _)
    assert(posted != null && posted.contains(""""name":"m""""))
  }

  test("graft extensions inject native functions; SQL resolves them") {
    // injection applies cleanly to a fresh extensions container
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // the same builders, registered on a live session, resolve from SQL
    val s2 = spark.newSession()
    graft.expressions.DotProduct.register(s2)
    graft.expressions.MinHashSig.register(s2, 16)
    assert(s2.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)
    assert(s2.sql("SELECT size(graft_minhash16(array(42L)))").head().getInt(0) == 16)
  }

  test("windowPerPoint carries the trailing-period aggregate on each point") {
    val df = Seq((1L, 0L), (2L, 30L), (3L, 61L)).map { case (id, sec) =>
      (id, new java.sql.Timestamp(sec * 1000), 10.0 * id)
    }.toDF("id", "time", "v")
    val p = Pipe(df, dims = Nil, idCol = Some("id")).windowPerPoint(60, "v")
    val out = p.df.orderBy("id").select("w_cnt", "w_mean").as[(Long, Double)].collect().toSeq
    // t=61 window (1, 61] contains t=30 and t=61 only
    assert(out == Seq((1L, 10.0), (2L, 15.0), (2L, 25.0)))
  }

  test("periodic barrier emits per group on the wall clock") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[CountPoint]
    val q = WindowStream.periodicBarrier(ms.toDS(), 300).writeStream
      .format("memory").queryName("pb_t").outputMode("update").start()
    try {
      ms.addData(CountPoint("g", 1L, 1.0))
      // NOTE no processAllAvailable: with processing-time timeouts the
      // engine keeps scheduling timer batches and that call livelocks.
      // The data batch arms the timer on its own; poll bounded for emits.
      val deadline = System.currentTimeMillis + 20000
      var ok = false
      while (!ok && System.currentTimeMillis < deadline) {
        ok = spark.table("pb_t").filter($"group" === "g").count() > 0
        if (!ok) Thread.sleep(250)
      }
      assert(ok, "no periodic barrier for idle group g within 20s")
    } finally q.stop()
  }
}
