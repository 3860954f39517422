package graft

import graft.api.Pipe
import graft.operators.NodeStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Node-stats introspection (reference stats.go:23-121): the batch tap
  * semantically pins three of the reference `*Cardinality` integration
  * tests (streamer_test.go:12844-12996) over the very fixture they replay
  * — TestStream_Cardinality.srpl, 90 cpu points across 9 (host,cpu)
  * groups — and the streaming listener bridge reports the same fields
  * from query progress. */
class NodeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def source = graft.sources.Replay.readSrpl(spark,
      "/root/reference/integrations/testdata/TestStream_Cardinality.srpl")
    .select(col("time"), col("measurement"),
      expr("tags['host']").as("host"), expr("tags['cpu']").as("cpu"),
      expr("fieldsFloat['usage_user']").as("usage_user"),
      monotonically_increasing_id().as("id"))

  private def statsFor(script: String): Map[String, (Long, Long, Long)] = {
    val stages = Seq.newBuilder[NodeStats.Stage]
    graft.tick.TickScript.compile(script, source, idCol = Some("id"),
      stageTap = Some((name, p) =>
      stages += NodeStats.Stage(name, p.df, p.dims,
        NodeStats.statefulNodes.contains(name.replaceAll("\\d+$","")))))
    NodeStats.stats(spark, stages.result())
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("TestStream_DerivativeCardinality semantics: 9 groups held by derivative2") {
    val st = statsFor(
      """stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('host','cpu')
        |    |derivative('usage_user')
        |""".stripMargin)
    // es (streamer_test.go:12854-12877): stream0/from1 collect+emit all 90,
    // hold no state; derivative2 collects 90, emits 0 (terminal — no output
    // edge), works over 9 groups
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("derivative2") == ((90L, 0L, 9L)))
  }

  test("TestStream_WhereCardinality semantics: where2 holds per-group lambda state") {
    val st = statsFor(
      """stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('host','cpu')
        |    |where(lambda: "host" == 'localhost')
        |""".stripMargin)
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("where2") == ((90L, 0L, 9L)))
  }

  test("TestStream_WindowCardinality semantics: window2 buffers 9 groups") {
    val st = statsFor(
      """stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('host','cpu')
        |    |window()
        |      .period(1s)
        |      .every(1s)
        |""".stripMargin)
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("window2") == ((90L, 0L, 9L)))
  }

  test("TestStream_SampleCardinality semantics: sample2 counts per group") {
    val st = statsFor(
      """stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('host','cpu')
        |    |sample(2)
        |""".stripMargin)
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("sample2") == ((90L, 0L, 9L)))
  }

  test("TestStream_EvalCardinality semantics: eval2 holds sigma state per group") {
    val st = statsFor(
      """stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('host','cpu')
        |    |eval(lambda: sigma("usage_user"))
        |      .as('sigma')
        |""".stripMargin)
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("eval2") == ((90L, 0L, 9L)))
  }

  test("TestStream_AlertCardinality semantics: alert2 tracks 9 groups") {
    val st = statsFor(
      """stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('host','cpu')
        |    |alert()
        |""".stripMargin)
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("alert2") == ((90L, 0L, 9L)))
  }

  test("TestStream_CombineCardinality semantics: combine2 buffers 9 groups") {
    val st = statsFor(
      """var s1 = stream
        |    |from()
        |        .measurement('cpu')
        |        .groupBy('cpu','host')
        |    |combine(lambda: TRUE, lambda: TRUE)
        |        .as('total','true')
        |""".stripMargin)
    assert(st("stream0") == ((90L, 90L, 0L)))
    assert(st("from1") == ((90L, 90L, 0L)))
    assert(st("combine2")._1 == 90L && st("combine2")._2 == 0L && st("combine2")._3 == 9L)
  }

  test("streaming listener bridge reports collected and state cardinality") {
    implicit val ctx = spark.sqlContext
    val listener = new NodeStats.StreamingStats
    spark.streams.addListener(listener)
    val ms = MemoryStream[(String, Double)]
    val q = ms.toDS().toDF("g", "v").groupBy("g").agg(sum("v").as("s"))
      .writeStream.format("memory").queryName("ns_probe")
      .outputMode("complete").start()
    try {
      ms.addData(Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)))
      q.processAllAvailable()
      // listener events are async — poll until the progress lands
      val deadline = System.currentTimeMillis + 15000
      var row = Option.empty[(Long, Long)]
      while (row.isEmpty && System.currentTimeMillis < deadline) {
        row = listener.frame(spark).filter($"query" === "ns_probe")
          .select("collected", "working_cardinality")
          .as[(Long, Long)].collect().headOption.filter(_._1 >= 3L)
        if (row.isEmpty) Thread.sleep(200)
      }
      assert(row.exists(r => r._1 == 3L && r._2 == 2L), s"got $row")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
