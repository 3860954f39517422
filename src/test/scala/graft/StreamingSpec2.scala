package graft

import graft.streaming.AlertStream._
import graft.streaming.AlertStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

object StreamingSpec2 {
  case class Ev(k: Long, timeUs: Long, v: Double)
  val resumed = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
}

/** Stream-stream tolerance join and fault tolerance (SURVEY hard parts:
  * join lowMark ordering → watermarked bucket join; snapshot/restore →
  * checkpoint resume). */
class StreamingSpec2 extends SparkSpec {
  import spark.implicits._
  import StreamingSpec2._

  private val us = 1000000L

  test("stream-stream join on tolerance buckets matches batch joinTolerance") {
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    def bucketed(ms: MemoryStream[Ev], nm: String) =
      ms.toDS().toDF()
        .withColumn("time", timestamp_micros($"timeUs"))
        .withWatermark("time", "30 seconds")
        // Go time.Round semantics: floor(t/tol + 0.5)*tol
        .withColumn("jt_s", (floor($"timeUs" / 1000000.0 / 60 + 0.5) * 60).cast("long"))
        .select($"k", $"jt_s", $"v".as(s"${nm}_v"), $"time".as(s"${nm}_time"))
    val joined = bucketed(l, "l").join(bucketed(r, "r"), Seq("k", "jt_s"))
      .select($"k", $"jt_s", $"l_v", $"r_v")
    val q = joined.writeStream.format("memory").queryName("ssj_t").outputMode("append").start()
    try {
      l.addData(Ev(1, 10 * us, 1.0), Ev(1, 100 * us, 2.0), Ev(2, 10 * us, 9.0))
      r.addData(Ev(1, 25 * us, 5.0), Ev(1, 95 * us, 6.0))
      q.processAllAvailable()
      val streamed = spark.table("ssj_t").as[(Long, Long, Double, Double)].collect().toSet
      // bucket 0s joins l@10s with r@25s; bucket 120s joins l@100s with r@95s
      assert(streamed == Set((1L, 0L, 1.0, 5.0), (1L, 120L, 2.0, 6.0)))
    } finally q.stop()
  }

  test("alert FSM state survives a checkpointed restart") {
    implicit val ctx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val cfg = AlertConfig(stateChangesOnly = true)
    def pt(t: Long, lvl: Int) = AlertPoint("g", t * us, lvl >= 1, lvl >= 2, lvl >= 3)
    def sink(df: org.apache.spark.sql.Dataset[AlertEvent], id: Long): Unit =
      df.collect().foreach(e => resumed.add((e.group, e.timeUs / us, e.level)))

    val ms1 = MemoryStream[AlertPoint]
    val q1 = AlertStream.runStreaming(ms1.toDS(), cfg).writeStream
      .outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch(sink _).start()
    try {
      ms1.addData(pt(1, 1)) // OK→INFO: emits
      q1.processAllAvailable()
      assert(resumed.size() == 1)
    } finally q1.stop()

    // new query over a fresh source, same checkpoint: the state store must
    // remember the INFO level across the restart
    val ms2 = MemoryStream[AlertPoint]
    ms2.addData(pt(1, 1)) // batch 0 re-definition for offset-log replay
    val q2 = AlertStream.runStreaming(ms2.toDS(), cfg).writeStream
      .outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch(sink _).start()
    try {
      ms2.addData(pt(2, 1)) // still INFO: unchanged → silent iff state survived
      ms2.addData(pt(3, 2)) // INFO→WARNING: emits
      q2.processAllAvailable()
      val out = resumed.toArray(Array.empty[(String, Long, Int)]).sortBy(_._2).toSeq
      assert(out.count(_._3 == 2) == 1, s"expected one WARNING transition, got $out")
      assert(!out.exists(e => e._2 == 2 && e._3 == 1), s"repeat INFO should be suppressed: $out")
    } finally q2.stop()
  }

  test("dedup LSH bucket rosters survive a checkpointed restart") {
    // the state store holds each bucket's signature roster — doc 1 arrives
    // before the restart, its twin doc 2 after: the (1,2) pair can only be
    // reported if the roster persisted through the checkpoint
    implicit val ctx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_dd_ckpt").toString
    val pairs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val sig = Seq.fill(16)(11L)
    def row(id: Long) = graft.streaming.DedupStream.BandedSig(id, 0, "bk", sig)
    def sink(df: org.apache.spark.sql.Dataset[graft.streaming.DedupStream.CandPair],
        id: Long): Unit =
      df.collect().foreach(p => pairs.add((p.idA, p.idB)))

    val ms1 = MemoryStream[graft.streaming.DedupStream.BandedSig]
    val q1 = graft.streaming.DedupStream.nearDupPairs(ms1.toDS(), k = 16, threshold = 0.5)
      .writeStream.outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch(sink _).start()
    try {
      ms1.addData(row(1L)) // roster seed: no pair yet
      q1.processAllAvailable()
      assert(pairs.isEmpty)
    } finally q1.stop()

    val ms2 = MemoryStream[graft.streaming.DedupStream.BandedSig]
    ms2.addData(row(1L)) // batch 0 re-definition for offset-log replay
    val q2 = graft.streaming.DedupStream.nearDupPairs(ms2.toDS(), k = 16, threshold = 0.5)
      .writeStream.outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch(sink _).start()
    try {
      ms2.addData(row(2L)) // twin — pairs iff the roster survived
      q2.processAllAvailable()
      val out = pairs.toArray(Array.empty[(Long, Long)]).toSet
      assert(out == Set((1L, 2L)), s"got $out")
    } finally q2.stop()
  }

  test("influxOut partitioned layout prunes by measurement at read time") {
    val dir = Files.createTempDirectory("graft_prune").toString
    val df = Seq(
      ("cpu", new java.sql.Timestamp(1000), 1.0),
      ("mem", new java.sql.Timestamp(1000), 2.0)).toDF("measurement", "time", "v")
    graft.sources.Sinks.influxOut(df, dir)
    val read = spark.read.parquet(dir).filter($"measurement" === "cpu")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("measurement"))
    assert(read.count() == 1)
  }
}
