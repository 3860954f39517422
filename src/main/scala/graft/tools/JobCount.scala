package graft.tools

/** Spark-job-count audit for the serial-round-trip queries (r22): the
  * multi-stage driver-work queries (curate, classify, the LM trainers)
  * are bounded by SCHEDULING LATENCY — the number of serial Spark jobs —
  * not data volume at bench scale, so the fusion work's "done" evidence
  * is the job count, not wall-clock alone. Runs each named query once
  * untimed (codegen/JIT warm), then once with a job listener attached and
  * prints `<query> jobs=N stages=M`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.JobCount q_a q_b …
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Graft.session("graft-jobcount")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_pipeline_curate", "q_text_classify", "q_text_perplexity",
      "q_text_bigram_nll", "q_dedup_clusters", "q_dedup_keepbest")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    // (numTasks, wallMs) per completed stage — where the scheduling
    // overhead vs data work actually sits
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(js.stageInfos.size)
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        tasks.addAndGet(si.numTasks)
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        stageRows.add((si.numTasks, wall))
      }
    }
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm pass: codegen + models
      spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
      jobs.set(0); stages.set(0); tasks.set(0); stageRows.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      finally {
        Thread.sleep(300) // listener events are async; settle before reading
        spark.sparkContext.removeSparkListener(listener)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val rows = stageRows.asScala.toSeq
      val stageWall = rows.map(_._2).filter(_ >= 0).sum
      println(f"$n jobs=${jobs.get()} stages=${stages.get()} tasks=${tasks.get()} " +
        f"wall=$wall%.2fs stageWallSum=${stageWall / 1000.0}%.2fs " +
        s"taskDist=${rows.map(_._1).groupBy(identity).toSeq.sortBy(_._1).map { case (k, v) => s"$k×${v.size}" }.mkString(",")}")
    }
    spark.stop()
  }
}
