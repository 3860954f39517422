package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall-time breakdown of the q_pipeline_curate gate query —
  * the adjudication tool behind the README's curate target. Runs the
  * EXACT gate composition (LlmQueries.pipelineCurateQ's config) with
  * Pipeline.curate's `counters` hook, but passes a Map whose `update`
  * records a timestamp: each stage's `tap` counts the stage result right
  * after its (checkpointed) frame exists, so the gap between successive
  * updates is that stage's cost (construction + checkpoint + count).
  * A second pass with counters=None then times the undisturbed end-to-end
  * query (`repeat` samples, discard-first-then-min), so the breakdown and
  * the steady state come from the same JVM and SF.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.CurateStages [repeat=N]
  */
object CurateStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = args.collectFirst { case s if s.startsWith("repeat=") => s.drop(7).toInt }.getOrElse(8)
    val spark = graft.Graft.session("graft-curate-stages")
    spark.sparkContext.setLogLevel("WARN")
    // same session warm the bench does
    spark.range(1000).selectExpr("sum(id)").count()

    val stamps = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    final class TimingMap extends scala.collection.mutable.HashMap[String, Long] {
      override def update(key: String, value: Long): Unit = {
        stamps += ((key, System.nanoTime(), value)); super.update(key, value)
      }
    }
    def gate(counters: Option[scala.collection.mutable.Map[String, Long]]) = {
      val d = graft.Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"),
          graft.queries.LlmQueries.curateEnrichedCol.as("text"))
      graft.llm.Pipeline.curate(d, "doc_id", "text", "source",
        graft.llm.Pipeline.CurationConfig(
          langs = Set.empty, requireC4Keep = false,
          gopherRules = true, paragraphDedup = true,
          maxAvgNll = Some(3.47), perplexityVocab = 256,
          nearDup = true,
          benchmark = Some(d.filter(col("doc_id") % 97 === 0)),
          contaminationN = 3, minOverlap = 3L,
          mixRates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
          defaultMixRate = 0.5, seqLen = 512),
        counters = counters)
        .orderBy("doc_id")
    }
    // one untimed warm pass (codegen + JIT), as the bench's warm-all does
    gate(None).count()

    // ---- per-stage breakdown (counters force each stage in order)
    spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
    System.gc(); Thread.sleep(50)
    val t0 = System.nanoTime()
    gate(Some(new TimingMap)).count()
    val tEnd = System.nanoTime()
    var prev = t0
    println(f"${"stage"}%-18s ${"sec"}%8s  rows")
    stamps.foreach { case (name, t, rows) =>
      println(f"$name%-18s ${(t - prev) / 1e9}%8.3f  $rows")
      prev = t
    }
    println(f"${"(final orderBy)"}%-18s ${(tEnd - prev) / 1e9}%8.3f")
    println(f"${"breakdown total"}%-18s ${(tEnd - t0) / 1e9}%8.3f")

    // ---- undisturbed steady state, bench-identical protocol
    val times = (1 to repeat).map { _ =>
      spark.sparkContext.getPersistentRDDs.valuesIterator.foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(50)
      val s = System.nanoTime()
      gate(None).count()
      (System.nanoTime() - s) / 1e9
    }
    println("samples: " + times.map(t => f"$t%.3f").mkString(" "))
    val steady = if (times.length >= 3) times.tail else times
    println(f"steady (min of warm tail): ${steady.min}%.3f s  sf=$sfDir")
    spark.stop()
  }
}
