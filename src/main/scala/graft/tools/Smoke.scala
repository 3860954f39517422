package graft.tools

import graft.Graft

/** Dev-only smoke: verify Spark can read every driver table (incl. the
  * nanosecond-precision events.ts and float-list embeddings). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Graft.session("graft-smoke")
    spark.sparkContext.setLogLevel("WARN")
    Graft.tableNames.foreach { t =>
      try {
        val df = Graft.table(spark, sfDir, t)
        println(s"== $t rows=${df.count()}")
        df.printSchema()
        if (t == "events" || t == "embeddings") df.show(3, truncate = false)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e}")
      }
    }
    spark.stop()
  }
}
