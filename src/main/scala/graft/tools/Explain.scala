package graft.tools

/** Dev tool: run one SparkEntry query and print its ADAPTIVE executed plan
  * (post-AQE — the plan that actually ran, with runtime join strategy and
  * partition coalescing decisions visible).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Explain q_name
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val dir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = graft.Graft.session("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n = df.count() // materialize so AQE finalizes every stage
    println(s"== $name rows=$n sf=$dir")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
