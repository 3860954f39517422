package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** stats()/deadman() (reference stats.go:23-121, pipeline/node.go:282-312):
  * node-throughput accounting and the zero-throughput alarm built on it.
  *
  * stats(interval) emits the per-interval emitted-point count; deadman is
  * the macro stats → derivative('emitted') → alert(crit: emitted <=
  * threshold). The crucial semantic: an interval with NO points must still
  * alarm — so the bucket axis is generated from the observed time range
  * (cross join of the global bucket range with the group universe; both
  * sides of that join are tiny aggregates, the raw stream is touched once).
  */
object Deadman {

  /** Per-(group, interval-bucket) emitted count over the full observed
    * range, zero-filled for empty buckets. */
  def stats(df: DataFrame, timeUsCol: String, groupCol: String, intervalSeconds: Long): DataFrame = {
    val bucket = (floor(col(timeUsCol) / 1000000.0 / intervalSeconds) * intervalSeconds).cast("long")
    val counts = df
      .withColumn("bucket_s", bucket)
      .groupBy(col(groupCol), col("bucket_s"))
      .agg(count(lit(1)).as("emitted"))
    val range = df.agg(
      min(bucket).as("b0"), max(bucket).as("b1"))
      .select(explode(sequence(col("b0"), col("b1"), lit(intervalSeconds))).as("bucket_s"))
    val groups = df.select(col(groupCol)).distinct()
    groups.crossJoin(range)
      .join(counts, Seq(groupCol, "bucket_s"), "left")
      .withColumn("emitted", coalesce(col("emitted"), lit(0L)))
  }

  /** deadman(threshold, interval): CRITICAL rows where a group's interval
    * throughput is at or below the threshold, OK otherwise. */
  def deadman(
      df: DataFrame,
      timeUsCol: String,
      groupCol: String,
      intervalSeconds: Long,
      threshold: Long): DataFrame =
    stats(df, timeUsCol, groupCol, intervalSeconds)
      .withColumn("level", when(col("emitted") <= threshold, "CRITICAL").otherwise("OK"))
}
