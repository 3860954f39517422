package graft.operators

import graft.api.Pipe
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The InfluxQL aggregate/selector family (reference pipeline/influxql.go:
  * 175-601, execution influxql.go:122-299) re-expressed as Spark
  * aggregations over (group dims × window bucket).
  *
  * Batch-edge semantics: accumulate the whole batch, emit one point per
  * group at the batch's tmax (reference influxql.go:141-165). In graft a
  * "batch" is the set of rows sharing the grouping keys, so every method
  * here takes the key columns explicitly and returns one row per key
  * combination — Catalyst plans these as partial (map-side) + final
  * aggregations, which is the scale-safe shape: no per-group state lives on
  * the driver and skewed groups are handled by AQE.
  *
  * Selector semantics (first/last/min/max/percentile/top/bottom) keep the
  * *point* — its time and value — not just the scalar
  * (reference influxql.go "usePointTimes", pipeline/influxql.go:165-168).
  * Implemented with `min_by`/`max_by`/ranked windows on a (value, time, id)
  * struct so ties break on earliest time then input id, deterministically.
  */
object InfluxQL {

  private def grouped(p: Pipe, keys: Seq[String]) = p.df.groupBy(keys.map(col): _*)

  /** count(field) — non-null count (reference pipeline/influxql.go:175). */
  def count(p: Pipe, keys: Seq[String], field: String, as: String = "count"): DataFrame =
    grouped(p, keys).agg(org.apache.spark.sql.functions.count(col(field)).as(as))

  def sum(p: Pipe, keys: Seq[String], field: String, as: String = "sum"): DataFrame =
    grouped(p, keys).agg(org.apache.spark.sql.functions.sum(col(field)).as(as))

  def mean(p: Pipe, keys: Seq[String], field: String, as: String = "mean"): DataFrame =
    grouped(p, keys).agg(avg(col(field)).as(as))

  /** spread = max - min (reference pipeline/influxql.go:273). */
  def spread(p: Pipe, keys: Seq[String], field: String, as: String = "spread"): DataFrame =
    grouped(p, keys).agg((max(col(field)) - min(col(field))).as(as))

  /** stddev — sample standard deviation (reference pipeline/influxql.go:477). */
  def stddev(p: Pipe, keys: Seq[String], field: String, as: String = "stddev"): DataFrame =
    grouped(p, keys).agg(stddev_samp(col(field)).as(as))

  /** median — exact: middle element, or mean of the two middles for even n
    * (InfluxQL median(); not the selector percentile). Encoded rank-wise so
    * the DuckDB oracle can state the identical algorithm. */
  def median(p: Pipe, keys: Seq[String], field: String, as: String = "median"): DataFrame =
    // exact percentile(0.5) interpolates the two middles for even n — the
    // same mean-of-middles InfluxQL computes — as ONE object-hash
    // aggregate pass instead of two unbounded window functions over a
    // per-key global sort (the windowed form was the bench's slowest
    // aggregate; this is the partial/final shape every other agg uses)
    p.df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($field, 0.5D)").as(as))

  /** mode — most frequent value; ties resolved to the smallest value so the
    * result is deterministic (InfluxQL mode() picks the lowest). */
  def mode(p: Pipe, keys: Seq[String], field: String, as: String = "mode"): DataFrame = {
    val counts = p.df.groupBy((keys :+ field).map(col): _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("__c"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__c").desc, col(field).asc)
    counts
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select((keys.map(col) :+ col(field).as(as)): _*)
  }

  /** distinct — one row per distinct value, sorted for determinism
    * (reference pipeline/influxql.go:200; first-seen order is
    * nondeterministic there, we pin ascending). */
  def distinct(p: Pipe, keys: Seq[String], field: String, as: String = "distinct"): DataFrame =
    p.df.select((keys.map(col) :+ col(field).as(as)): _*).dropDuplicates()

  /** first/last — value at the earliest/latest time (selector; reference
    * pipeline/influxql.go:312/337). Tie-break: smallest id. */
  def first(p: Pipe, keys: Seq[String], field: String, as: String = "first"): DataFrame = {
    val ord = struct(col(p.timeCol) +: p.idCol.map(col).toSeq: _*)
    grouped(p, keys).agg(
      min_by(col(field), ord).as(as),
      min(col(p.timeCol)).as("time"))
  }

  def last(p: Pipe, keys: Seq[String], field: String, as: String = "last"): DataFrame = {
    val ord = struct(col(p.timeCol) +: p.idCol.map(col).toSeq: _*)
    grouped(p, keys).agg(
      max_by(col(field), ord).as(as),
      max(col(p.timeCol)).as("time"))
  }

  /** min/max — selector keeping the winning point's time
    * (earliest such point on ties). */
  def minSel(p: Pipe, keys: Seq[String], field: String, as: String = "min"): DataFrame =
    grouped(p, keys).agg(
      min(col(field)).as(as),
      min_by(col(p.timeCol), struct(col(field) +: col(p.timeCol) +: p.idCol.map(col).toSeq: _*)).as("time"))

  def maxSel(p: Pipe, keys: Seq[String], field: String, as: String = "max"): DataFrame =
    grouped(p, keys).agg(
      max(col(field)).as(as),
      // latest-possible tiebreak mirrors InfluxQL keeping the first maximal
      // point: order by (value asc, time asc, id asc) and take the max value
      // but the earliest time among maxima.
      min_by(col(p.timeCol), struct((col(field) * lit(-1)) +: col(p.timeCol) +: p.idCol.map(col).toSeq: _*)).as("time"))

  /** percentile — InfluxQL nearest-rank: values sorted ascending,
    * rank = floor(n * pct/100 + 0.5) (1-based); no result when rank < 1.
    * (InfluxDB FloatPercentileReduceSlice semantics.) */
  def percentile(p: Pipe, keys: Seq[String], field: String, pct: Double, as: String = "percentile"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(field) +: col(p.timeCol) +: p.idCol.map(col).toSeq: _*)
    p.df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", org.apache.spark.sql.functions.count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("__rn") === floor(col("__n") * pct / 100 + 0.5).cast("int"))
      .select((keys.map(col) :+ col(field).as(as)): _*)
  }

  /** top/bottom — n points by value per group (reference
    * pipeline/influxql.go:419/446); deterministic tie-break (time, id).
    * `carry` keeps extra columns of the winning points — the reference's
    * `top(n, field, tag…)` extra-tags surface. */
  def top(p: Pipe, keys: Seq[String], field: String, n: Int, as: String = "top",
      carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(field).desc +: col(p.timeCol).asc +: p.idCol.map(c => col(c).asc).toSeq: _*)
    p.df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= n)
      .select((keys.map(col) :+ col(p.timeCol)) ++ carry.map(col) ++
        Seq(col(field).as(as), col("__rk").cast("long").as("rk")): _*)
  }

  def bottom(p: Pipe, keys: Seq[String], field: String, n: Int, as: String = "bottom",
      carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(field).asc +: col(p.timeCol).asc +: p.idCol.map(c => col(c).asc).toSeq: _*)
    p.df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= n)
      .select((keys.map(col) :+ col(p.timeCol)) ++ carry.map(col) ++
        Seq(col(field).as(as), col("__rk").cast("long").as("rk")): _*)
  }
}
