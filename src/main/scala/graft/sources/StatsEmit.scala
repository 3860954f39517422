package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The stats service rendered as data (reference
  * `services/stats/service.go:104-136` + `server/vars/stats.go:74-141`):
  * every `interval` the service snapshots all registered statistics and
  * collects one point per statistic into the stream — measurement = the
  * stat's name, tags = the stat's tags overlaid with the cluster/server/
  * host ID tags, fields = the stat's current values, point time = the
  * tick time, db/rp from config (`_kapacitor`/`autogen` defaults).
  *
  * Batch rendering over a HISTORY of observations: the service's output
  * at each tick is, per statistic field, the value of the latest
  * observation at or before the tick — an as-of fill. Statistics with no
  * observation yet emit nothing (GetStatsData skips `len(values)==0`
  * entries, stats.go:131-133).
  *
  * Scale shape: ONE shuffle on the stat key (name + tags + field); the
  * tick grid is `sequence()`+`explode` column arithmetic (no driver
  * loop); the per-key as-of fill is a running `last(ignoreNulls)` window
  * whose partition holds that key's observations + fires only — the stat
  * registry is bounded (it is the set of registered expvars, not the
  * data), so no partition grows with corpus size.
  */
object StatsEmit {

  /** The ticker grid: fires at every multiple of `intervalUs` in
    * `(minUs, maxUs]`, where min/max are read off `bounds` (a one-row
    * frame with `mn`/`mx` µs columns) — the batch restatement of "ticker
    * started when the service opened". Column arithmetic only. */
  def tickGrid(bounds: DataFrame, intervalUs: Long): DataFrame = {
    require(intervalUs > 0, "stats interval must be positive")
    bounds.select(explode(sequence(
      ((floor(col("mn") / intervalUs) + 1) * intervalUs).cast("long"),
      col("mx").cast("long"),
      lit(intervalUs))).as("fire_us"))
  }

  /** One emitted point-field per (fire, statistic key): the latest
    * observed value at or before the fire.
    *
    * `obs` — observation history with `timeCol` (µs), the `keyCols`
    * (statistic name + tag columns + field name), and `valueCol`
    * (double). CONTRACT: at most one observation per (key, time) — the
    * caller collapses same-timestamp updates to the current value first
    * (the service reads the LIVE expvar at fire time; two updates inside
    * one µs are indistinguishable on the wire).
    *
    * `fires` — a `fire_us` frame (from [[tickGrid]] or hand-built).
    *
    * Output: `time_us` (the fire), `db`, `rp`, the key columns, the ID
    * tag columns (vars/stats.go:44-47 overlay — every point carries
    * cluster_id/server_id/host), `valueCol`. */
  def statsPoints(obs: DataFrame, keyCols: Seq[String], fires: DataFrame,
      db: String = "_kapacitor", rp: String = "autogen",
      idTags: Map[String, String] = Map.empty,
      timeCol: String = "time_us", valueCol: String = "value",
      keysOpt: Option[DataFrame] = None): DataFrame = {
    require(keyCols.nonEmpty, "statsPoints needs at least the stat-name key")
    // The registry (distinct stat keys). Default: derived from obs — which
    // re-executes obs's whole upstream for a handful of rows when obs is a
    // derived pipeline (the gate query's obs is groupBy→window→explode;
    // only the groupBy exchange is reusable). Callers that can state the
    // registry from a CHEAPER equivalent branch (the key set is fixed by
    // construction well before the expensive tail) pass it via `keysOpt` —
    // it must be exactly obs's distinct key set.
    val keys = keysOpt.getOrElse(obs.select(keyCols.map(col): _*).distinct())
    // registry × grid: the registry is bounded, broadcast it over the grid
    val fireRows = fires.crossJoin(broadcast(keys))
      .select((col("fire_us").as(timeCol) +: keyCols.map(col)) :+
        lit(null).cast("double").as(valueCol) :+ lit(1).as("__src"): _*)
    val obsRows = obs
      .select((col(timeCol) +: keyCols.map(col)) :+
        col(valueCol).cast("double").as(valueCol) :+ lit(0).as("__src"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idCols: Seq[Column] =
      idTags.toSeq.sortBy(_._1).map { case (k, v) => lit(v).as(k) }
    obsRows.unionByName(fireRows)
      .withColumn("__v", last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("__src") === 1 && col("__v").isNotNull)
      .select((col(timeCol) +: lit(db).as("db") +: lit(rp).as("rp") +:
        keyCols.map(col)) ++ idCols :+ col("__v").as(valueCol): _*)
  }

  /** The global `kapacitor` entry's `uptime` field (stats.go:138-139):
    * one point per fire, value = seconds since service start (`startUs`
    * read off the same one-row `bounds` frame's `mn`). */
  def uptimePoints(bounds: DataFrame, intervalUs: Long,
      db: String = "_kapacitor", rp: String = "autogen",
      idTags: Map[String, String] = Map.empty): DataFrame = {
    val idCols: Seq[Column] =
      idTags.toSeq.sortBy(_._1).map { case (k, v) => lit(v).as(k) }
    tickGrid(bounds, intervalUs)
      .crossJoin(broadcast(bounds.select(col("mn"))))
      .select((col("fire_us").as("time_us") +: lit(db).as("db") +:
        lit(rp).as("rp") +: lit("kapacitor").as("name") +:
        lit("uptime").as("field") +: idCols) :+
        ((col("fire_us") - col("mn")) / 1000000.0).as("value"): _*)
  }
}
