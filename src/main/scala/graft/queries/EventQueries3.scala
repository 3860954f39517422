package graft.queries

import graft.functions.AlertTemplates
import graft.operators.{Deadman, Fill, Sideload}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave 3: sideload overlay, stats/deadman, alert message templating
  * (SURVEY §2.6/2.7). Same conventions as [[EventQueries]]. */
object EventQueries3 {
  import EventQueries.{pipe, preludeSql}

  private def tusCol = expr("ts_ns DIV 1000")

  // ----------------------------------------------------------- sideload

  /** sideload(): per-event_type weight overlay with a default level
    * (reference sideload.go) — the config "files" are a broadcast table;
    * most-specific level first, constant default last. */
  def sideloadQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val config = Seq(
      ("click", Map("weight" -> "1.5")),
      ("purchase", Map("weight" -> "10.0")),
      ("error", Map("weight" -> "0.25")),
      ("default", Map("weight" -> "1.0")))
      .toDF("key", "values")
    val loaded = Sideload.sideload(
      pipe(s, dir).df,
      levels = Seq(col("event_type"), lit("default")),
      config = config,
      fields = Map("weight" -> lit("1.0")))
    loaded
      .withColumn("weight", col("weight").cast("double"))
      .withColumn("weighted_v", round(col("value") * col("weight"), 6))
      .select(col("event_id"), col("event_type"), col("weight"), col("weighted_v"))
      .orderBy("event_id")
  }
  val sideloadSql: String =
    """SELECT event_id, event_type,
       CAST(CASE WHEN event_type = 'click' THEN '1.5' WHEN event_type = 'purchase' THEN '10.0'
            WHEN event_type = 'error' THEN '0.25' ELSE '1.0' END AS DOUBLE) AS weight,
       round(value * CAST(CASE WHEN event_type = 'click' THEN '1.5' WHEN event_type = 'purchase' THEN '10.0'
            WHEN event_type = 'error' THEN '0.25' ELSE '1.0' END AS DOUBLE), 6) AS weighted_v
       FROM events ORDER BY event_id""".replaceAll("\\s+", " ")

  // ------------------------------------------------------ stats/deadman

  /** deadman(2, 1h) per event_type: zero-filled hourly throughput with a
    * CRITICAL level at or below the threshold (reference
    * pipeline/node.go:282-312). */
  def deadmanQ(s: SparkSession, dir: String): DataFrame =
    Deadman.deadman(
      pipe(s, dir).df.withColumn("tus", tusCol),
      "tus", "event_type", 3600, 2)
      .orderBy("event_type", "bucket_s")
  val deadmanSql: String =
    s"""$preludeSql, b AS (
         SELECT event_type, CAST(floor(tus/1000000.0/3600)*3600 AS BIGINT) AS bs FROM e),
       r AS (SELECT unnest(generate_series(
         (SELECT min(bs) FROM b), (SELECT max(bs) FROM b), 3600)) AS bucket_s),
       g AS (SELECT DISTINCT event_type FROM b),
       c AS (SELECT event_type, bs AS bucket_s, count(*) AS emitted FROM b GROUP BY 1, 2)
       SELECT g.event_type, r.bucket_s, coalesce(c.emitted, 0) AS emitted,
              CASE WHEN coalesce(c.emitted, 0) <= 2 THEN 'CRITICAL' ELSE 'OK' END AS level
       FROM g CROSS JOIN r LEFT JOIN c ON c.event_type = g.event_type AND c.bucket_s = r.bucket_s
       ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // --------------------------------------------------- duration sampling

  /** sample(30m) after truncating times to the minute: the reference keeps
    * only points lying exactly on a duration boundary (sample.go:100-103,
    * `t.Truncate(d) == t`) — event timestamps are µs-grained, so a minute
    * truncation upstream makes the boundary population non-empty while the
    * operator under test stays reference-exact. */
  def sampleDurationQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
    val truncated = p.copy(df = p.df.withColumn("time", date_trunc("minute", col("time"))))
      .sampleEvery(1800)
    truncated.df.select(col("event_id"), col("event_type"),
      unix_micros(col("time")).as("time_us"), col("value"))
      .orderBy("event_id")
  }
  val sampleDurationSql: String =
    s"""$preludeSql SELECT event_id, event_type,
         epoch_us(date_trunc('minute', make_timestamp(tus))) AS time_us, value FROM e
       WHERE epoch_us(date_trunc('minute', make_timestamp(tus))) % 1800000000 = 0
       ORDER BY event_id""".replaceAll("\\s+", " ")

  // ----------------------------------------------------------- quiet eval

  /** eval().quiet() semantics: division that degrades to null instead of
    * erroring (reference eval.go .quiet(); Spark try_* family under ANSI). */
  def evalQuietQ(s: SparkSession, dir: String): DataFrame = {
    // raw quotient, no rounding: IEEE division of identical inputs is
    // bit-identical across engines, while rounding a quotient with a
    // dyadic denominator (floor-100 ∈ {2,4,8,…}) hits exact .5 ties where
    // Spark's BigDecimal HALF_UP and DuckDB's scaled-double round disagree
    val p = pipe(s, dir).evalQuiet(
      "ratio" -> try_divide(col("value"), floor(col("value")) - 100))
    p.df.select(col("event_id"), col("ratio")).orderBy("event_id")
  }
  val evalQuietSql: String =
    """SELECT event_id,
       CASE WHEN floor(value) - 100 = 0 THEN NULL
            ELSE value / (floor(value) - 100) END AS ratio
       FROM events ORDER BY event_id""".replaceAll("\\s+", " ")

  // ------------------------------------------- per-point (every=0) window

  /** window().period(1h).every(0): every point carries the count/mean of
    * its trailing hour (reference window.go every=0 right-aligned emit). */
  def windowPerPointQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).windowPerPoint(3600, "value")
    p.df.select(
      col("event_type"), unix_micros(col("time")).as("time_us"),
      col("w_cnt").as("cnt"), round(col("w_mean"), 6).as("mean_v"))
      .orderBy("event_type", "time_us")
  }
  val windowPerPointSql: String =
    s"""$preludeSql SELECT event_type, tus AS time_us,
       count(*) OVER w AS cnt, round(avg(value) OVER w, 6) AS mean_v
       FROM e
       WINDOW w AS (PARTITION BY event_type ORDER BY tus
                    RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
       ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // ----------------------------------------------------------- fill

  private def filledBase(s: SparkSession, dir: String): DataFrame =
    Fill.bucketedMin(
      pipe(s, dir).df.withColumn("tus", tusCol).filter(col("value") > 150),
      "tus", "event_type", "value", 3600)

  private val filledBaseSql =
    s"""$preludeSql, f AS (SELECT * FROM e WHERE value > 150),
       b AS (SELECT event_type, CAST(floor(tus/1000000.0/3600)*3600 AS BIGINT) AS bs, value FROM f),
       r AS (SELECT unnest(generate_series(
         (SELECT min(bs) FROM b), (SELECT max(bs) FROM b), 3600)) AS bucket_s),
       g AS (SELECT DISTINCT event_type FROM b),
       m AS (SELECT event_type, bs AS bucket_s, min(value) AS v FROM b GROUP BY 1, 2),
       ax AS (SELECT g.event_type, r.bucket_s, m.v
              FROM g CROSS JOIN r LEFT JOIN m ON m.event_type = g.event_type AND m.bucket_s = r.bucket_s)"""

  /** fill(previous): hourly means (sparse after a selective filter) with
    * gaps carried forward (InfluxQL FILL(previous)). */
  def fillPreviousQ(s: SparkSession, dir: String): DataFrame =
    Fill.fillPrevious(filledBase(s, dir), "event_type", "bucket_s", "v")
      .withColumn("v", round(col("v"), 6))
      .orderBy("event_type", "bucket_s")
  val fillPreviousSql: String =
    s"""$filledBaseSql
       SELECT event_type, bucket_s,
              round(last_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY bucket_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v
       FROM ax ORDER BY 1, 2""".replaceAll("\\s+", " ")

  /** fill(linear): gaps interpolated between neighboring observed buckets;
    * edges stay null (InfluxQL FILL(linear)). */
  def fillLinearQ(s: SparkSession, dir: String): DataFrame =
    Fill.fillLinear(filledBase(s, dir), "event_type", "bucket_s", "v")
      .withColumn("v", round(col("v"), 6))
      .orderBy("event_type", "bucket_s")
  val fillLinearSql: String =
    s"""$filledBaseSql
       SELECT event_type, bucket_s,
              round(CASE WHEN v IS NOT NULL THEN v
                    ELSE last_value(v IGNORE NULLS) OVER wb
                       + (first_value(v IGNORE NULLS) OVER wf - last_value(v IGNORE NULLS) OVER wb)
                         * (bucket_s - last_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER wb)
                         / (first_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER wf
                            - last_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER wb)
                    END, 6) AS v
       FROM ax
       WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wf AS (PARTITION BY event_type ORDER BY bucket_s ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // -------------------------------------------------- alert templating

  /** Templated alert messages over classified points (reference
    * alert.go:1349-1422): `{{ .ID }} is {{ .Level }} v={{ index .Fields
    * "v" }}` rendered as one codegen'd concat. */
  def alertMessageQ(s: SparkSession, dir: String): DataFrame = {
    val lvl = when(col("value") > 90, "CRITICAL")
      .when(col("value") > 70, "WARNING")
      .otherwise("OK")
    val d = pipe(s, dir).df
      .withColumn("level", lvl)
      .withColumn("alert_id", concat_ws(":", col("event_type"), col("user_id")))
      .withColumn("fields", map(lit("v"), floor(col("value")).cast("long").cast("string")))
    val msg = AlertTemplates.compile(
      """{{ .ID }} is {{ .Level }} v={{ index .Fields "v" }}""",
      scope = Map("ID" -> col("alert_id"), "Level" -> col("level")),
      fields = Some(col("fields")))
    d.select(col("event_id"), col("level"), msg.as("message")).orderBy("event_id")
  }
  val alertMessageSql: String =
    """SELECT event_id,
       CASE WHEN value > 90 THEN 'CRITICAL' WHEN value > 70 THEN 'WARNING' ELSE 'OK' END AS level,
       event_type || ':' || CAST(user_id AS VARCHAR) || ' is ' ||
       (CASE WHEN value > 90 THEN 'CRITICAL' WHEN value > 70 THEN 'WARNING' ELSE 'OK' END) ||
       ' v=' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS message
       FROM events ORDER BY event_id""".replaceAll("\\s+", " ")
}
