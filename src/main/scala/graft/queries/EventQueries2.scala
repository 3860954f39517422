package graft.queries

import graft.api.Pipe
import graft.functions.TickFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave 2: reshaping, state tracking, join, alert classification
  * (SURVEY §2.2/2.3/2.6/2.7). Same conventions as [[EventQueries]]. */
object EventQueries2 {
  import EventQueries.{pipe, preludeSql}

  private def tusCol = expr("ts_ns DIV 1000")

  // ------------------------------------------------------- changeDetect

  /** changeDetect on event_type per user (reference change_detect.go). */
  def changeDetectQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).groupBy("user_id").changeDetect("event_type")
    p.df.select(col("user_id"), unix_micros(col("time")).as("time_us"), col("event_type"))
      .orderBy("user_id", "time_us")
  }
  val changeDetectSql: String =
    s"""$preludeSql SELECT user_id, tus AS time_us, event_type FROM e
       QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) = 1
            OR lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS DISTINCT FROM event_type
       ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // ----------------------------------------------------- state tracking

  private val stateRunSql =
    s"""$preludeSql, f AS (
       SELECT *, CASE WHEN value > 50 THEN 1 ELSE 0 END AS p,
              CASE WHEN lag(CASE WHEN value > 50 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY tus, event_id)
                   IS DISTINCT FROM (CASE WHEN value > 50 THEN 1 ELSE 0 END)
                   THEN 1 ELSE 0 END AS flip
       FROM e),
       r AS (SELECT *, sum(flip) OVER (PARTITION BY event_type ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM f)"""

  /** stateDuration(value > 50) per event_type (reference state_tracking.go). */
  def stateDurationQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).stateDuration(col("value") > 50, "sd", 1.0)
    p.df.select(col("event_type"), unix_micros(col("time")).as("time_us"),
      round(col("sd"), 6).as("sd"))
      .orderBy("event_type", "time_us")
  }
  val stateDurationSql: String =
    s"""$stateRunSql
       SELECT event_type, tus AS time_us,
              CASE WHEN p = 1 THEN round((tus - min(tus) OVER (PARTITION BY event_type, run)) / 1000000.0, 6)
                   ELSE -1.0 END AS sd
       FROM r ORDER BY 1, 2""".replaceAll("\\s+", " ")

  /** stateCount(value > 50) per event_type. */
  def stateCountQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).stateCount(col("value") > 50, "sc")
    p.df.select(col("event_type"), unix_micros(col("time")).as("time_us"), col("sc"))
      .orderBy("event_type", "time_us")
  }
  val stateCountSql: String =
    s"""$stateRunSql
       SELECT event_type, tus AS time_us,
              CASE WHEN p = 1 THEN row_number() OVER (PARTITION BY event_type, run ORDER BY tus, event_id)
                   ELSE -1 END AS sc
       FROM r ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // -------------------------------------------------------- sample/shift

  /** sample(10): every 10th point per event_type (reference sample.go). */
  def sampleQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).sampleN(10)
    p.df.select(col("event_id"), col("event_type"), unix_micros(col("time")).as("time_us"), col("value"))
      .orderBy("event_id")
  }
  val sampleSql: String =
    s"""$preludeSql SELECT event_id, event_type, tus AS time_us, value FROM e
       QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY tus, event_id) % 10 = 1
       ORDER BY event_id""".replaceAll("\\s+", " ")

  /** shift(+1h) (reference shift.go). */
  def shiftQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).shift(3600)
    p.df.select(col("event_id"), unix_micros(col("time")).as("time_us"))
      .orderBy("event_id")
  }
  val shiftSql: String =
    s"$preludeSql SELECT event_id, tus + 3600000000 AS time_us FROM e ORDER BY event_id"

  // ----------------------------------------------------- default/delete

  /** default().field + delete().field (reference default.go, delete.go):
    * null out values > 195, default them to 0, drop props. */
  def defaultDeleteQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
      .eval("v" -> when(col("value") > 195, lit(null)).otherwise(col("value")))
      .default("v" -> 0.0)
      .delete("props", "ts_ns", "value")
    p.df.select(col("event_id"), col("v")).orderBy("event_id")
  }
  val defaultDeleteSql: String =
    """SELECT event_id, coalesce(CASE WHEN value > 195 THEN NULL ELSE value END, 0.0) AS v
       FROM events ORDER BY event_id""".replaceAll("\\s+", " ")

  // ------------------------------------------------------------- union

  /** union of two filtered streams with a rename (reference union.go). */
  def unionQ(s: SparkSession, dir: String): DataFrame = {
    val base = pipe(s, dir)
    val purchases = base.where(col("event_type") === "purchase")
      .eval("stream" -> lit("p"))
    val errors = base.where(col("event_type") === "error")
      .eval("stream" -> lit("e"))
    purchases.union(errors).df
      .select(col("event_id"), col("stream"), col("value"))
      .orderBy("event_id")
  }
  val unionSql: String =
    """SELECT event_id, 'p' AS stream, value FROM events WHERE event_type = 'purchase'
       UNION ALL
       SELECT event_id, 'e' AS stream, value FROM events WHERE event_type = 'error'
       ORDER BY event_id""".replaceAll("\\s+", " ")

  // -------------------------------------------------------------- join

  /** join with 60s tolerance on user_id: purchase × click
    * (reference join.go tolerance/fill). */
  def joinToleranceQ(s: SparkSession, dir: String): DataFrame = {
    val base = pipe(s, dir)
    val p = base.where(col("event_type") === "purchase").delete("props", "ts_ns", "event_type")
    val c = base.where(col("event_type") === "click").delete("props", "ts_ns", "event_type")
    p.joinTolerance(c, 60, ("p", "c"), Seq("user_id"))
      .select(col("user_id"), col("jt_s"), col("p_event_id"), col("c_event_id"),
        col("p_value"), col("c_value"))
      .orderBy("user_id", "jt_s", "p_event_id", "c_event_id")
  }
  val joinToleranceSql: String =
    s"""$preludeSql,
       p AS (SELECT user_id, CAST(floor(tus/1000000.0/60 + 0.5)*60 AS BIGINT) AS jt_s,
                    event_id AS p_event_id, value AS p_value FROM e WHERE event_type = 'purchase'),
       c AS (SELECT user_id, CAST(floor(tus/1000000.0/60 + 0.5)*60 AS BIGINT) AS jt_s,
                    event_id AS c_event_id, value AS c_value FROM e WHERE event_type = 'click')
       SELECT user_id, jt_s, p_event_id, c_event_id, p_value, c_value
       FROM p JOIN c USING (user_id, jt_s)
       ORDER BY 1, 2, 3, 4""".replaceAll("\\s+", " ")

  /** joinToleranceOrdered: the reference's sequential joinset pairing —
    * within a rounded bucket the i-th purchase pairs the i-th click
    * (join.go; pinned by the JoinTolerance golden's two t=6 rows). */
  def joinOrderedQ(s: SparkSession, dir: String): DataFrame = {
    val base = pipe(s, dir)
    val p = base.where(col("event_type") === "purchase").delete("props", "ts_ns", "event_type")
    val c = base.where(col("event_type") === "click").delete("props", "ts_ns", "event_type")
    p.joinToleranceOrdered(c, 600, ("p", "c"), Seq("user_id"))
      .select(col("user_id"), col("jt_s"), col("p_event_id"), col("c_event_id"))
      .orderBy("user_id", "jt_s", "p_event_id")
  }
  val joinOrderedSql: String =
    s"""$preludeSql,
       p AS (SELECT user_id, CAST(floor(tus/1000000.0/600 + 0.5)*600 AS BIGINT) AS jt_s,
                    event_id AS p_event_id,
                    row_number() OVER (PARTITION BY user_id, CAST(floor(tus/1000000.0/600 + 0.5)*600 AS BIGINT)
                                       ORDER BY tus, event_id) AS rk
             FROM e WHERE event_type = 'purchase'),
       c AS (SELECT user_id, CAST(floor(tus/1000000.0/600 + 0.5)*600 AS BIGINT) AS jt_s,
                    event_id AS c_event_id,
                    row_number() OVER (PARTITION BY user_id, CAST(floor(tus/1000000.0/600 + 0.5)*600 AS BIGINT)
                                       ORDER BY tus, event_id) AS rk
             FROM e WHERE event_type = 'click')
       SELECT user_id, jt_s, p_event_id, c_event_id
       FROM p JOIN c USING (user_id, jt_s, rk)
       ORDER BY 1, 2, 3""".replaceAll("\\s+", " ")

  // ------------------------------------------------------------- alert

  /** 3-level alert classification info/warn/crit (reference
    * alert.go:915-949 determineLevel). */
  def alertLevelsQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).eval(
      "level" -> when(col("value") > 90, "CRITICAL")
        .when(col("value") > 70, "WARNING")
        .when(col("value") > 50, "INFO")
        .otherwise("OK"),
      "alert_id" -> concat_ws(":", col("event_type"), col("user_id")))
    p.df.select(col("event_id"), col("alert_id"), col("level")).orderBy("event_id")
  }
  val alertLevelsSql: String =
    """SELECT event_id, event_type || ':' || CAST(user_id AS VARCHAR) AS alert_id,
       CASE WHEN value > 90 THEN 'CRITICAL' WHEN value > 70 THEN 'WARNING'
            WHEN value > 50 THEN 'INFO' ELSE 'OK' END AS level
       FROM events ORDER BY event_id""".replaceAll("\\s+", " ")

  /** stateChangesOnly rendering: alert events only when the level differs
    * from the group's previous level (reference alert.go:1024-1130). */
  def alertStateChangesQ(s: SparkSession, dir: String): DataFrame = {
    val lvl = when(col("value") > 90, "CRITICAL")
      .when(col("value") > 70, "WARNING")
      .when(col("value") > 50, "INFO")
      .otherwise("OK")
    val p = pipe(s, dir).eval("level" -> lvl).changeDetect("level")
    p.df.select(col("event_type"), unix_micros(col("time")).as("time_us"), col("level"))
      .orderBy("event_type", "time_us")
  }
  val alertStateChangesSql: String =
    s"""$preludeSql, l AS (
       SELECT event_type, tus, event_id,
              CASE WHEN value > 90 THEN 'CRITICAL' WHEN value > 70 THEN 'WARNING'
                   WHEN value > 50 THEN 'INFO' ELSE 'OK' END AS level
       FROM e)
       SELECT event_type, tus AS time_us, level FROM l
       QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY tus, event_id) = 1
            OR lag(level) OVER (PARTITION BY event_type ORDER BY tus, event_id) IS DISTINCT FROM level
       ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // ---------------------------------------------------- sliding window

  /** window().period(2h).every(1h) + count/mean (reference window.go:80-224)
    * via Spark's sliding window generator. */
  def windowSlidingQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).windowSliding(7200, 3600)
    p.df.groupBy(col("event_type"), col("wstart_s"))
      .agg(count(lit(1)).as("cnt"), round(avg("value"), 6).as("mean_v"))
      .orderBy("event_type", "wstart_s")
  }
  val windowSlidingSql: String =
    // each point covers exactly the two hourly-aligned 2h windows that
    // contain it — derived from the point itself, so the oracle follows the
    // data wherever its time range moves (no hardcoded bucket range)
    s"""$preludeSql, c AS (
       SELECT event_type, value,
              unnest([CAST(floor(tus/1000000.0/3600)*3600 AS BIGINT),
                      CAST(floor(tus/1000000.0/3600)*3600 - 3600 AS BIGINT)]) AS wstart_s
       FROM e)
       SELECT event_type, wstart_s, count(*) AS cnt, round(avg(value), 6) AS mean_v
       FROM c GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // ----------------------------------------------------------- flatten

  /** flatten().on('event_type') with 1m tolerance (reference
    * flatten.go:22-254): one row per (user, minute) with per-type value
    * columns named `<type>_value`. */
  def flattenQ(s: SparkSession, dir: String): DataFrame = {
    val d = pipe(s, dir).df
      .withColumn("tus", tusCol)
      .withColumn("minute_s", (floor(col("tus") / 1000000.0 / 60) * 60).cast("long"))
    val types = Seq("click", "view", "purchase", "signup", "error")
    // zero-padded string ordering key (tus, event_id) — lexicographic order
    // equals numeric order and cannot overflow for any timestamp, unlike an
    // arithmetic packing; mirrors the oracle's arg_min key, which cannot be
    // a struct in DuckDB
    val ordKey = format_string("%020d%010d", col("tus"), col("event_id"))
    d.withColumn("__ord", ordKey)
      .groupBy(col("user_id"), col("minute_s"))
      .pivot("event_type", types)
      .agg(min_by(col("value"), col("__ord")))
      .select(col("user_id") +: col("minute_s") +: types.map(t => col(t).as(s"${t}_value")): _*)
      .orderBy("user_id", "minute_s")
  }
  val flattenSql: String =
    s"""$preludeSql, m AS (SELECT *, CAST(floor(tus/1000000.0/60)*60 AS BIGINT) AS minute_s,
              printf('%020d%010d', tus, event_id) AS ord FROM e)
       SELECT user_id, minute_s,
              arg_min(value, ord) FILTER (WHERE event_type='click') AS click_value,
              arg_min(value, ord) FILTER (WHERE event_type='view') AS view_value,
              arg_min(value, ord) FILTER (WHERE event_type='purchase') AS purchase_value,
              arg_min(value, ord) FILTER (WHERE event_type='signup') AS signup_value,
              arg_min(value, ord) FILTER (WHERE event_type='error') AS error_value
       FROM m GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " ")

  // ----------------------------------------------------------- combine

  /** combine(): pairs of high-value points within the same hour+group
    * (reference combine.go:142-231) — k-combinations as a self-join with
    * ordinal `<` to avoid duplicates. */
  def combineQ(s: SparkSession, dir: String): DataFrame = {
    val d = pipe(s, dir).df
      .withColumn("tus", tusCol)
      .withColumn("bucket_s", (floor(col("tus") / 1000000.0 / 3600) * 3600).cast("long"))
      .filter(col("value") > 90)
      .select(col("event_type"), col("bucket_s"), col("event_id"), col("value"))
    val a = d.select(col("event_type"), col("bucket_s"), col("event_id").as("id_a"), col("value").as("v_a"))
    val b = d.select(col("event_type"), col("bucket_s"), col("event_id").as("id_b"), col("value").as("v_b"))
    a.join(b, Seq("event_type", "bucket_s"))
      .filter(col("id_a") < col("id_b"))
      .orderBy("event_type", "bucket_s", "id_a", "id_b")
  }
  val combineSql: String =
    s"""$preludeSql, d AS (
       SELECT event_type, CAST(floor(tus/1000000.0/3600)*3600 AS BIGINT) AS bucket_s, event_id, value
       FROM e WHERE value > 90)
       SELECT a.event_type, a.bucket_s, a.event_id AS id_a, a.value AS v_a, b.event_id AS id_b, b.value AS v_b
       FROM d a JOIN d b ON a.event_type = b.event_type AND a.bucket_s = b.bucket_s AND a.event_id < b.event_id
       ORDER BY 1, 2, 3, 5""".replaceAll("\\s+", " ")

  // ------------------------------------------------------------- sigma

  /** sigma(value) stateful lambda (reference tick/stateful/functions.go:
    * 1131-1177): #stddevs from the running mean, per event_type. */
  def sigmaQ(s: SparkSession, dir: String): DataFrame = {
    val d = pipe(s, dir).df.withColumn("tus", tusCol)
    d.withColumn("sig",
        TickFunctions.sigma(col("value"), Seq(col("event_type")), col("tus"), Seq(col("event_id"))))
      .select(col("event_type"), col("tus").as("time_us"), round(col("sig"), 6).as("sig"))
      .orderBy("event_type", "time_us")
  }
  val sigmaSql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, tus, value,
              avg(value) OVER (PARTITION BY event_type ORDER BY tus, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mu,
              stddev_samp(value) OVER (PARTITION BY event_type ORDER BY tus, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sd
       FROM e)
       SELECT event_type, tus AS time_us,
              round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0 ELSE abs(value - mu) / sd END, 6) AS sig
       FROM r ORDER BY 1, 2""".replaceAll("\\s+", " ")
}
