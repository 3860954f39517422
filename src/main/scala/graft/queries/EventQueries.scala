package graft.queries

import graft.Graft
import graft.api.Pipe
import graft.operators.{HoltWinters, InfluxQL}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kapacitor-parity operator queries over the `events` stream table, each
  * paired with a DuckDB oracle stating the *identical* algorithm
  * (SparkEntry.oracleSql). Conventions that keep the driver's hash-compare
  * honest:
  *   - time points surface as `time_us` (epoch micros, BIGINT both sides);
  *     window buckets as `bucket_s` (epoch seconds, BIGINT);
  *   - every double output is `round(x, 6)`;
  *   - integer-ish outputs are cast to BIGINT on both sides;
  *   - every query ends in a deterministic ORDER BY.
  */
object EventQueries {

  /** Canonical event pipe: time (µs-truncated), per-point id tiebreak. */
  def pipe(s: SparkSession, dir: String): Pipe =
    Pipe(Graft.events(s, dir), timeCol = "time", dims = Seq("event_type"), idCol = Some("event_id"))

  private def tus = expr("ts_ns DIV 1000")

  /** Shared oracle SQL prelude: events with epoch-µs time. */
  val preludeSql: String =
    "WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus FROM events)"

  private def bucketS(every: Long) =
    (floor(col("tus") / 1000000.0 / every) * every).cast("long").as("bucket_s")
  private def bucketSql(every: Long) =
    s"CAST(floor(tus/1000000.0/$every)*$every AS BIGINT)"

  private def withT(p: Pipe): DataFrame = p.df.withColumn("tus", tus)

  // --------------------------------------------------------- aggregates

  def aggHour(s: SparkSession, dir: String, agg: String): DataFrame = {
    val d = withT(pipe(s, dir)).withColumn("bucket_s", bucketS(3600))
    val g = d.groupBy(col("event_type"), col("bucket_s"))
    val out = agg match {
      case "count" => g.agg(count(col("value")).as("cnt"))
      case "sum"   => g.agg(round(sum("value"), 6).as("sum_v"))
      case "mean"  => g.agg(round(avg("value"), 6).as("mean_v"))
    }
    out.orderBy(col("event_type"), col("bucket_s"))
  }

  def aggHourSql(agg: String): String = {
    val e = s"$preludeSql SELECT event_type, ${bucketSql(3600)} AS bucket_s, "
    val a = agg match {
      case "count" => "count(value) AS cnt"
      case "sum"   => "round(sum(value), 6) AS sum_v"
      case "mean"  => "round(avg(value), 6) AS mean_v"
    }
    s"$e$a FROM e GROUP BY 1, 2 ORDER BY 1, 2"
  }

  def spreadDay(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
    val d = withT(p).withColumn("bucket_s", bucketS(86400))
    InfluxQL.spread(p.copy(df = d), Seq("event_type", "bucket_s"), "value", "spread_v")
      .withColumn("spread_v", round(col("spread_v"), 6))
      .orderBy("event_type", "bucket_s")
  }
  val spreadDaySql: String =
    s"$preludeSql SELECT event_type, ${bucketSql(86400)} AS bucket_s, round(max(value)-min(value),6) AS spread_v FROM e GROUP BY 1,2 ORDER BY 1,2"

  def stddevDay(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
    val d = withT(p).withColumn("bucket_s", bucketS(86400))
    InfluxQL.stddev(p.copy(df = d), Seq("event_type", "bucket_s"), "value", "stddev_v")
      .withColumn("stddev_v", round(col("stddev_v"), 6))
      .orderBy("event_type", "bucket_s")
  }
  val stddevDaySql: String =
    s"$preludeSql SELECT event_type, ${bucketSql(86400)} AS bucket_s, round(stddev_samp(value),6) AS stddev_v FROM e GROUP BY 1,2 ORDER BY 1,2"

  def medianDay(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
    val d = withT(p).withColumn("bucket_s", bucketS(86400))
    InfluxQL.median(p.copy(df = d), Seq("event_type", "bucket_s"), "value", "median_v")
      .withColumn("median_v", round(col("median_v"), 6))
      .orderBy("event_type", "bucket_s")
  }
  val medianDaySql: String =
    s"""$preludeSql SELECT event_type, ${bucketSql(86400)} AS bucket_s,
       round(quantile_cont(value, 0.5),6) AS median_v
       FROM e GROUP BY 1,2 ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def modeDay(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
    val d = withT(p).withColumn("bucket_s", bucketS(86400))
    InfluxQL.mode(p.copy(df = d), Seq("event_type", "bucket_s"), "value", "mode_v")
      .orderBy("event_type", "bucket_s")
  }
  val modeDaySql: String =
    s"""$preludeSql, c AS (
       SELECT event_type, ${bucketSql(86400)} AS bucket_s, value, count(*) AS c
       FROM e GROUP BY 1,2,3),
       r AS (SELECT *, row_number() OVER (PARTITION BY event_type, bucket_s ORDER BY c DESC, value ASC) AS rk FROM c)
       SELECT event_type, bucket_s, value AS mode_v FROM r WHERE rk = 1 ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def distinctVals(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
    InfluxQL.distinct(p, Seq("event_type"), "value", "distinct_v")
      .orderBy("event_type", "distinct_v")
  }
  val distinctValsSql: String =
    "SELECT DISTINCT event_type, value AS distinct_v FROM events ORDER BY 1, 2"

  def firstDay(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0).withColumn("bucket_s", bucketS(86400)))
    InfluxQL.first(p, Seq("event_type", "bucket_s"), "value", "first_v")
      .withColumn("time_us", unix_micros(col("time"))).drop("time")
      .orderBy("event_type", "bucket_s")
  }
  val firstDaySql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, ${bucketSql(86400)} AS bucket_s, value, tus,
              row_number() OVER (PARTITION BY event_type, ${bucketSql(86400)} ORDER BY tus, event_id) AS rn,
              min(tus) OVER (PARTITION BY event_type, ${bucketSql(86400)}) AS mt
       FROM e)
       SELECT event_type, bucket_s, value AS first_v, mt AS time_us FROM r WHERE rn = 1 ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def lastDay(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0).withColumn("bucket_s", bucketS(86400)))
    InfluxQL.last(p, Seq("event_type", "bucket_s"), "value", "last_v")
      .withColumn("time_us", unix_micros(col("time"))).drop("time")
      .orderBy("event_type", "bucket_s")
  }
  val lastDaySql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, ${bucketSql(86400)} AS bucket_s, value, tus,
              row_number() OVER (PARTITION BY event_type, ${bucketSql(86400)} ORDER BY tus DESC, event_id DESC) AS rn,
              max(tus) OVER (PARTITION BY event_type, ${bucketSql(86400)}) AS mt
       FROM e)
       SELECT event_type, bucket_s, value AS last_v, mt AS time_us FROM r WHERE rn = 1 ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def minDay(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0).withColumn("bucket_s", bucketS(86400)))
    InfluxQL.minSel(p, Seq("event_type", "bucket_s"), "value", "min_v")
      .withColumn("time_us", unix_micros(col("time"))).drop("time")
      .orderBy("event_type", "bucket_s")
  }
  val minDaySql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, ${bucketSql(86400)} AS bucket_s, value, tus,
              row_number() OVER (PARTITION BY event_type, ${bucketSql(86400)} ORDER BY value ASC, tus ASC, event_id ASC) AS rn
       FROM e)
       SELECT event_type, bucket_s, value AS min_v, tus AS time_us FROM r WHERE rn = 1 ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def maxDay(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0).withColumn("bucket_s", bucketS(86400)))
    InfluxQL.maxSel(p, Seq("event_type", "bucket_s"), "value", "max_v")
      .withColumn("time_us", unix_micros(col("time"))).drop("time")
      .orderBy("event_type", "bucket_s")
  }
  val maxDaySql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, ${bucketSql(86400)} AS bucket_s, value, tus,
              row_number() OVER (PARTITION BY event_type, ${bucketSql(86400)} ORDER BY value DESC, tus ASC, event_id ASC) AS rn
       FROM e)
       SELECT event_type, bucket_s, value AS max_v, tus AS time_us FROM r WHERE rn = 1 ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def percentile90Day(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0).withColumn("bucket_s", bucketS(86400)))
    InfluxQL.percentile(p, Seq("event_type", "bucket_s"), "value", 90.0, "p90_v")
      .orderBy("event_type", "bucket_s")
  }
  val percentile90DaySql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, ${bucketSql(86400)} AS bucket_s, value,
              row_number() OVER (PARTITION BY event_type, ${bucketSql(86400)} ORDER BY value, tus, event_id) AS rn,
              count(*) OVER (PARTITION BY event_type, ${bucketSql(86400)}) AS n
       FROM e)
       SELECT event_type, bucket_s, value AS p90_v FROM r
       WHERE rn = CAST(floor(n * 90.0/100 + 0.5) AS INTEGER) ORDER BY 1,2"""
      .stripMargin.replaceAll("\\s+", " ")

  def top3(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0))
    InfluxQL.top(p, Seq("event_type"), "value", 3, "top_v")
      .withColumn("time_us", unix_micros(col("time"))).drop("time")
      .orderBy("event_type", "rk")
  }
  val top3Sql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, tus, value,
              row_number() OVER (PARTITION BY event_type ORDER BY value DESC, tus ASC, event_id ASC) AS rk
       FROM e)
       SELECT event_type, value AS top_v, CAST(rk AS BIGINT) AS rk, tus AS time_us FROM r WHERE rk <= 3 ORDER BY event_type, rk"""
      .stripMargin.replaceAll("\\s+", " ")

  def bottom3(s: SparkSession, dir: String): DataFrame = {
    val p0 = pipe(s, dir)
    val p = p0.copy(df = withT(p0))
    InfluxQL.bottom(p, Seq("event_type"), "value", 3, "bottom_v")
      .withColumn("time_us", unix_micros(col("time"))).drop("time")
      .orderBy("event_type", "rk")
  }
  val bottom3Sql: String =
    s"""$preludeSql, r AS (
       SELECT event_type, tus, value,
              row_number() OVER (PARTITION BY event_type ORDER BY value ASC, tus ASC, event_id ASC) AS rk
       FROM e)
       SELECT event_type, value AS bottom_v, CAST(rk AS BIGINT) AS rk, tus AS time_us FROM r WHERE rk <= 3 ORDER BY event_type, rk"""
      .stripMargin.replaceAll("\\s+", " ")

  // ------------------------------------------------- stream transformations

  private def pointOut(df: DataFrame, resCol: String): DataFrame =
    df.select(
      col("event_type"),
      unix_micros(col("time")).as("time_us"),
      round(col(resCol), 6).as(resCol))
      .orderBy("event_type", "time_us")

  private val overGT =
    "OVER (PARTITION BY event_type ORDER BY tus, event_id)"

  def elapsedQ(s: SparkSession, dir: String): DataFrame =
    pointOut(pipe(s, dir).elapsed(1.0, "elapsed_s").df, "elapsed_s")
  val elapsedSql: String =
    s"""$preludeSql SELECT event_type, tus AS time_us,
       round((tus - lag(tus) $overGT) / 1000000.0, 6) AS elapsed_s
       FROM e QUALIFY elapsed_s IS NOT NULL ORDER BY 1, 2"""
      .stripMargin.replaceAll("\\s+", " ")

  def differenceQ(s: SparkSession, dir: String): DataFrame =
    pointOut(pipe(s, dir).difference("value", "diff_v").df, "diff_v")
  val differenceSql: String =
    s"""$preludeSql SELECT event_type, tus AS time_us,
       round(value - lag(value) $overGT, 6) AS diff_v
       FROM e QUALIFY diff_v IS NOT NULL ORDER BY 1, 2"""
      .stripMargin.replaceAll("\\s+", " ")

  def derivativeQ(s: SparkSession, dir: String): DataFrame =
    pointOut(pipe(s, dir).derivative("value", 60.0, nonNegative = false, "deriv_v").df, "deriv_v")
  val derivativeSql: String =
    // nullif guard: zero-elapsed pairs emit nothing (derivative.go:147-150)
    s"""$preludeSql SELECT event_type, tus AS time_us,
       round((value - lag(value) $overGT) / (nullif(tus - lag(tus) $overGT, 0) / 60000000.0), 6) AS deriv_v
       FROM e QUALIFY deriv_v IS NOT NULL ORDER BY 1, 2"""
      .stripMargin.replaceAll("\\s+", " ")

  def movingAverageQ(s: SparkSession, dir: String): DataFrame =
    pointOut(pipe(s, dir).movingAverage("value", 5, "ma_v").df, "ma_v")
  val movingAverageSql: String =
    s"""$preludeSql SELECT event_type, tus AS time_us,
       round(avg(value) OVER (PARTITION BY event_type ORDER BY tus, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma_v,
       row_number() $overGT AS rn
       FROM e QUALIFY rn >= 5 ORDER BY 1, 2"""
      .stripMargin.replaceAll("\\s+", " ") match {
      case q => s"SELECT event_type, time_us, ma_v FROM ($q)"
    }

  def cumulativeSumQ(s: SparkSession, dir: String): DataFrame =
    pointOut(pipe(s, dir).cumulativeSum("value", "csum_v").df, "csum_v")
  val cumulativeSumSql: String =
    s"""$preludeSql SELECT event_type, tus AS time_us,
       round(sum(value) OVER (PARTITION BY event_type ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS csum_v
       FROM e ORDER BY 1, 2"""
      .stripMargin.replaceAll("\\s+", " ")

  // --------------------------------------------------------------- misc

  /** where + eval chain (reference where.go + eval.go). */
  def whereEvalQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir)
      .where(col("value") > 50 && col("event_type") =!= "error")
      .eval(
        "v2" -> round(col("value") * 2 + 1, 6),
        "vlog" -> round(log(col("value")) + col("v2") * 0.001, 6))
    p.df.select(col("event_id"), col("event_type"), col("v2"), col("vlog"))
      .orderBy("event_id")
  }
  val whereEvalSql: String =
    """SELECT event_id, event_type, round(value*2+1, 6) AS v2,
       round(ln(value) + round(value*2+1, 6)*0.001, 6) AS vlog
       FROM events WHERE value > 50 AND event_type <> 'error' ORDER BY event_id"""
      .stripMargin.replaceAll("\\s+", " ")

  /** holtWinters forecast (no SQL oracle — custom numeric fit). Forecast 3
    * daily means ahead per event_type over the daily mean series, m=7
    * weekly seasonality. Auto-dispatched three ways (one probe job): a
    * driver-pool fit when total work is tiny (this SF's 5 groups × ~30
    * points), the (group × seed) restart fan-out for few fat groups that
    * would idle the cluster under per-group tasks, the repartitioned serial
    * Aggregator when groups alone saturate the cluster. */
  def holtWintersQ(s: SparkSession, dir: String): DataFrame = {
    val d = withT(pipe(s, dir)).withColumn("bucket_s", bucketS(86400))
      .groupBy("event_type", "bucket_s").agg(avg("value").as("mean_v"))
    val fc = HoltWinters.holtWintersAuto(
      d, "event_type", "bucket_s", "mean_v", 3, 7, 86400L)
    fc.withColumn("step",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("bucket_s")) - 1).cast("int"))
      .select(col("event_type"), col("step"), round(col("mean_v"), 6).as("forecast"))
      .orderBy("event_type", "step")
  }

  /** Value-equality cross-check for [[holtWintersQ]] — the one query DuckDB
    * cannot oracle (the Nelder-Mead fit is not SQL-expressible). Recomputes
    * every group's forecast with the serial exact recursion
    * ([[HoltWinters.run]]) on the driver-collected daily-mean series and
    * compares against what the auto-dispatched distributed query emitted.
    * Verify calls this so the correctness gate asserts VALUES for
    * q_holt_winters, not just rows>0. */
  def holtWintersCrossCheck(s: SparkSession, dir: String): Boolean = {
    val d = withT(pipe(s, dir)).withColumn("bucket_s", bucketS(86400))
      .groupBy("event_type", "bucket_s").agg(avg("value").as("mean_v"))
    val series = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = series.toSeq.flatMap { case (g, rows) =>
      val tvs = rows.sortBy(_._2).map(r => HoltWinters.TV(r._2, r._3)).toArray
      HoltWinters.run(tvs, 3, 7, 86400L, withFit = false)
        .zipWithIndex.map { case (tv, i) =>
          (g, i, BigDecimal(tv.v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.toSet
    val got = holtWintersQ(s, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    val ok = got == expected
    if (!ok) {
      val diff = (got diff expected) ++ (expected diff got)
      System.err.println(s"[verify] holtWinters mismatch rows: ${diff.take(10).mkString(", ")}")
    }
    // Build the weights-as-literals DuckDB oracle while the fitted state
    // is at hand: the Nelder-Mead FIT stays non-SQL (this cross-check is
    // its gate), but the damped multiplicative FORECAST recursion is pure
    // arithmetic on the winner — embed (clamped params, y0, n) per group
    // and let DuckDB re-execute it (the q_text_classify/q_text_bpe move).
    // The recursion never reads the series past y(0): simulate feeds its
    // own emissions back (the reference's semantics), so the oracle needs
    // no cross-engine float aggregation at all.
    hwOracle = Some(holtWintersSqlFor(series))
    ok
  }

  @volatile private var hwOracle: Option[String] = None
  def holtWintersSqlOpt: Option[String] = hwOracle

  private def holtWintersSqlFor(
      series: Map[String, Array[(String, Long, Double)]]): String = {
    // every double literal rides as a string CAST — DuckDB's bare decimal
    // literals are DECIMALs whose arithmetic drifts a ulp from the JVM's;
    // derived constants (1−α, (1−β)·φ, 1−γ) are precomputed HERE so both
    // engines multiply identical doubles in an identical tree (prototype
    // verified bit-equal over 33 steps)
    def L(v: Double) = s"CAST('${java.lang.Double.toString(v)}' AS DOUBLE)"
    val m = 7
    val rows = series.toSeq.sortBy(_._1).flatMap { case (g, rws) =>
      val tvs = rws.sortBy(_._2).map(r => HoltWinters.TV(r._2, r._3)).toArray
      HoltWinters.prepare(tvs, m, 86400L).flatMap { p =>
        val best = HoltWinters.fitPrepared(p, m).clone()
        var i = 0
        while (i < 4) { // simulate's in-place clamp, applied to the literals
          if (best(i) > 1) best(i) = 1; if (best(i) < 0) best(i) = 0; i += 1
        }
        if (p.y(0).isNaN) None // NaN head → all-NaN forecasts → no rows
        else Some(
          s"('$g', ${L(best(0))}, ${L(1 - best(0))}, ${L(best(1))}, " +
          s"${L((1 - best(1)) * best(3))}, ${L(best(2))}, ${L(1 - best(2))}, " +
          s"${L(best(3))}, ${L(best(4))}, ${L(best(5))}, ${L(p.y(0))}, " +
          s"${p.y.length}, [${(6 until 6 + m).map(j => L(best(j))).mkString(",")}])")
      }
    }
    require(rows.nonEmpty, "holtWinters oracle: no fittable groups")
    s"""WITH RECURSIVE pr(grp, a, oma, bb, ombphi, g, omg, phi, l0, b0, y0, n, seas0) AS (
         VALUES ${rows.mkString(", ")}),
       st(grp, tt, l, b, y, phih, phipow, seas, n) AS (
         SELECT grp, 1, l0, b0, y0, phi, phi, seas0, n FROM pr
         UNION ALL
         SELECT grp, tt + 1, l2,
                bb * (l2 - l) + ombphi * b,
                (l2 + phih * (bb * (l2 - l) + ombphi * b)) * seas[(tt % $m) + 1],
                phih + phipow, phipow * phi,
                list_transform(range($m), j -> CASE WHEN j = (tt - 1) % $m
                  THEN g * (y / l2) + omg * seas[((tt - 1) % $m) + 1]
                  ELSE seas[j + 1] END),
                n
         FROM (SELECT st.grp, tt, l, b, y, phih, phipow, st.seas, st.n,
                 pr.a * (y / st.seas[((tt - 1) % $m) + 1]) + pr.oma * (l + pr.phi * b) AS l2,
                 pr.bb, pr.ombphi, pr.g, pr.omg, pr.phi
               FROM st JOIN pr USING (grp) WHERE tt < st.n + 3)),
       fc AS (SELECT grp AS event_type,
                (row_number() OVER (PARTITION BY grp ORDER BY tt) - 1)::INT AS step,
                round(y, 6) AS forecast
              FROM st WHERE tt > n AND NOT isnan(y))
       SELECT event_type, step, forecast FROM fc ORDER BY event_type, step"""
      .replaceAll("\\s+", " ")
  }
}
