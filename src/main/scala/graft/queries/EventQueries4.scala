package graft.queries

import graft.api.Pipe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave 4 (round 3): aligned window emission, k-combinations, multi-field
  * flatten, batch query() period stepping. Same conventions as
  * [[EventQueries]]. */
object EventQueries4 {
  import EventQueries.{pipe, preludeSql}

  // -------------------------------------------- window().align().fillPeriod()
  //
  // period=2h, every=1h, align+fillPeriod (reference window.go:108-126,
  // 150-224): boundary B=k·3600s emits iff a point arms it (a point in
  // [B-every,B), or B is the first boundary after t0+period) and a point at
  // or after B exists; batch contents are [B-period, B). Both sides state
  // the identical closed form.

  /** q_window_aligned: count/mean per emitted aligned window per event_type. */
  def windowAlignedQ(s: SparkSession, dir: String): DataFrame = {
    val p = pipe(s, dir).windowAligned(7200, 3600, fillPeriod = true)
    p.df.groupBy(col("event_type"), col("wemit_s"))
      .agg(count(lit(1)).as("cnt"), round(avg("value"), 6).as("mean_v"))
      .orderBy("event_type", "wemit_s")
  }
  val windowAlignedSql: String = {
    val ev = 3600000000L // every, µs
    val pd = 7200000000L // period, µs
    s"""$preludeSql,
       st AS (SELECT event_type, min(tus) AS mn, max(tus) AS mx FROM e GROUP BY 1),
       fk AS (SELECT event_type, CAST(floor((mn + $pd)/$ev.0) + 1 AS BIGINT) AS firstk, mx FROM st),
       armed AS (
         SELECT DISTINCT event_type, CAST(floor(tus/$ev.0) + 1 AS BIGINT) AS k FROM e
         UNION SELECT event_type, firstk AS k FROM fk),
       em AS (SELECT a.event_type, a.k FROM armed a JOIN fk USING (event_type)
              WHERE a.k >= fk.firstk AND a.k * $ev <= fk.mx),
       mem AS (SELECT event_type, value,
                      unnest(generate_series(CAST(floor(tus/$ev.0) + 1 AS BIGINT),
                                             CAST(floor((tus + $pd)/$ev.0) AS BIGINT))) AS k
               FROM e)
       SELECT m.event_type, CAST(m.k * 3600 AS BIGINT) AS wemit_s,
              count(*) AS cnt, round(avg(m.value), 6) AS mean_v
       FROM mem m JOIN em ON em.event_type = m.event_type AND em.k = m.k
       GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " ")
  }
}
