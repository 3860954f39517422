package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation: heavy-hitter group keys are salted
  * into `salts` sub-keys for the first (wide) aggregation, then the
  * partials merge in a second (tiny) aggregation on the true key.
  *
  * AQE's skew handling covers joins; skewed *aggregations* still funnel a
  * hot key's rows through one partition in the final agg unless the
  * partial aggregation has already collapsed them — which it has here: the
  * first phase reduces each (key, salt) to one row, so the second phase
  * sees at most `salts` rows per hot key. Decomposable aggregates only
  * (sum/count/min/max and means via sum+count). */
object Salt {

  /** Salted sum/count (mean derivable) over a possibly-skewed key. */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int): DataFrame = saltedSumCount(df, Seq(keyCol), valueCol, salts)

  /** Multi-column key variant — composes with windowed FSM outputs, whose
    * natural aggregation key is (dims..., emit time). */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(crc32(col(valueCol).cast("string")), lit(salts)))
    salted
      .groupBy(keyCols.map(col) :+ col("__salt"): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__psum").as("sum_v"), sum("__pcnt").as("cnt"))
      .withColumn("mean_v", col("sum_v") / col("cnt"))
  }
}
