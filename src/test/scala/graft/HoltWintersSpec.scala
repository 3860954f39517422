package graft

import graft.operators.HoltWinters
import org.apache.spark.sql.functions._

/** holtWinters / holtWintersWithFit (reference pipeline/influxql.go:555-581):
  * deterministic behavioral pins the DuckDB oracle can't express — the fit
  * tracks a known generator, withFit prepends the in-sample fit, and the
  * Aggregator surface matches the direct computation. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val season = Seq(2.0, -1.0, -2.0, 1.0)
  private def gen(i: Int): Double = 10.0 + 0.5 * i + season(i % m)
  private val series = (0 until 24).map(gen)

  test("withFit returns n fitted values plus h forecasts tracking the generator") {
    val h = 8
    val out = HoltWinters.forecast(series.toArray, h, m, withFit = true)
    assert(out.length == series.length + h)
    val fitted = out.take(series.length)
    val tail = fitted.zip(series).drop(2 * m)
    val mse = tail.map { case (f, v) => (f - v) * (f - v) }.sum / tail.size
    assert(mse < 1.0, s"in-sample MSE $mse")
    out.drop(series.length).zipWithIndex.foreach { case (f, j) =>
      val truth = gen(series.length + j)
      assert(math.abs(f - truth) < 2.0, s"forecast $j: $f vs $truth")
    }
  }

  test("withFit=false is exactly the forecast tail of withFit=true") {
    val h = 5
    val fit = HoltWinters.forecast(series.toArray, h, m, withFit = true)
    val fc = HoltWinters.forecast(series.toArray, h, m, withFit = false)
    assert(fc.toSeq == fit.takeRight(h).toSeq)
  }

  test("the distributed aggregate equals the direct computation per group") {
    val h = 6
    val df = series.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "t", "v")
      .repartition(8) // force partial/merge paths through the Aggregator
    val agg = df.groupBy("g").agg(
      HoltWinters.holtWinters(col("t"), col("v"), h, m, withFit = true).as("hw"))
    val got = agg.select("hw").as[Array[Double]].head()
    val direct = HoltWinters.forecast(series.toArray, h, m, withFit = true)
    assert(got.toSeq == direct.toSeq)
  }

  test("randLambda is reproducible for a fixed seed and bounded by n") {
    import graft.functions.TickFunctions
    val df = spark.range(1000).coalesce(1)
    val a = df.select(TickFunctions.randLambda(42L, 100L).as("r")).as[Long].collect()
    val b = df.select(TickFunctions.randLambda(42L, 100L).as("r")).as[Long].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(x => x >= 0 && x < 100))
    assert(a.distinct.length > 50) // actually random, not constant
    val unbounded = df.select(TickFunctions.randLambda(7L).as("r")).as[Long].collect()
    assert(unbounded.forall(_ >= 0) && unbounded.distinct.length > 900)
  }
}
