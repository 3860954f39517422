package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Holt-Winters forecast aggregate (reference pipeline/influxql.go:555-581).
  *
  * Triple exponential smoothing over a per-group time-ordered series with
  * seasonal period `m` (m < 2 → Holt's double exponential, no seasonality),
  * forecasting `h` steps past the end. Smoothing parameters (α, β, γ) are
  * fit by Nelder–Mead on the in-sample SSE — same approach as InfluxDB's
  * FloatHoltWintersReducer (public algorithm: NIST/Hyndman additive HW).
  *
  * Implemented as a typed [[Aggregator]] (registered via `udaf`) so it runs
  * distributed: partial buffers merge associatively; only the per-group
  * series (already small after the mandatory window aggregation upstream)
  * is materialized per group, never on the driver.
  */
object HoltWinters {

  case class TV(t: Long, v: Double)
  case class Buf(var items: List[TV])

  /** Additive Holt-Winters fit + h-step forecast. Returns forecasts only
    * (withFit=false) or fitted values ++ forecasts (withFit=true). */
  private[graft] def forecast(values: Array[Double], h: Int, m: Int, withFit: Boolean): Array[Double] = {
    val n = values.length
    if (n < math.max(2, 2 * math.max(m, 1))) return Array.empty

    def sse(params: Array[Double]): (Double, Array[Double]) = {
      val alpha = clamp01(params(0)); val beta = clamp01(params(1)); val gamma = clamp01(params(2))
      val seasonal = m >= 2
      var level = values(0)
      var trend = if (seasonal) {
        var s = 0.0; var i = 0
        while (i < m && i + m < n) { s += (values(i + m) - values(i)) / m; i += 1 }
        if (i > 0) s / i else values(1) - values(0)
      } else values(1) - values(0)
      val season = if (seasonal) {
        val s = new Array[Double](m)
        val mean0 = values.take(m).sum / m
        var i = 0
        while (i < m) { s(i) = values(i) - mean0; i += 1 }
        s
      } else Array.empty[Double]
      val fit = new Array[Double](n)
      var err = 0.0
      var i = 0
      while (i < n) {
        val si = if (seasonal) season(i % m) else 0.0
        val pred = level + trend + si
        fit(i) = pred
        val e = values(i) - pred
        err += e * e
        val lastLevel = level
        level = alpha * (values(i) - si) + (1 - alpha) * (level + trend)
        trend = beta * (level - lastLevel) + (1 - beta) * trend
        if (seasonal) season(i % m) = gamma * (values(i) - level) + (1 - gamma) * si
        i += 1
      }
      val fc = new Array[Double](h)
      var k = 0
      while (k < h) {
        val si = if (seasonal) season((n + k) % m) else 0.0
        fc(k) = level + (k + 1) * trend + si
        k += 1
      }
      (err, fit ++ fc)
    }

    // Nelder-Mead over (alpha, beta, gamma) in [0,1]^3.
    var best = nelderMead(Array(0.5, 0.1, 0.1), p => sse(p)._1)
    val (_, out) = sse(best)
    if (withFit) out else out.takeRight(h)
  }

  private def clamp01(x: Double): Double = math.min(1.0, math.max(0.0, x))

  private def nelderMead(x0: Array[Double], f: Array[Double] => Double): Array[Double] = {
    val dim = x0.length
    var simplex = (x0 +: (0 until dim).map { i =>
      val p = x0.clone(); p(i) = clamp01(p(i) + 0.3); p
    }.toSeq).toArray
    var fv = simplex.map(f)
    var iter = 0
    while (iter < 200) {
      val order = fv.zipWithIndex.sortBy(_._1).map(_._2)
      simplex = order.map(simplex); fv = order.map(fv)
      val centroid = new Array[Double](dim)
      for (i <- 0 until dim; j <- 0 until dim) centroid(j) += simplex(i)(j) / dim
      val worst = simplex(dim)
      val refl = Array.tabulate(dim)(j => clamp01(centroid(j) + (centroid(j) - worst(j))))
      val fr = f(refl)
      if (fr < fv(0)) {
        val exp = Array.tabulate(dim)(j => clamp01(centroid(j) + 2 * (centroid(j) - worst(j))))
        val fe = f(exp)
        if (fe < fr) { simplex(dim) = exp; fv(dim) = fe } else { simplex(dim) = refl; fv(dim) = fr }
      } else if (fr < fv(dim - 1)) { simplex(dim) = refl; fv(dim) = fr }
      else {
        val con = Array.tabulate(dim)(j => clamp01(centroid(j) + 0.5 * (worst(j) - centroid(j))))
        val fc = f(con)
        if (fc < fv(dim)) { simplex(dim) = con; fv(dim) = fc }
        else {
          for (i <- 1 to dim; j <- 0 until dim)
            simplex(i)(j) = clamp01(simplex(0)(j) + 0.5 * (simplex(i)(j) - simplex(0)(j)))
          fv = simplex.map(f)
        }
      }
      iter += 1
    }
    simplex(fv.zipWithIndex.minBy(_._1)._2)
  }

  /** Aggregator over (epochSeconds, value) rows. */
  class HwAgg(h: Int, m: Int, withFit: Boolean)
      extends Aggregator[TV, Buf, Array[Double]] {
    def zero: Buf = Buf(Nil)
    def reduce(b: Buf, a: TV): Buf = { b.items = a :: b.items; b }
    def merge(a: Buf, b: Buf): Buf = { a.items = a.items ::: b.items; a }
    def finish(b: Buf): Array[Double] =
      forecast(b.items.sortBy(_.t).map(_.v).toArray, h, m, withFit)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column form: holtWinters(struct(epoch_s, value), h, m). */
  def holtWinters(timeS: Column, value: Column, h: Int, m: Int, withFit: Boolean = false): Column = {
    val agg = udaf(new HwAgg(h, m, withFit), Encoders.product[TV])
    agg(timeS, value)
  }
}
