package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Holt-Winters forecast aggregate (reference pipeline/influxql.go:555-581,
  * which delegates to InfluxDB 1.x `query.NewFloatHoltWintersReducer`).
  *
  * Semantics match the public InfluxDB algorithm (damped multiplicative
  * Holt-Winters, documented at docs.influxdata.com "holt_winters"), which
  * has three idiosyncrasies a textbook implementation would miss:
  *
  *  - observation times are rounded onto the interval grid and interior
  *    gaps become NaN slots that the SSE objective skips;
  *  - the fitted curve is a *pure simulation* from the initial state —
  *    level, trend, and per-slot seasonals are free parameters optimized
  *    alongside alpha/beta/gamma/phi, and later observations never correct
  *    the recursion (each fitted point feeds the next step as if observed);
  *  - parameters are fit by Nelder-Mead (the classic M. F. Hutt simplex
  *    formulation) seeded from a 4^4 grid over
  *    (alpha, beta, gamma, phi) ∈ {0.3, 0.475, 0.65, 0.825}, minimizing
  *    in-sample SSE with negative fits scored +Inf.
  *
  * Verified bit-for-bit against the reference goldens
  * (integrations/streamer_test.go:483-601 TestStream_HoltWinters /
  * TestStream_HoltWintersWithFit) in GoldenReplaySpec.
  *
  * Implemented as a typed [[Aggregator]] (registered via `udaf`) so it runs
  * distributed: partial buffers merge associatively; only the per-group
  * series (already small after the mandatory window aggregation upstream)
  * is materialized per group, never on the driver.
  */
object HoltWinters {

  case class TV(t: Long, v: Double)
  case class Buf(var items: List[TV])

  private val GuessLower = 0.3
  private val GuessUpper = 1.0
  private val GuessN     = 4
  private val Weight     = 0.5   // seed weight for the initial level/trend
  private val Epsilon    = 1.0e-4

  /** Fit + forecast over (time, value) points on a fixed interval grid.
    * Returns (time, value) pairs: fitted curve ++ forecasts when `withFit`,
    * else only the h forecasts. Fit times start at the first *actual* point
    * time; forecast times continue past the last actual point time. */
  /** Interval-gridded series plus the actual first/last point times. */
  private[graft] case class Prepared(y: Array[Double], t0: Long, tN: Long)

  /** Sort, round onto the interval grid, fill interior gaps with NaN.
    * None when the series is too short to fit. Duplicate grid slots keep
    * the first point (later ones are dropped). */
  private[graft] def prepare(points: Array[TV], m: Int, intervalS: Long): Option[Prepared] = {
    val seasonal = m >= 2
    val sorted = points.sortBy(_.t)
    val l = sorted.length
    if (l < 2 || (seasonal && l < m)) return None
    val half = intervalS / 2
    def roundT(t: Long): Long = {
      val rem = t % intervalS
      if (rem > half) (t / intervalS + 1) * intervalS
      else (t / intervalS) * intervalS
    }
    val start = roundT(sorted(0).t)
    val stop = roundT(sorted(l - 1).t)
    if ((stop - start) / intervalS <= 0) return None
    val yb = scala.collection.mutable.ArrayBuffer[Double](sorted(0).v)
    var t = start
    var pi = 1
    while (pi < l) {
      val rounded = roundT(sorted(pi).t)
      if (rounded > t) {
        t += intervalS
        while (rounded != t) { yb += Double.NaN; t += intervalS }
        yb += sorted(pi).v
      }
      pi += 1
    }
    Some(Prepared(yb.toArray, sorted(0).t, sorted(l - 1).t))
  }

  /** Initial [alpha, beta, gamma, phi, l0, b0, seasonals…] guess vector
    * (smoothing slots left 0 for the seed grid to fill). Seasonal missing
    * leading slots contribute nothing to l0/b0; NaN seasonal slots fall
    * back to the neutral multiplicative factor 1 so a gap in the first
    * season cannot zero-divide the recursion. */
  private[graft] def initialParams(y: Array[Double], m: Int): Array[Double] = {
    val seasonal = m >= 2
    var l0 = 0.0
    if (seasonal) {
      var i = 0
      while (i < m) { if (!y(i).isNaN) l0 += (1.0 / m) * y(i); i += 1 }
    } else {
      l0 += (1 - Weight) * y(0)
      l0 += Weight * y(1)
    }
    var b0 = 0.0
    if (seasonal) {
      var i = 0
      while (i < m && m + i < y.length) {
        if (!y(i).isNaN && !y(m + i).isNaN) b0 += 1.0 / m * (y(m + i) - y(i)) / m
        i += 1
      }
    } else {
      if (!y(1).isNaN) b0 = Weight * (y(1) - y(0))
    }
    val s0 =
      if (seasonal) Array.tabulate(m)(i => if (!y(i).isNaN) y(i) / l0 else 1.0)
      else Array.empty[Double]
    val params0 = new Array[Double](6 + s0.length)
    params0(4) = l0
    params0(5) = b0
    System.arraycopy(s0, 0, params0, 6, s0.length)
    params0
  }

  /** The seed values the serial grid visits, in visit order — accumulated
    * addition kept so distributed and serial fits see bit-identical seeds. */
  private[graft] val SeedValues: Array[Double] = {
    val step = (GuessUpper - GuessLower) / GuessN
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    var v = GuessLower
    while (v < GuessUpper) { b += v; v += step }
    b.toArray
  }

  /** Total restarts in the seed grid (alpha × beta × gamma × phi). */
  private[graft] val SeedCount: Int = SeedValues.length * SeedValues.length *
    SeedValues.length * SeedValues.length

  /** Simulate the damped recursion from the initial state in `params`
    * ([alpha, beta, gamma, phi, l0, b0, seasonals...]) over the fit span
    * plus `hh` future steps. Clamps the four smoothing parameters in
    * place — the optimizer's vertices see the clamp, as in the original. */
  private def simulate(hh: Int, params: Array[Double], y: Array[Double], m: Int): Array[Double] = {
    val seasonal = m >= 2
    var i = 0
    while (i < 4) {
      if (params(i) > 1) params(i) = 1
      if (params(i) < 0) params(i) = 0
      i += 1
    }
    var yT = y(0)
    val phi = params(3)
    var phiH = phi
    var lT = params(4)
    var bT = params(5)
    // ring of the current per-slot seasonal factors: the slot of the
    // PREVIOUS time (the observation being absorbed) feeds the level
    // update and is replaced after use; the slot of the CURRENT time
    // scales the emission
    val seasonals = new Array[Double](math.max(params.length - 6, 0))
    System.arraycopy(params, 6, seasonals, 0, params.length - 6)
    val out = new Array[Double](y.length + hh)
    out(0) = yT
    var stm = 1.0
    var stmh = 1.0
    // phi^tt kept incrementally — pow() per step dominated the fit cost
    // (256 restarts × ~1000 simplex iterations × series length)
    var phiPow = phi
    var tt = 1
    while (tt < y.length + hh) {
      if (seasonal) {
        stm = seasonals(Math.floorMod(tt - 1, m))
        stmh = seasonals(Math.floorMod(tt, m))
      }
      val lTp = lT
      lT = params(0) * (yT / stm) + (1 - params(0)) * (lTp + phi * bT)
      bT = params(1) * (lT - lTp) + (1 - params(1)) * phi * bT
      val sT = params(2) * (yT / lT) + (1 - params(2)) * stm
      yT = (lT + phiH * bT) * stmh
      phiH += phiPow
      phiPow *= phi
      if (seasonal) seasonals(Math.floorMod(tt - 1, m)) = sT
      out(tt) = yT
      tt += 1
    }
    out
  }

  /** Fused simulate+SSE: identical recursion and accumulation order to
    * `simulate` followed by the residual loop, but with no output array and
    * a caller-provided seasonal scratch buffer — the objective runs
    * hundreds of thousands of times per fit (restarts × simplex
    * iterations), so the two allocations per call dominated the fit cost.
    * Clamps the smoothing parameters in place exactly like `simulate`
    * (the optimizer's vertices must see the clamp). */
  private def sseOf(params: Array[Double], y: Array[Double], m: Int,
      seasonals: Array[Double]): Double = {
    val seasonal = m >= 2
    var i = 0
    while (i < 4) {
      if (params(i) > 1) params(i) = 1
      if (params(i) < 0) params(i) = 0
      i += 1
    }
    var yT = y(0)
    var acc = 0.0
    if (!y(0).isNaN) {
      if (yT < 0) return Double.PositiveInfinity
      val d0 = yT - y(0)
      acc += d0 * d0
    }
    val phi = params(3)
    var phiH = phi
    var lT = params(4)
    var bT = params(5)
    System.arraycopy(params, 6, seasonals, 0, params.length - 6)
    var stm = 1.0
    var stmh = 1.0
    var phiPow = phi
    var tt = 1
    while (tt < y.length) {
      if (seasonal) {
        stm = seasonals(Math.floorMod(tt - 1, m))
        stmh = seasonals(Math.floorMod(tt, m))
      }
      val lTp = lT
      lT = params(0) * (yT / stm) + (1 - params(0)) * (lTp + phi * bT)
      bT = params(1) * (lT - lTp) + (1 - params(1)) * phi * bT
      val sT = params(2) * (yT / lT) + (1 - params(2)) * stm
      yT = (lT + phiH * bT) * stmh
      phiH += phiPow
      phiPow *= phi
      if (seasonal) seasonals(Math.floorMod(tt - 1, m)) = sT
      if (!y(tt).isNaN) {
        if (yT < 0) return Double.PositiveInfinity
        val d = yT - y(tt)
        acc += d * d
      }
      tt += 1
    }
    acc
  }

  /** One Nelder-Mead restart from grid seed `idx` (row-major over
    * alpha, beta, gamma, phi in [[SeedValues]] order). */
  private[graft] def fitSeed(y: Array[Double], m: Int, params0: Array[Double],
      idx: Int): (Double, Array[Double]) = {
    val n = SeedValues.length
    val p = params0.clone()
    p(0) = SeedValues(idx / (n * n * n) % n)
    p(1) = SeedValues(idx / (n * n) % n)
    p(2) = SeedValues(idx / n % n)
    p(3) = SeedValues(idx % n)
    // one scratch per restart, reused across every objective call — the
    // simplex runs single-threaded inside this call
    val scratch = new Array[Double](math.max(params0.length - 6, 0))
    NelderMead.optimize(sseOf(_, y, m, scratch), p, Epsilon, 1.0)
  }

  /** Final emission from the winning parameters. */
  private[graft] def emitPoints(prep: Prepared, params: Array[Double], h: Int,
      m: Int, intervalS: Long, withFit: Boolean): Array[TV] = {
    val fc = simulate(h, params, prep.y, m)
    val out = scala.collection.mutable.ArrayBuffer.empty[TV]
    if (withFit) {
      var i = 0
      while (i < fc.length) {
        if (!fc(i).isNaN) out += TV(prep.t0 + intervalS * i, fc(i))
        i += 1
      }
    } else {
      var i = 0
      while (i + prep.y.length < fc.length) {
        val v = fc(prep.y.length + i)
        if (!v.isNaN) out += TV(prep.tN + intervalS * (i + 1), v)
        i += 1
      }
    }
    out.toArray
  }

  private[graft] def run(points: Array[TV], h: Int, m: Int, intervalS: Long,
      withFit: Boolean): Array[TV] = {
    if (h <= 0) return Array.empty
    prepare(points, m, intervalS) match {
      case None => Array.empty
      case Some(prep) =>
        val params0 = initialParams(prep.y, m)
        var minSSE = Double.PositiveInfinity
        var best: Array[Double] = null
        var idx = 0
        while (idx < SeedCount) {
          val (fbest, opt) = fitSeed(prep.y, m, params0, idx)
          // a NaN objective (degenerate series) must never pin `best`
          // against later finite seeds
          if (best == null || (!fbest.isNaN && (minSSE.isNaN || fbest < minSSE))) {
            minSSE = fbest; best = opt
          }
          idx += 1
        }
        emitPoints(prep, best, h, m, intervalS, withFit)
    }
  }

  /** Values-only convenience over a unit grid (t = 0, 1, 2, …). */
  private[graft] def forecast(values: Array[Double], h: Int, m: Int,
      withFit: Boolean): Array[Double] =
    run(values.zipWithIndex.map { case (v, i) => TV(i.toLong, v) },
      h, m, 1L, withFit).map(_.v)

  /** Distributed fit: one task row per (group, seed) so the 4^4
    * Nelder-Mead restarts spread across the cluster instead of
    * serializing inside a single aggregation task — the right shape when
    * groups are few and fat (a 5-group daily-seasonal fit keeps 5 cores
    * busy under the Aggregator; here it keeps 5 × 256). The per-group
    * winner is the same argmin the serial path picks (first
    * strictly-smaller SSE in seed order; NaN never pins).
    *
    * Shape: the prepared per-group series are small by construction (this
    * path is for FEW groups — many groups saturate the cluster under the
    * serial Aggregator), so they are collected once and broadcast; restart
    * tasks are a bare `spark.range` over group × seed carrying ZERO series
    * bytes, sliced well past the core count so the scheduler load-balances
    * the uneven simplex runs; only (seed, sse, 13-double params) rows meet
    * the per-group argmin reduce. The previous form shipped the full
    * series inside every restart row through two shuffles — 3.3× slower
    * at sf0.1 and strictly worse at any scale.
    *
    * Input: (group, epochSeconds, value) rows. Output: (group, t, v)
    * forecast (or fit ++ forecast) points. */
  def holtWintersDistributed(
      points: org.apache.spark.sql.DataFrame,
      groupCol: String, tCol: String, vCol: String,
      h: Int, m: Int, intervalS: Long,
      withFit: Boolean = false): org.apache.spark.sql.DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val mm = m; val hh = h; val ivl = intervalS; val wf = withFit
    val typed = points.select(
      org.apache.spark.sql.functions.col(groupCol).cast("string"),
      org.apache.spark.sql.functions.col(tCol).cast("long"),
      org.apache.spark.sql.functions.col(vCol).cast("double"))
      .as[(String, Long, Double)]
    // grid-prepare executor-side, collect only the gridded series
    val prepared: Array[(String, Prepared, Array[Double])] = typed
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        prepare(it.map(r => TV(r._2, r._3)).toArray, mm, ivl) match {
          case Some(p) => (g, p.y, p.t0, p.tN, initialParams(p.y, mm))
          case None    => (g, Array.empty[Double], 0L, 0L, Array.empty[Double])
        }
      }
      .collect()
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
      .map { case (g, y, t0, tN, p0) => (g, Prepared(y, t0, tN), p0) }
    if (prepared.isEmpty)
      return Seq.empty[(String, Long, Double)].toDF(groupCol, tCol, vCol)
    val bc = spark.sparkContext.broadcast(prepared)
    val nG = prepared.length
    val total = nG.toLong * SeedCount
    val slices = math.min(total, 8L * math.max(spark.sparkContext.defaultParallelism, 1)).toInt
    val fits = spark.range(0, total, 1, slices).map { id =>
      val gi = (id % nG).toInt
      val seed = (id / nG).toInt
      val (_, prep, p0) = bc.value(gi)
      val (sse, ps) = fitSeed(prep.y, mm, p0, seed)
      (gi, seed, sse, ps)
    }
    // argmin with ties → lowest seed, NaN never beating a finite SSE:
    // associative, and equal to the serial loop's first-strictly-smaller
    // scan in seed order
    fits.groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val (lo, hi) = if (a._2 < b._2) (a, b) else (b, a)
        if (!hi._3.isNaN && (lo._3.isNaN || hi._3 < lo._3)) hi else lo
      }
      .flatMap { case (gi, (_, _, _, ps)) =>
        val (g, prep, _) = bc.value(gi)
        emitPoints(prep, ps, hh, mm, ivl, wf).iterator.map(p => (g, p.t, p.v))
      }
      .toDF(groupCol, tCol, vCol)
  }

  /** Auto-dispatching fit: one cheap stats pass over the (persisted) input
    * picks the serial Aggregator or the distributed restart fan-out.
    *
    * The 4^4-restart Nelder-Mead fit is expensive for any non-trivial
    * series (~0.5 core-seconds at 150 gridded points), so whenever the
    * group count is well below the core count the serial per-group
    * Aggregator idles most of the cluster for the whole fit — that is the
    * distributed fan-out's regime (measured 2.3 s serial vs 0.5 s
    * fan-out at sf0.1's 5 groups × ~150 points on 32 cores). Conversely,
    * at many groups the Aggregator tasks already saturate the cluster and
    * the fan-out's broadcast + reduce is pure overhead; likewise for
    * trivially short series where a fit costs less than a task launch.
    * The fan-out collects the per-group gridded series to the driver for
    * broadcast, so it is additionally gated on a total-points cap.
    *
    * The input is persisted around the stats pass so the upstream pipeline
    * (a 100 TB scan + aggregation, typically) is never recomputed for the
    * dispatch decision; the (small) series table is the thing cached. */
  def holtWintersAuto(
      points: org.apache.spark.sql.DataFrame,
      groupCol: String, tCol: String, vCol: String,
      h: Int, m: Int, intervalS: Long,
      withFit: Boolean = false,
      minSeriesLen: Long = 64L,
      maxBroadcastPoints: Long = 16L * 1024 * 1024): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, count, explode, lit}
    val spark = points.sparkSession
    val cached = points.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = cached
      .agg(count(lit(1)).as("n"), approx_count_distinct(col(groupCol)).as("g"))
      .collect()(0)
    val n = stats.getLong(0)
    val g = math.max(stats.getLong(1), 1L)
    val cores = math.max(spark.sparkContext.defaultParallelism, 1)
    val fewFatGroups = g < cores / 2 && n / g >= minSeriesLen && n <= maxBroadcastPoints
    val fitted =
      if (fewFatGroups)
        holtWintersDistributed(cached, groupCol, tCol, vCol, h, m, intervalS, withFit)
      else
        cached.groupBy(col(groupCol).cast("string").as(groupCol))
          .agg(holtWinters(col(tCol).cast("long"), col(vCol).cast("double"),
            h, m, intervalS, withFit).as("_hw"))
          .select(col(groupCol), explode(col("_hw")).as("_p"))
          .select(col(groupCol), col("_p.t").as(tCol), col("_p.v").as(vCol))
    // pin the (tiny) forecast and release the series cache immediately —
    // same trade as Dedup.eagerRelease: without it each invocation leaks
    // one cached series table into the session
    val out = fitted.localCheckpoint(true)
    cached.unpersist(false)
    out
  }

  /** Aggregator over (epochSeconds, value) rows; emits (t, v) points. */
  class HwAgg(h: Int, m: Int, intervalS: Long, withFit: Boolean)
      extends Aggregator[TV, Buf, Array[TV]] {
    def zero: Buf = Buf(Nil)
    def reduce(b: Buf, a: TV): Buf = { b.items = a :: b.items; b }
    def merge(a: Buf, b: Buf): Buf = { a.items = a.items ::: b.items; a }
    def finish(b: Buf): Array[TV] =
      run(b.items.toArray, h, m, intervalS, withFit)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Array[TV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[TV]]()
  }

  /** Column form: holtWinters(epoch_s, value, h, m, intervalS). Output is
    * an array of (t, v) structs — fit ++ forecast when withFit. */
  def holtWinters(timeS: Column, value: Column, h: Int, m: Int,
      intervalS: Long = 1L, withFit: Boolean = false): Column = {
    val agg = udaf(new HwAgg(h, m, intervalS, withFit), Encoders.product[TV])
    agg(timeS, value)
  }
}

/** Nelder-Mead simplex minimizer — the classic M. F. Hutt formulation
  * (mikehutt.com/neldermead.html; the same public-domain variant InfluxDB's
  * `query/neldermead` package uses), including its quirks: the non-worst
  * vertices keep stale objective values after a shrink, and convergence
  * tests the population standard deviation of the vertex values. */
private[operators] object NelderMead {
  private val MaxIterations = 1000
  private val Alpha = 1.0 // reflection
  private val Beta  = 0.5 // contraction
  private val Gamma = 2.0 // expansion

  /** Minimizes `objfunc` from `start`; returns (best value, best vertex). */
  def optimize(objfunc: Array[Double] => Double, start: Array[Double],
      epsilon: Double, scale: Double): (Double, Array[Double]) = {
    val n = start.length
    val v = Array.ofDim[Double](n + 1, n)
    val f = new Array[Double](n + 1)
    val vr = new Array[Double](n)
    val ve = new Array[Double](n)
    val vc = new Array[Double](n)
    val vm = new Array[Double](n)

    val pn = scale * (math.sqrt((n + 1).toDouble) - 1 + n) / (n * math.sqrt(2.0))
    val qn = scale * (math.sqrt((n + 1).toDouble) - 1) / (n * math.sqrt(2.0))

    var i = 0
    while (i < n) { v(0)(i) = start(i); i += 1 }
    i = 1
    while (i <= n) {
      var j = 0
      while (j < n) { v(i)(j) = (if (i - 1 == j) pn else qn) + start(j); j += 1 }
      i += 1
    }
    i = 0
    while (i <= n) { f(i) = objfunc(v(i)); i += 1 }

    var itr = 1
    var converged = false
    while (itr <= MaxIterations && !converged) {
      var vg = 0
      var vs = 0
      i = 0
      while (i <= n) {
        if (f(i) > f(vg)) vg = i
        if (f(i) < f(vs)) vs = i
        i += 1
      }
      var vh = vs
      i = 0
      while (i <= n) { if (f(i) > f(vh) && f(i) < f(vg)) vh = i; i += 1 }

      i = 0
      while (i < n) {
        var cent = 0.0
        var k = 0
        while (k <= n) { if (k != vg) cent += v(k)(i); k += 1 }
        vm(i) = cent / n
        i += 1
      }

      i = 0
      while (i < n) { vr(i) = vm(i) + Alpha * (vm(i) - v(vg)(i)); i += 1 }
      val fr = objfunc(vr)
      if (fr < f(vh) && fr >= f(vs)) {
        i = 0; while (i < n) { v(vg)(i) = vr(i); i += 1 }
        f(vg) = fr
      }
      if (fr < f(vs)) {
        i = 0; while (i < n) { ve(i) = vm(i) + Gamma * (vr(i) - vm(i)); i += 1 }
        val fe = objfunc(ve)
        if (fe < fr) {
          i = 0; while (i < n) { v(vg)(i) = ve(i); i += 1 }
          f(vg) = fe
        } else {
          i = 0; while (i < n) { v(vg)(i) = vr(i); i += 1 }
          f(vg) = fr
        }
      }
      if (fr >= f(vh)) {
        if (fr < f(vg) && fr >= f(vh)) {
          // outside contraction
          i = 0; while (i < n) { vc(i) = vm(i) + Beta * (vr(i) - vm(i)); i += 1 }
        } else {
          // inside contraction
          i = 0; while (i < n) { vc(i) = vm(i) - Beta * (vm(i) - v(vg)(i)); i += 1 }
        }
        val fcv = objfunc(vc)
        if (fcv < f(vg)) {
          i = 0; while (i < n) { v(vg)(i) = vc(i); i += 1 }
          f(vg) = fcv
        } else {
          // shrink toward the best vertex; refresh only the worst two
          // objective values (the original's behavior — kept for parity)
          var row = 0
          while (row <= n) {
            if (row != vs) {
              i = 0
              while (i < n) { v(row)(i) = v(vs)(i) + (v(row)(i) - v(vs)(i)) / 2.0; i += 1 }
            }
            row += 1
          }
          f(vg) = objfunc(v(vg))
          f(vh) = objfunc(v(vh))
        }
      }

      var fsum = 0.0
      i = 0
      while (i <= n) { fsum += f(i); i += 1 }
      val favg = fsum / (n + 1)
      var sdev = 0.0
      i = 0
      while (i <= n) { sdev += math.pow(f(i) - favg, 2.0) / n; i += 1 }
      sdev = math.sqrt(sdev)
      if (sdev < epsilon) converged = true
      itr += 1
    }

    var vs = 0
    i = 0
    while (i <= n) { if (f(i) < f(vs)) vs = i; i += 1 }
    (f(vs), v(vs))
  }
}
