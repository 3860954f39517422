package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TICKscript lambda function library (reference
  * tick/stateful/functions.go:145-254) as Spark columns.
  *
  * Everything that exists in `org.apache.spark.sql.functions` is used
  * directly (codegen'd); only the genuinely missing scalars — erf/erfc,
  * gamma, the Bessel family, humanBytes — are Scala UDFs implemented from
  * the classic Abramowitz & Stegun / Numerical Recipes approximations
  * (public-domain algorithms). The stateful functions (sigma, count,
  * spread) are window expressions over the group's time order, exactly the
  * running state the reference keeps per group (functions.go:1131-1177).
  */
object TickFunctions {

  // ----------------------------------------------------------- special fns

  private[graft] def erfImpl(x: Double): Double = {
    // A&S 7.1.26 rational approximation, |eps| <= 1.5e-7.
    val sign = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val tt = 1.0 / (1.0 + 0.3275911 * ax)
    val y = 1.0 - (((((1.061405429 * tt - 1.453152027) * tt) + 1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt * math.exp(-ax * ax)
    sign * y
  }

  private[graft] def gammaImpl(x: Double): Double = {
    // Lanczos approximation (g=7, n=9).
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) math.Pi / (math.sin(math.Pi * x) * gammaImpl(1 - x))
    else {
      val xx = x - 1
      var a = g(0)
      val t = xx + 7.5
      for (i <- 1 until 9) a += g(i) / (xx + i)
      math.sqrt(2 * math.Pi) * math.pow(t, xx + 0.5) * math.exp(-t) * a
    }
  }

  // Bessel functions of the first/second kind (Numerical Recipes polynomial
  // + asymptotic forms).
  private[graft] def j0Impl(x: Double): Double = {
    val ax = math.abs(x)
    if (ax < 8.0) {
      val y = x * x
      val p1 = 57568490574.0 + y * (-13362590354.0 + y * (651619640.7 + y * (-11214424.18 + y * (77392.33017 + y * (-184.9052456)))))
      val p2 = 57568490411.0 + y * (1029532985.0 + y * (9494680.718 + y * (59272.64853 + y * (267.8532712 + y))))
      p1 / p2
    } else {
      val z = 8.0 / ax; val y = z * z; val xx = ax - 0.785398164
      val p1 = 1.0 + y * (-0.1098628627e-2 + y * (0.2734510407e-4 + y * (-0.2073370639e-5 + y * 0.2093887211e-6)))
      val p2 = -0.1562499995e-1 + y * (0.1430488765e-3 + y * (-0.6911147651e-5 + y * (0.7621095161e-6 + y * (-0.934935152e-7))))
      math.sqrt(0.636619772 / ax) * (math.cos(xx) * p1 - z * math.sin(xx) * p2)
    }
  }

  private[graft] def j1Impl(x: Double): Double = {
    val ax = math.abs(x)
    val res = if (ax < 8.0) {
      val y = x * x
      val p1 = x * (72362614232.0 + y * (-7895059235.0 + y * (242396853.1 + y * (-2972611.439 + y * (15704.48260 + y * (-30.16036606))))))
      val p2 = 144725228442.0 + y * (2300535178.0 + y * (18583304.74 + y * (99447.43394 + y * (376.9991397 + y))))
      p1 / p2
    } else {
      val z = 8.0 / ax; val y = z * z; val xx = ax - 2.356194491
      val p1 = 1.0 + y * (0.183105e-2 + y * (-0.3516396496e-4 + y * (0.2457520174e-5 + y * (-0.240337019e-6))))
      val p2 = 0.04687499995 + y * (-0.2002690873e-3 + y * (0.8449199096e-5 + y * (-0.88228987e-6 + y * 0.105787412e-6)))
      val r = math.sqrt(0.636619772 / ax) * (math.cos(xx) * p1 - z * math.sin(xx) * p2)
      if (x < 0) -r else r
    }
    res
  }

  private[graft] def jnImpl(n: Int, x: Double): Double = n match {
    case 0 => j0Impl(x)
    case 1 => j1Impl(x)
    case _ =>
      if (x == 0.0) 0.0
      else if (math.abs(x) > n.toDouble) {
        // upward recurrence
        var jm = j0Impl(x); var j = j1Impl(x)
        for (i <- 1 until n) { val jp = 2.0 * i / x * j - jm; jm = j; j = jp }
        j
      } else {
        // downward recurrence (Miller's algorithm)
        val acc = 40; val bigno = 1e10; val bigni = 1e-10
        val m = 2 * ((n + math.sqrt(acc * n).toInt) / 2)
        var jp = 0.0; var j = 1.0; var ans = 0.0; var sum = 0.0
        var i = m
        while (i > 0) {
          val jm = 2.0 * i / x * j - jp
          jp = j; j = jm
          if (math.abs(j) > bigno) { j *= bigni; jp *= bigni; ans *= bigni; sum *= bigni }
          // normalization sum accumulates even-index J terms: after the
          // update, j holds J_{i-1}, so add on odd i (m is even)
          if (i % 2 == 1) sum += j
          if (i == n) ans = jp
          i -= 1
        }
        sum = 2.0 * sum - j
        ans / sum
      }
  }

  private[graft] def y0Impl(x: Double): Double = {
    if (x < 8.0) y0Series(x)
    else {
      val z = 8.0 / x; val y = z * z; val xx = x - 0.785398164
      val p1 = 1.0 + y * (-0.1098628627e-2 + y * (0.2734510407e-4 + y * (-0.2073370639e-5 + y * 0.2093887211e-6)))
      val p2 = -0.1562499995e-1 + y * (0.1430488765e-3 + y * (-0.6911147651e-5 + y * (0.7621095161e-6 + y * (-0.934935152e-7))))
      math.sqrt(0.636619772 / x) * (math.sin(xx) * p1 + z * math.cos(xx) * p2)
    }
  }

  private def y0Series(x: Double): Double = {
    val y = x * x
    val p1 = -2957821389.0 + y * (7062834065.0 + y * (-512359803.6 + y * (10879881.29 + y * (-86327.92757 + y * 228.4622733))))
    val p2 = 40076544269.0 + y * (745249964.8 + y * (7189466.438 + y * (47447.26470 + y * (226.1030244 + y))))
    p1 / p2 + 0.636619772 * j0Impl(x) * math.log(x)
  }

  private[graft] def y1Impl(x: Double): Double = {
    if (x < 8.0) {
      val y = x * x
      val p1 = x * (-4.900604943e13 + y * (1.275274390e13 + y * (-5.153438139e11 + y * (7.349264551e9 + y * (-4.237922726e7 + y * 8.511937935e4)))))
      val p2 = 2.499580570e14 + y * (4.244419664e12 + y * (3.733650367e10 + y * (2.245904002e8 + y * (1.020426050e6 + y * (3.549632885e3 + y)))))
      p1 / p2 + 0.636619772 * (j1Impl(x) * math.log(x) - 1.0 / x)
    } else {
      val z = 8.0 / x; val y = z * z; val xx = x - 2.356194491
      val p1 = 1.0 + y * (0.183105e-2 + y * (-0.3516396496e-4 + y * (0.2457520174e-5 + y * (-0.240337019e-6))))
      val p2 = 0.04687499995 + y * (-0.2002690873e-3 + y * (0.8449199096e-5 + y * (-0.88228987e-6 + y * 0.105787412e-6)))
      math.sqrt(0.636619772 / x) * (math.sin(xx) * p1 + z * math.cos(xx) * p2)
    }
  }

  private[graft] def ynImpl(n: Int, x: Double): Double = n match {
    case 0 => y0Impl(x)
    case 1 => y1Impl(x)
    case _ =>
      var bym = y0Impl(x); var by = y1Impl(x)
      for (i <- 1 until n) { val byp = 2.0 * i / x * by - bym; bym = by; by = byp }
      by
  }

  private[graft] def humanBytesImpl(v: Double): String = {
    // Mirrors Go humanize.Bytes exactly (reference uses it for alert
    // messages): input is a byte *count* (uint64 there — negatives are
    // clamped to 0 here), <10 prints as integer bytes, scaled values are
    // rounded to one decimal and printed %.0f once >= 10.
    val units = Array("B", "kB", "MB", "GB", "TB", "PB", "EB")
    val s = math.max(v, 0.0)
    if (s < 10) f"${s.toLong}%d B"
    else {
      val e = math.floor(math.log(s) / math.log(1000.0)).toInt.min(units.length - 1)
      val x = math.floor(s / math.pow(1000.0, e) * 10 + 0.5) / 10
      if (x < 10) f"$x%.1f ${units(e)}" else f"$x%.0f ${units(e)}"
    }
  }

  // UDF registrations (plain UDFs are fine here: these are cold-path scalars;
  // the hot-path math all comes from codegen'd builtins).
  val erf = udf(erfImpl _)
  val erfc = udf((x: Double) => 1.0 - erfImpl(x))
  val gamma = udf(gammaImpl _)
  val j0 = udf(j0Impl _)
  val j1 = udf(j1Impl _)
  val jn = udf(jnImpl _)
  val y0 = udf(y0Impl _)
  val y1 = udf(y1Impl _)
  val yn = udf(ynImpl _)
  val humanBytes = udf(humanBytesImpl _)

  /** Register the full library for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("erf", erf)
    spark.udf.register("erfc", erfc)
    spark.udf.register("tick_gamma", gamma)
    spark.udf.register("bessel_j0", j0)
    spark.udf.register("bessel_j1", j1)
    spark.udf.register("bessel_jn", jn)
    spark.udf.register("bessel_y0", y0)
    spark.udf.register("bessel_y1", y1)
    spark.udf.register("bessel_yn", yn)
    spark.udf.register("human_bytes", humanBytes)
  }

  // ------------------------------------------------------- stateful lambdas

  /** sigma(f): number of standard deviations from the running mean
    * (reference tick/stateful/functions.go:1131-1177). Running = over all
    * points up to and including the current one, per group, time-ordered. */
  def sigma(field: Column, dims: Seq[Column], time: Column, tiebreak: Seq[Column] = Nil): Column = {
    val w = (if (dims.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(dims: _*))
      .orderBy(time +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val mu = avg(field).over(w)
    val sd = stddev_samp(field).over(w)
    when(sd.isNull || sd === 0, lit(0.0)).otherwise(abs(field - mu) / sd)
  }

  /** count() (reference tick/stateful/functions.go:1055-1090): running
    * number of points seen so far, per group, time-ordered — pinned by the
    * TestStream_EvalGroups golden. */
  def runningCount(dims: Seq[Column], time: Column, tiebreak: Seq[Column] = Nil): Column = {
    val w = (if (dims.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(dims: _*))
      .orderBy(time +: tiebreak: _*)
    row_number().over(w).cast("long")
  }

  /** spread(f) (reference tick/stateful/functions.go spread): running
    * max − min of the field over all points so far, per group. */
  def runningSpread(field: Column, dims: Seq[Column], time: Column,
      tiebreak: Seq[Column] = Nil): Column = {
    val w = (if (dims.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(dims: _*))
      .orderBy(time +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    max(field).over(w) - min(field).over(w)
  }

  /** rand() / rand(n) (reference tick/stateful/functions.go:1092-1116):
    * per-row random int64, optionally bounded to [0, n). The reference
    * draws from a per-task RNG stream — values are inherently
    * run-specific, so the contract here is the same distributional one:
    * Spark's seeded per-partition stream, reproducible for a fixed seed
    * and partitioning. */
  def randLambda(seed: Long): Column =
    floor(rand(seed) * Long.MaxValue).cast("long")

  def randLambda(seed: Long, n: Long): Column =
    floor(rand(seed) * n).cast("long")
}
